"""Tensor parallelism over the mesh's "model" axis.

The reference has no TP at all (SURVEY.md §2.6: models are ≤100M params and
single-host DataParallel suffices); the mesh reserves a "model" axis so tensor
sharding can be enabled without redesign. This module turns that reservation
into a working strategy: declarative sharding rules map parameter paths to
`PartitionSpec`s, and `jax.jit` + `NamedSharding` compile the existing train
steps into SPMD programs where XLA inserts the all-reduces over ICI.

The scheme is the Megatron split applied to the conv-FFN stack
(reference FFTransformer 1536-wide FFN, fastpitch1_1/fastpitch/transformer.py):
- first FFN conv: kernel (width, d_model, d_ff) sharded on the OUTPUT channel
  ("column parallel") — each model shard computes d_ff/n activations;
- second FFN conv: kernel (width, d_ff, d_model) sharded on the INPUT channel
  ("row parallel") — partial sums all-reduce back to the replicated d_model.
Everything not matched by a rule stays replicated; DP over "data" composes
orthogonally. Gradients/optimizer state inherit the param shardings, so the
optimizer update runs sharded too (ZeRO-style memory scaling for free).
"""
from __future__ import annotations

import re
from typing import Dict, List, Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, PartitionSpec) — first match wins; unmatched leaves replicate.
# Conv kernels are channels-last: (width, in_ch, out_ch); Dense: (in, out).
FASTPITCH_TP_RULES: List[Tuple[str, P]] = [
    # FFN column-parallel: out-channel shard of conv1 + its bias
    (r".*/ff_layers_\d+/Conv1d_0/Conv_0/kernel$", P(None, None, "model")),
    (r".*/ff_layers_\d+/Conv1d_0/Conv_0/bias$", P("model")),
    # FFN row-parallel: in-channel shard of conv2 (bias replicated — it is
    # added after the all-reduce)
    (r".*/ff_layers_\d+/Conv1d_1/Conv_0/kernel$", P(None, "model", None)),
]

# xVAPitch text-encoder conv-FFN (RelativePositionTransformer): same split.
XVAPITCH_TP_RULES: List[Tuple[str, P]] = [
    (r".*/FeedForwardNetwork_\d+/Conv_0/kernel$", P(None, None, "model")),
    (r".*/FeedForwardNetwork_\d+/Conv_0/bias$", P("model")),
    (r".*/FeedForwardNetwork_\d+/Conv_1/kernel$", P(None, "model", None)),
]


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def tp_pspecs(params, rules: Sequence[Tuple[str, P]]) -> Dict:
    """Map a params pytree to a pytree of PartitionSpecs via path rules.

    Every leaf gets the spec of the first matching rule, or a fully
    replicated spec. Dims whose size cannot divide the mesh axis are left
    unsharded at placement time (see shard_params).
    """
    compiled = [(re.compile(rx), spec) for rx, spec in rules]

    def spec_for(path, leaf):
        s = _path_str(path)
        for rx, spec in compiled:
            if rx.match(s):
                return spec
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(params, mesh: Mesh, rules: Sequence[Tuple[str, P]]):
    """device_put each param with its rule's NamedSharding.

    A spec is demoted to replicated when the sharded dim does not divide the
    mesh axis size (e.g. tiny test configs), so this is always safe to call.
    """
    specs = tp_pspecs(params, rules)
    n_model = mesh.shape.get("model", 1)

    def place(leaf, spec):
        for dim, axis in enumerate(spec):
            if axis is not None and (
                dim >= leaf.ndim or leaf.shape[dim] % n_model != 0
            ):
                spec = P()
                break
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, params, specs)


def sharding_summary(params, mesh: Mesh) -> Dict[str, str]:
    """path → sharding spec string for every non-replicated param (debug)."""
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        s = getattr(leaf, "sharding", None)
        if s is not None and getattr(s, "spec", P()) != P():
            out[_path_str(path)] = str(s.spec)
    return out
