"""Mixed precision for TPU training: bf16 compute, fp32 master params/losses.

The reference trains under ``torch.cuda.amp.autocast`` + ``GradScaler``
(use_amp defaults to true — reference python/xvapitch/xva_train.py:551,
javascript/train.js:641). On TPU the equivalent is bf16 compute: the MXU's
native rate is bf16, fp32 convs/matmuls pay a multi-pass penalty, and bf16
shares fp32's exponent range so no loss scaling / GradScaler is needed
(SURVEY.md §7 hard part 2).

Scheme (standard JAX mixed precision):
- master params stay fp32 in the train state / optimizer / checkpoints;
- at the model-apply boundary the params and float inputs are cast to bf16,
  so every conv/matmul/activation inside runs bf16 on the MXU;
- all model outputs are cast back to fp32 before any loss math (mel-loss
  STFTs, KL, CTC, feature matching all accumulate in fp32);
- gradients come out fp32 automatically (the casts are differentiable and
  ``jax.grad`` is taken w.r.t. the fp32 masters);
- numerically sensitive islands can be excluded per top-level flax module
  (e.g. the stochastic duration predictor's spline-flow logdets), and the
  MAS dynamic program always accumulates fp32 (ops/mas.py casts its input).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp


def cast_floats(tree, dtype):
    """Cast every inexact (float/bfloat) array leaf of ``tree`` to ``dtype``.

    Integer/bool leaves (token ids, lengths, rng keys) and non-array leaves
    pass through untouched.
    """

    def cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.inexact):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(cast, tree)


def cast_params(variables, dtype, exclude: Sequence[str] = ()):
    """Cast a flax variables dict to ``dtype``, keeping ``exclude``d top-level
    modules (keys of the ``params`` collection) in their original dtype.

    Excluded modules then compute in fp32 end-to-end: flax's default
    ``dtype=None`` promotes (bf16 input, fp32 param) -> fp32 inside them.
    """
    if not exclude:
        return cast_floats(variables, dtype)
    out = dict(variables)
    params = dict(out.get("params", {}))
    for k, v in params.items():
        if k not in exclude:
            params[k] = cast_floats(v, dtype)
    out["params"] = params
    for k, v in out.items():
        if k != "params":
            out[k] = cast_floats(v, dtype)
    return out


def amp_apply(apply_fn, variables, *args, exclude: Sequence[str] = (), **kwargs):
    """Run ``apply_fn(variables, *args, **kwargs)`` with params and float
    positional args cast to bf16, and every float output cast back to fp32.

    Keyword args (``method=``, ``rngs=``, flags) pass through uncast — call
    sites pass arrays positionally.
    """
    v = cast_params(variables, jnp.bfloat16, exclude)
    a = cast_floats(args, jnp.bfloat16)
    out = apply_fn(v, *a, **kwargs)
    return cast_floats(out, jnp.float32)
