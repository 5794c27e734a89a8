"""Declarative torch<->flax parameter mapping.

Each Rule binds one torch state-dict entry (or a weight-norm g/v pair) to one
flax param path with a layout kind. The same rule table drives both
directions:

- ``apply_import``: reference ``.pt`` flat state dict -> nested flax params
  (used to warm-start from the shipped pretrained checkpoints,
  reference xva_train.py:104-131, hifigan/xva_train.py:276-277).
- ``apply_export``: flax params -> flat torch-named fp16 state dict
  (the xVASynth-loadable artifact, reference xva_train.py:984-1022).

Layout kinds (torch shape -> flax shape):
- conv1d:   (out, in, k)      -> (k, in, out)
- convT1d:  (in, out, k)      -> (k, in, out) + spatial flip
            (verified equal to torch ConvTranspose1d under flax 'SAME'
            padding with stride=k/2-style configs)
- conv2d:   (out, in, kh, kw) -> (kh, kw, in, out)
- linear:   (out, in)         -> (in, out)
- embed/id: unchanged
- flat:     reshape to 1-D (ElementwiseAffine (C,1) -> (C,))

Weight-normed convs ("wn_" prefix) are joint rules over
(weight_g, weight_v) <-> (kernel, scale): torch normalizes v over dims != 0
while flax normalizes the kernel over non-feature axes, so we recombine the
effective weight w = g * v/||v|| and re-decompose it in the target
convention — forward-exact in both frameworks.
"""
from __future__ import annotations

import dataclasses
from collections import OrderedDict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

FlaxPath = Tuple[str, ...]


@dataclasses.dataclass(frozen=True)
class Rule:
    torch_key: str          # without the .weight/.weight_g suffix for wn kinds
    flax_path: FlaxPath     # path of the kernel/value under params["params"]
    kind: str = "id"
    scale_path: Optional[FlaxPath] = None  # wn kinds: path of the WeightNorm scale
    tshape: Optional[Tuple[int, ...]] = None  # export reshape for 'flat'
    collection: str = "params"  # flax variable collection (e.g. batch_stats)


# ---------------- layout primitives ----------------


def _t2f(w: np.ndarray, kind: str) -> np.ndarray:
    if kind == "conv1d":
        return np.transpose(w, (2, 1, 0))
    if kind == "convT1d":
        return np.transpose(w, (2, 0, 1))[::-1]
    if kind == "conv2d":
        return np.transpose(w, (2, 3, 1, 0))
    if kind == "linear":
        return np.transpose(w)
    if kind == "flat":
        return w.reshape(-1)
    return w


def _f2t(w: np.ndarray, kind: str, tshape=None) -> np.ndarray:
    if kind == "conv1d":
        return np.transpose(w, (2, 1, 0))
    if kind == "convT1d":
        return np.transpose(w[::-1], (1, 2, 0))
    if kind == "conv2d":
        return np.transpose(w, (3, 2, 0, 1))
    if kind == "linear":
        return np.transpose(w)
    if kind == "flat":
        return w.reshape(tshape) if tshape is not None else w
    return w


def _norm_except(w: np.ndarray, axis: int) -> np.ndarray:
    """L2 norm over all axes except `axis`."""
    axes = tuple(i for i in range(w.ndim) if i != axis)
    return np.sqrt(np.sum(np.asarray(w, np.float64) ** 2, axis=axes))


def _wn_combine_torch(g: np.ndarray, v: np.ndarray) -> np.ndarray:
    """torch weight_norm(dim=0): w = g * v / ||v|| over dims != 0."""
    n = _norm_except(v, 0).reshape((-1,) + (1,) * (v.ndim - 1))
    g = g.reshape(n.shape)
    return (np.asarray(v, np.float64) / np.maximum(n, 1e-12) * g).astype(np.float32)


def _wn_decompose_flax(wf: np.ndarray):
    """flax WeightNorm (feature_axes=-1): kernel=w, scale=||w|| over non-feature
    axes — so scale * w/||w|| reproduces w exactly."""
    scale = _norm_except(wf, wf.ndim - 1).astype(np.float32)
    return wf, scale


def _wn_combine_flax(kernel: np.ndarray, scale: np.ndarray) -> np.ndarray:
    n = _norm_except(kernel, kernel.ndim - 1)
    shape = (1,) * (kernel.ndim - 1) + (-1,)
    return (
        np.asarray(kernel, np.float64) / np.maximum(n.reshape(shape), 1e-12)
        * scale.reshape(shape)
    ).astype(np.float32)


def _wn_decompose_torch(wt: np.ndarray):
    g = _norm_except(wt, 0).astype(np.float32)
    g = g.reshape((-1,) + (1,) * (wt.ndim - 1))
    return g, wt.astype(np.float32)


# ---------------- nested-tree helpers ----------------


def _set_path(tree: Dict, path: FlaxPath, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _get_path(tree: Dict, path: FlaxPath):
    node = tree
    for p in path:
        node = node[p]
    return node


# ---------------- public API ----------------


def apply_import(
    sd: Dict[str, np.ndarray],
    rules: Sequence[Rule],
    *,
    strict: bool = True,
) -> Dict:
    """Flat torch state dict -> nested flax variables ({"params": ..., and
    any other collections named by the rules, e.g. "batch_stats"})."""
    out: Dict = {"params": {}}
    missing: List[str] = []
    for r in rules:
        coll = out.setdefault(r.collection, {})
        if r.kind.startswith("wn_"):
            gk, vk = r.torch_key + ".weight_g", r.torch_key + ".weight_v"
            if gk not in sd or vk not in sd:
                missing.append(r.torch_key)
                continue
            w = _wn_combine_torch(np.asarray(sd[gk]), np.asarray(sd[vk]))
            wf = _t2f(w, r.kind[3:])
            kernel, scale = _wn_decompose_flax(wf)
            _set_path(coll, r.flax_path, np.ascontiguousarray(kernel))
            _set_path(coll, r.scale_path, scale)
        else:
            if r.torch_key not in sd:
                missing.append(r.torch_key)
                continue
            w = np.asarray(sd[r.torch_key], np.float32)
            _set_path(coll, r.flax_path,
                      np.ascontiguousarray(_t2f(w, r.kind)).astype(np.float32))
    if missing and strict:
        raise KeyError(f"{len(missing)} torch keys missing: {missing[:8]} ...")
    return out


def apply_export(
    params: Dict,
    rules: Sequence[Rule],
    *,
    dtype=np.float16,
) -> "OrderedDict[str, np.ndarray]":
    """Nested flax variables -> flat torch-named state dict."""
    out: "OrderedDict[str, np.ndarray]" = OrderedDict()
    for r in rules:
        if r.collection == "params":
            tree = params.get("params", params)
        else:
            tree = params[r.collection]
        if r.kind.startswith("wn_"):
            kernel = np.asarray(_get_path(tree, r.flax_path))
            scale = np.asarray(_get_path(tree, r.scale_path))
            wf = _wn_combine_flax(kernel, scale)
            wt = _f2t(wf, r.kind[3:])
            g, v = _wn_decompose_torch(wt)
            out[r.torch_key + ".weight_g"] = g.astype(dtype)
            out[r.torch_key + ".weight_v"] = np.ascontiguousarray(v).astype(dtype)
        else:
            w = np.asarray(_get_path(tree, r.flax_path), np.float32)
            out[r.torch_key] = np.ascontiguousarray(
                _f2t(w, r.kind, r.tshape)
            ).astype(dtype)
    return out


# (template-overlay lives in pretrained._overlay — the single shared helper)
