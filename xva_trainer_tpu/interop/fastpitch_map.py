"""Rule table: reference FastPitch1.1 state dict <-> flax FastPitch.

Torch side: /root/reference/python/fastpitch1_1/fastpitch/model.py (384-d,
6+6 FFT layers, 1 head x 64, ConvAttention aligner, dur/pitch/energy
predictors). v2 training checkpoints wrap the state dict as
{'state_dict': ..., 'epoch', 'iteration', 'avg_loss_per_epoch', ...}
(reference xva_train.py:1054-1079); the xVASynth export is the bare fp16
state dict (xva_train.py:1030-1047).
"""
from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

from .mapping import Rule, apply_export, apply_import

P = Tuple[str, ...]


def _ln(tkey: str, fpath: P) -> List[Rule]:
    return [
        Rule(tkey + ".weight", fpath + ("scale",), "id"),
        Rule(tkey + ".bias", fpath + ("bias",), "id"),
    ]


def _fft_rules(tp: str, fp: P, n_layers: int = 6, embed: bool = False) -> List[Rule]:
    rules: List[Rule] = []
    if embed:
        rules.append(Rule(f"{tp}.word_emb.weight", fp + ("word_emb", "embedding"),
                          "id"))
    for i in range(n_layers):
        a = fp + (f"attn_layers_{i}",)
        ta = f"{tp}.layers.{i}.dec_attn"
        rules += [
            Rule(f"{ta}.qkv_net.weight", a + ("qkv_net", "kernel"), "linear"),
            Rule(f"{ta}.qkv_net.bias", a + ("qkv_net", "bias"), "id"),
            Rule(f"{ta}.o_net.weight", a + ("o_net", "kernel"), "linear"),
            *_ln(f"{ta}.layer_norm", a + ("LayerNorm_0",)),
        ]
        f = fp + (f"ff_layers_{i}",)
        tf = f"{tp}.layers.{i}.pos_ff"
        rules += [
            Rule(f"{tf}.CoreNet.0.weight", f + ("Conv1d_0", "Conv_0", "kernel"),
                 "conv1d"),
            Rule(f"{tf}.CoreNet.0.bias", f + ("Conv1d_0", "Conv_0", "bias"), "id"),
            Rule(f"{tf}.CoreNet.2.weight", f + ("Conv1d_1", "Conv_0", "kernel"),
                 "conv1d"),
            Rule(f"{tf}.CoreNet.2.bias", f + ("Conv1d_1", "Conv_0", "bias"), "id"),
            *_ln(f"{tf}.layer_norm", f + ("LayerNorm_0",)),
        ]
    return rules


def _predictor_rules(tp: str, fp: P, n_layers: int = 2) -> List[Rule]:
    rules: List[Rule] = []
    for i in range(n_layers):
        c = fp + (f"ConvReLUNorm_{i}",)
        rules += [
            Rule(f"{tp}.layers.{i}.conv.weight",
                 c + ("Conv1d_0", "Conv_0", "kernel"), "conv1d"),
            Rule(f"{tp}.layers.{i}.conv.bias",
                 c + ("Conv1d_0", "Conv_0", "bias"), "id"),
            *_ln(f"{tp}.layers.{i}.norm", c + ("LayerNorm_0",)),
        ]
    rules += [
        Rule(f"{tp}.fc.weight", fp + ("Dense_0", "kernel"), "linear"),
        Rule(f"{tp}.fc.bias", fp + ("Dense_0", "bias"), "id"),
    ]
    return rules


def fastpitch_rules(in_layers: int = 6, out_layers: int = 6) -> List[Rule]:
    rules = _fft_rules("encoder", ("encoder",), in_layers, embed=True)
    rules += _fft_rules("decoder", ("decoder",), out_layers)
    rules += _predictor_rules("duration_predictor", ("duration_predictor",))
    rules += _predictor_rules("pitch_predictor", ("pitch_predictor",))
    rules += _predictor_rules("energy_predictor", ("energy_predictor",))
    rules += [
        Rule("pitch_emb.weight", ("pitch_emb", "Conv_0", "kernel"), "conv1d"),
        Rule("pitch_emb.bias", ("pitch_emb", "Conv_0", "bias"), "id"),
        Rule("energy_emb.weight", ("energy_emb", "Conv_0", "kernel"), "conv1d"),
        Rule("energy_emb.bias", ("energy_emb", "Conv_0", "bias"), "id"),
        Rule("proj.weight", ("proj", "kernel"), "linear"),
        Rule("proj.bias", ("proj", "bias"), "id"),
        # ConvAttention aligner: key path then query path (flax creation order)
        Rule("attention.key_proj.0.conv.weight",
             ("attention", "Conv1d_0", "Conv_0", "kernel"), "conv1d"),
        Rule("attention.key_proj.0.conv.bias",
             ("attention", "Conv1d_0", "Conv_0", "bias"), "id"),
        Rule("attention.key_proj.2.conv.weight",
             ("attention", "Conv1d_1", "Conv_0", "kernel"), "conv1d"),
        Rule("attention.key_proj.2.conv.bias",
             ("attention", "Conv1d_1", "Conv_0", "bias"), "id"),
        Rule("attention.query_proj.0.conv.weight",
             ("attention", "Conv1d_2", "Conv_0", "kernel"), "conv1d"),
        Rule("attention.query_proj.0.conv.bias",
             ("attention", "Conv1d_2", "Conv_0", "bias"), "id"),
        Rule("attention.query_proj.2.conv.weight",
             ("attention", "Conv1d_3", "Conv_0", "kernel"), "conv1d"),
        Rule("attention.query_proj.2.conv.bias",
             ("attention", "Conv1d_3", "Conv_0", "bias"), "id"),
        Rule("attention.query_proj.4.conv.weight",
             ("attention", "Conv1d_4", "Conv_0", "kernel"), "conv1d"),
        Rule("attention.query_proj.4.conv.bias",
             ("attention", "Conv1d_4", "Conv_0", "bias"), "id"),
    ]
    return rules


def _inv_freq(dim: int = 384) -> np.ndarray:
    return (1.0 / (10000.0 ** (np.arange(0.0, dim, 2.0) / dim))).astype(np.float32)


# torch-side keys with no flax counterpart: sinusoid buffers (recomputed),
# the unused aligner attn_proj, and the pitch-normalization buffers (host
# state, pitch_stats.json)
def fastpitch_extra_keys(pitch_mean: float = 0.0, pitch_std: float = 1.0,
                         dtype=np.float16) -> Dict[str, np.ndarray]:
    return {
        "pitch_mean": np.asarray([pitch_mean], dtype),
        "pitch_std": np.asarray([pitch_std], dtype),
        "encoder.pos_emb.inv_freq": _inv_freq().astype(dtype),
        "decoder.pos_emb.inv_freq": _inv_freq().astype(dtype),
        "attention.attn_proj.weight": np.zeros((1, 80, 1, 1), dtype),
        "attention.attn_proj.bias": np.zeros((1,), dtype),
    }


def fastpitch_state_dict(params, *, pitch_mean: float = 0.0,
                         pitch_std: float = 1.0, dtype=np.float16,
                         in_layers: int = 6, out_layers: int = 6,
                         d_model: int = 384):
    """Flax FastPitch params -> the reference's flat fp16 state dict."""
    sd = apply_export(params, fastpitch_rules(in_layers, out_layers),
                      dtype=dtype)
    sd.update(fastpitch_extra_keys(pitch_mean, pitch_std, dtype))
    sd["encoder.pos_emb.inv_freq"] = _inv_freq(d_model).astype(dtype)
    sd["decoder.pos_emb.inv_freq"] = _inv_freq(d_model).astype(dtype)
    return sd


def load_fastpitch_checkpoint(path: str, template: Optional[Dict] = None):
    """Reference FastPitch checkpoint/export -> flax params (+ host meta)."""
    from .pretrained import _overlay
    from .torch_io import load_torch_pt

    ckpt = load_torch_pt(path)
    sd = ckpt.get("state_dict", ckpt.get("model", ckpt))
    sd = {k.replace("module.", ""): v for k, v in sd.items()}
    params = apply_import(sd, fastpitch_rules(), strict=True)
    meta = {
        "pitch_mean": float(np.asarray(sd.get("pitch_mean", [0.0]))[0]),
        "pitch_std": float(np.asarray(sd.get("pitch_std", [1.0]))[0]),
    }
    for k in ("epoch", "iteration", "training_stage", "avg_loss_per_epoch"):
        if isinstance(ckpt, dict) and k in ckpt:
            meta[k] = ckpt[k]
    if template is not None:
        params["params"] = _overlay(template["params"], params["params"])
    return params, meta
