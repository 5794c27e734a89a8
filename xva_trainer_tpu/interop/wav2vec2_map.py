"""Import HuggingFace Wav2Vec2ForCTC checkpoints into the flax model
(reference python/transcribe/wav2vec2/model.py loads these per language)."""
from __future__ import annotations

import json
import os
from typing import Dict, List

import numpy as np

from .mapping import Rule, apply_import
from .torch_io import load_torch_pt


def _ln(tkey: str, fpath) -> List[Rule]:
    return [
        Rule(tkey + ".weight", fpath + ("scale",), "id"),
        Rule(tkey + ".bias", fpath + ("bias",), "id"),
    ]


def _dense(tkey: str, fpath, bias: bool = True) -> List[Rule]:
    rules = [Rule(tkey + ".weight", fpath + ("kernel",), "linear")]
    if bias:
        rules.append(Rule(tkey + ".bias", fpath + ("bias",), "id"))
    return rules


def wav2vec2_rules(num_conv: int, num_layers: int) -> List[Rule]:
    W = "wav2vec2."
    rules: List[Rule] = []
    for i in range(num_conv):
        rules.append(Rule(
            f"{W}feature_extractor.conv_layers.{i}.conv.weight",
            ("feature_extractor", f"conv_{i}", "kernel"), "conv1d",
        ))
    rules += [
        Rule(f"{W}feature_extractor.conv_layers.0.layer_norm.weight",
             ("feature_extractor", "group_norm", "scale"), "id"),
        Rule(f"{W}feature_extractor.conv_layers.0.layer_norm.bias",
             ("feature_extractor", "group_norm", "bias"), "id"),
    ]
    rules += _ln(f"{W}feature_projection.layer_norm", ("fp_layer_norm",))
    rules += _dense(f"{W}feature_projection.projection", ("fp_projection",))
    rules.append(Rule(f"{W}encoder.pos_conv_embed.conv.bias",
                      ("pos_conv_embed", "conv", "bias"), "id"))
    rules += _ln(f"{W}encoder.layer_norm", ("encoder_layer_norm",))
    for i in range(num_layers):
        t = f"{W}encoder.layers.{i}"
        f = (f"layer_{i}",)
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            rules += _dense(f"{t}.attention.{proj}", f + (proj,))
        rules += _ln(f"{t}.layer_norm", f + ("layer_norm",))
        rules += _dense(f"{t}.feed_forward.intermediate_dense",
                        f + ("intermediate_dense",))
        rules += _dense(f"{t}.feed_forward.output_dense", f + ("output_dense",))
        rules += _ln(f"{t}.final_layer_norm", f + ("final_layer_norm",))
    rules += _dense("lm_head", ("lm_head",))
    return rules


def _pos_conv_weight(sd: Dict[str, np.ndarray]) -> np.ndarray:
    """HF pos conv uses weight_norm with dim=2 (per kernel position):
    effective = g * v/||v|| over dims (0,1). Handles both the new
    parametrizations naming and the legacy weight_g/weight_v."""
    base = "wav2vec2.encoder.pos_conv_embed.conv"
    if f"{base}.parametrizations.weight.original0" in sd:
        g = np.asarray(sd[f"{base}.parametrizations.weight.original0"], np.float64)
        v = np.asarray(sd[f"{base}.parametrizations.weight.original1"], np.float64)
    else:
        g = np.asarray(sd[f"{base}.weight_g"], np.float64)
        v = np.asarray(sd[f"{base}.weight_v"], np.float64)
    norm = np.sqrt((v ** 2).sum(axis=(0, 1), keepdims=True))
    w = (v / np.maximum(norm, 1e-12)) * g  # (out, in/groups, k)
    return w.astype(np.float32)


def load_wav2vec2(hf_dir: str):
    """HF checkpoint dir (config.json + pytorch_model.bin + vocab.json) →
    (flax params, Wav2Vec2Config, vocab)."""
    from ..models.wav2vec2 import Wav2Vec2Config

    with open(os.path.join(hf_dir, "config.json"), encoding="utf8") as f:
        hc = json.load(f)
    cfg = Wav2Vec2Config(
        vocab_size=hc["vocab_size"],
        hidden_size=hc["hidden_size"],
        num_layers=hc["num_hidden_layers"],
        num_heads=hc["num_attention_heads"],
        intermediate_size=hc["intermediate_size"],
        conv_dim=tuple(hc["conv_dim"]),
        conv_stride=tuple(hc["conv_stride"]),
        conv_kernel=tuple(hc["conv_kernel"]),
        pos_conv_kernel=hc["num_conv_pos_embeddings"],
        pos_conv_groups=hc["num_conv_pos_embedding_groups"],
    )
    ckpt_path = None
    for name in ("pytorch_model.bin", "model.pt", "pytorch_model.pt"):
        p = os.path.join(hf_dir, name)
        if os.path.exists(p):
            ckpt_path = p
            break
    if ckpt_path is None:
        raise FileNotFoundError(f"no torch checkpoint in {hf_dir}")
    sd = load_torch_pt(ckpt_path)
    sd = sd.get("state_dict", sd)
    params = apply_import(
        sd, wav2vec2_rules(len(cfg.conv_dim), cfg.num_layers), strict=True
    )
    # pos conv: dim=2 weight norm — recombine and transpose to flax layout
    w = _pos_conv_weight(sd)  # (out, in/groups, k)
    params["params"].setdefault("pos_conv_embed", {}).setdefault("conv", {})[
        "kernel"
    ] = np.ascontiguousarray(np.transpose(w, (2, 1, 0)))

    vocab = {}
    vp = os.path.join(hf_dir, "vocab.json")
    if os.path.exists(vp):
        with open(vp, encoding="utf8") as f:
            vocab = json.load(f)
    return params, cfg, vocab
