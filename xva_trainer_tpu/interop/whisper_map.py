"""Rule table: OpenAI whisper checkpoint <-> flax Whisper.

The reference's transcribe tool loads a local ``whisper/{size}.pt``
(reference python/transcribe/model.py:150-157), an archive of
``{'dims': ModelDimensions, 'model_state_dict': ...}``. This maps those
weights into xva_trainer_tpu.models.whisper; HuggingFace-named state dicts
are accepted via a key-translation pass.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from .mapping import Rule, apply_import
from .torch_io import load_torch_pt

P = Tuple[str, ...]


def _ln(tkey: str, fpath: P) -> List[Rule]:
    return [
        Rule(tkey + ".weight", fpath + ("scale",), "id"),
        Rule(tkey + ".bias", fpath + ("bias",), "id"),
    ]


def _linear(tkey: str, fpath: P, bias: bool = True) -> List[Rule]:
    rules = [Rule(tkey + ".weight", fpath + ("kernel",), "linear")]
    if bias:
        rules.append(Rule(tkey + ".bias", fpath + ("bias",), "id"))
    return rules


def _block_rules(tp: str, fp: P, cross: bool) -> List[Rule]:
    rules = _ln(f"{tp}.attn_ln", fp + ("attn_ln",))
    rules += _linear(f"{tp}.attn.query", fp + ("attn", "query"))
    rules += _linear(f"{tp}.attn.key", fp + ("attn", "key"), bias=False)
    rules += _linear(f"{tp}.attn.value", fp + ("attn", "value"))
    rules += _linear(f"{tp}.attn.out", fp + ("attn", "out"))
    if cross:
        rules += _ln(f"{tp}.cross_attn_ln", fp + ("cross_attn_ln",))
        rules += _linear(f"{tp}.cross_attn.query", fp + ("cross_attn", "query"))
        rules += _linear(f"{tp}.cross_attn.key", fp + ("cross_attn", "key"),
                         bias=False)
        rules += _linear(f"{tp}.cross_attn.value", fp + ("cross_attn", "value"))
        rules += _linear(f"{tp}.cross_attn.out", fp + ("cross_attn", "out"))
    rules += _ln(f"{tp}.mlp_ln", fp + ("mlp_ln",))
    rules += _linear(f"{tp}.mlp.0", fp + ("mlp_0",))
    rules += _linear(f"{tp}.mlp.2", fp + ("mlp_2",))
    return rules


def whisper_rules(n_audio_layer: int, n_text_layer: int) -> List[Rule]:
    rules: List[Rule] = []
    rules += [
        Rule("encoder.conv1.weight", ("encoder", "conv1", "kernel"), "conv1d"),
        Rule("encoder.conv1.bias", ("encoder", "conv1", "bias"), "id"),
        Rule("encoder.conv2.weight", ("encoder", "conv2", "kernel"), "conv1d"),
        Rule("encoder.conv2.bias", ("encoder", "conv2", "bias"), "id"),
    ]
    for i in range(n_audio_layer):
        rules += _block_rules(f"encoder.blocks.{i}",
                              ("encoder", f"block_{i}"), cross=False)
    rules += _ln("encoder.ln_post", ("encoder", "ln_post"))
    rules += [
        Rule("decoder.token_embedding.weight",
             ("decoder", "token_embedding"), "id"),
        Rule("decoder.positional_embedding",
             ("decoder", "positional_embedding"), "id"),
    ]
    for i in range(n_text_layer):
        rules += _block_rules(f"decoder.blocks.{i}",
                              ("decoder", f"block_{i}"), cross=True)
    rules += _ln("decoder.ln", ("decoder", "ln"))
    return rules


_HF_MAP = [
    ("model.", ""),
    ("encoder.layers.", "encoder.blocks."),
    ("decoder.layers.", "decoder.blocks."),
    ("self_attn_layer_norm", "attn_ln"),
    ("encoder_attn_layer_norm", "cross_attn_ln"),
    ("self_attn.q_proj", "attn.query"),
    ("self_attn.k_proj", "attn.key"),
    ("self_attn.v_proj", "attn.value"),
    ("self_attn.out_proj", "attn.out"),
    ("encoder_attn.q_proj", "cross_attn.query"),
    ("encoder_attn.k_proj", "cross_attn.key"),
    ("encoder_attn.v_proj", "cross_attn.value"),
    ("encoder_attn.out_proj", "cross_attn.out"),
    ("final_layer_norm", "mlp_ln"),
    ("fc1", "mlp.0"),
    ("fc2", "mlp.2"),
    ("encoder.layer_norm", "encoder.ln_post"),
    ("decoder.layer_norm", "decoder.ln"),
    ("decoder.embed_tokens.weight", "decoder.token_embedding.weight"),
    ("decoder.embed_positions.weight", "decoder.positional_embedding"),
    ("encoder.embed_positions.weight", "encoder.positional_embedding"),
]


def hf_to_openai_keys(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        for a, b in _HF_MAP:
            k = k.replace(a, b)
        out[k] = v
    return out


def load_whisper(path: str):
    """Local whisper .pt → (flax params, WhisperConfig)."""
    from ..models.whisper import WhisperConfig

    ckpt = load_torch_pt(path)
    dims = ckpt.get("dims", {})
    sd = ckpt.get("model_state_dict", ckpt.get("state_dict", ckpt))
    if any(k.startswith("model.") for k in sd):
        sd = hf_to_openai_keys(sd)
    if dims:
        cfg = WhisperConfig(
            n_vocab=int(dims["n_vocab"]),
            n_audio_ctx=int(dims["n_audio_ctx"]),
            n_audio_state=int(dims["n_audio_state"]),
            n_audio_head=int(dims["n_audio_head"]),
            n_audio_layer=int(dims["n_audio_layer"]),
            n_text_ctx=int(dims["n_text_ctx"]),
            n_text_state=int(dims["n_text_state"]),
            n_text_head=int(dims["n_text_head"]),
            n_text_layer=int(dims["n_text_layer"]),
            n_mels=int(dims.get("n_mels", 80)),  # large-v3 / v3-turbo: 128
        )
    else:
        # infer from shapes
        n_audio_layer = 1 + max(
            int(k.split(".")[2]) for k in sd if k.startswith("encoder.blocks.")
        )
        n_text_layer = 1 + max(
            int(k.split(".")[2]) for k in sd if k.startswith("decoder.blocks.")
        )
        emb = np.asarray(sd["decoder.token_embedding.weight"])
        state = emb.shape[1]
        cfg = WhisperConfig(
            n_vocab=emb.shape[0],
            n_audio_state=np.asarray(sd["encoder.conv1.weight"]).shape[0],
            n_audio_layer=n_audio_layer,
            n_text_state=state,
            n_text_layer=n_text_layer,
            n_text_ctx=np.asarray(sd["decoder.positional_embedding"]).shape[0],
            n_audio_head=max(1, state // 64),
            n_text_head=max(1, state // 64),
            # torch conv1 weight is (out, in=n_mels, k)
            n_mels=np.asarray(sd["encoder.conv1.weight"]).shape[1],
        )
    params = apply_import(sd, whisper_rules(cfg.n_audio_layer, cfg.n_text_layer),
                          strict=True)
    return params, cfg


def import_whisper_checkpoint(src: str, out_dir: str) -> str:
    """``cli import-whisper`` backend: any whisper weights a user can obtain
    → the one local layout the transcribe tool consumes out of the box.

    Accepts
    - an OpenAI-whisper ``{size}.pt`` (the reference distribution's
      transcribe model file — reference python/transcribe/model.py:144-171);
    - a HuggingFace whisper checkpoint dir (``config.json`` +
      ``pytorch_model.bin`` / ``model.safetensors``, optional tokenizer
      assets) — keys are translated to the OpenAI naming and the ``dims``
      header is derived from config.json.

    Writes ``<out_dir>/whisper.pt`` plus any tokenizer asset found next to
    the source (``*.tiktoken`` / ``vocab.json``), validates the result by
    importing it into the flax model (strict rule application), and returns
    the written path.
    """
    import os
    import shutil

    from ..train.torch_save import torch_save_compatible

    src = os.path.abspath(src)
    os.makedirs(out_dir, exist_ok=True)
    out_path = os.path.join(out_dir, "whisper.pt")

    if os.path.isfile(src):
        ckpt = load_torch_pt(src)
        dims = dict(ckpt.get("dims", {}))
        sd = ckpt.get("model_state_dict", ckpt.get("state_dict", ckpt))
        sd = {k: np.asarray(v) for k, v in sd.items()}
        if any(k.startswith("model.") or ".layers." in k for k in sd):
            sd = hf_to_openai_keys(sd)
        asset_dirs = [os.path.dirname(src),
                      os.path.join(os.path.dirname(src), "assets")]
    elif os.path.isdir(src):
        import json

        cfg_path = os.path.join(src, "config.json")
        if not os.path.exists(cfg_path):
            raise FileNotFoundError(f"{src}: no config.json (not a HF dir)")
        with open(cfg_path, encoding="utf8") as f:
            hf_cfg = json.load(f)
        if hf_cfg.get("model_type", "whisper") != "whisper":
            raise ValueError(f"{src}: model_type={hf_cfg.get('model_type')} "
                             "is not whisper")
        sd = None
        st_path = os.path.join(src, "model.safetensors")
        pt_path = os.path.join(src, "pytorch_model.bin")
        if os.path.exists(st_path):
            from safetensors.numpy import load_file

            sd = load_file(st_path)
        elif os.path.exists(pt_path):
            sd = {k: np.asarray(v) for k, v in load_torch_pt(pt_path).items()}
        else:
            raise FileNotFoundError(
                f"{src}: no model.safetensors / pytorch_model.bin")
        sd = {k: v for k, v in sd.items() if not k.startswith("proj_out.")}
        sd = hf_to_openai_keys(sd)
        dims = dict(
            n_vocab=int(hf_cfg["vocab_size"]),
            n_audio_ctx=int(hf_cfg["max_source_positions"]),
            n_audio_state=int(hf_cfg["d_model"]),
            n_audio_head=int(hf_cfg["encoder_attention_heads"]),
            n_audio_layer=int(hf_cfg["encoder_layers"]),
            n_text_ctx=int(hf_cfg["max_target_positions"]),
            n_text_state=int(hf_cfg["d_model"]),
            n_text_head=int(hf_cfg["decoder_attention_heads"]),
            n_text_layer=int(hf_cfg["decoder_layers"]),
            n_mels=int(hf_cfg.get("num_mel_bins", 80)),
        )
        asset_dirs = [src]
    else:
        raise FileNotFoundError(src)

    torch_save_compatible({"dims": dims, "model_state_dict": sd}, out_path)
    try:
        load_whisper(out_path)  # strict round-trip validation
    except Exception:
        os.remove(out_path)
        raise
    for d in asset_dirs:
        if not os.path.isdir(d):
            continue
        for name in ("multilingual.tiktoken", "gpt2.tiktoken", "vocab.json"):
            p = os.path.join(d, name)
            if os.path.exists(p):
                shutil.copy(p, os.path.join(out_dir, name))
    return out_path
