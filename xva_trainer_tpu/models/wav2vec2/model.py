"""wav2vec 2.0 CTC ASR in flax — the reference's legacy per-language
transcription backend (reference python/transcribe/wav2vec2/model.py:1-60
loads HuggingFace Wav2Vec2ForCTC checkpoints per language).

Base architecture (do_stable_layer_norm=False, group-norm feature extractor):
strided conv feature extractor → LN+projection → grouped conv positional
embedding → post-LN transformer stack → CTC head. Weights import from local
HF checkpoints via interop.wav2vec2_map.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class Wav2Vec2Config:
    vocab_size: int = 32
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    conv_dim: Tuple[int, ...] = (512, 512, 512, 512, 512, 512, 512)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16


class FeatureExtractor(nn.Module):
    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, wav):
        """wav (B, T) → (B, T', conv_dim[-1])."""
        c = self.cfg
        x = wav[..., None]  # (B, T, 1)
        for i, (d, s, k) in enumerate(zip(c.conv_dim, c.conv_stride,
                                          c.conv_kernel)):
            x = nn.Conv(d, (k,), strides=(s,), padding="VALID",
                        use_bias=False, name=f"conv_{i}")(x)
            if i == 0:
                # group norm with groups == channels (per-channel over time)
                x = nn.GroupNorm(num_groups=d, epsilon=1e-5,
                                 name="group_norm")(x)
            x = nn.gelu(x, approximate=False)
        return x


class PosConvEmbed(nn.Module):
    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        k = c.pos_conv_kernel
        pad = k // 2
        h = nn.Conv(
            c.hidden_size, (k,), padding=((pad, pad),),
            feature_group_count=c.pos_conv_groups, name="conv",
        )(x)
        if k % 2 == 0:  # HF SamePadLayer removes the trailing element
            h = h[:, :-1]
        return nn.gelu(h, approximate=False)


class EncoderLayer(nn.Module):
    cfg: Wav2Vec2Config

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        H = c.num_heads
        d = c.hidden_size // H
        B, T, _ = x.shape
        q = nn.Dense(c.hidden_size, name="q_proj")(x) * (d ** -0.5)
        k = nn.Dense(c.hidden_size, name="k_proj")(x)
        v = nn.Dense(c.hidden_size, name="v_proj")(x)

        def heads(t):
            return t.reshape(B, T, H, d).transpose(0, 2, 1, 3)

        w = jax.nn.softmax(
            jnp.einsum("bhqc,bhkc->bhqk", heads(q), heads(k)), axis=-1
        )
        attn = jnp.einsum("bhqk,bhkc->bhqc", w, heads(v))
        attn = attn.transpose(0, 2, 1, 3).reshape(B, T, c.hidden_size)
        attn = nn.Dense(c.hidden_size, name="out_proj")(attn)
        x = nn.LayerNorm(epsilon=1e-5, name="layer_norm")(x + attn)
        h = nn.Dense(c.intermediate_size, name="intermediate_dense")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(c.hidden_size, name="output_dense")(h)
        return nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(x + h)


class Wav2Vec2Model(nn.Module):
    cfg: Wav2Vec2Config = Wav2Vec2Config()

    @nn.compact
    def __call__(self, wav):
        """wav (B, T) 16 kHz → CTC logits (B, T', vocab)."""
        c = self.cfg
        x = FeatureExtractor(c, name="feature_extractor")(wav)
        x = nn.LayerNorm(epsilon=1e-5, name="fp_layer_norm")(x)
        x = nn.Dense(c.hidden_size, name="fp_projection")(x)
        x = x + PosConvEmbed(c, name="pos_conv_embed")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="encoder_layer_norm")(x)
        for i in range(c.num_layers):
            x = EncoderLayer(c, name=f"layer_{i}")(x)
        return nn.Dense(c.vocab_size, name="lm_head")(x)


def ctc_greedy_decode(logits: np.ndarray, id_to_char: dict,
                      blank_id: int = 0, word_delim: str = "|") -> str:
    """Argmax CTC decode: collapse repeats, drop blanks, '|' → space."""
    ids = np.asarray(logits).argmax(axis=-1).reshape(-1)
    out = []
    prev = -1
    for i in ids:
        if i != prev and i != blank_id:
            ch = id_to_char.get(int(i), "")
            # HF decode strips special tokens (<unk>/<s>/</s>/<pad>) —
            # emitting them literally puts bracket junk in transcripts
            if ch.startswith("<") and ch.endswith(">"):
                prev = i
                continue
            out.append(" " if ch == word_delim else ch)
        prev = i
    return "".join(out).strip()


class Wav2Vec2CTC:
    """Host-facing wrapper: local HF checkpoint dir → transcription."""

    def __init__(self, params, cfg: Wav2Vec2Config, vocab: dict):
        self.cfg = cfg
        self.model = Wav2Vec2Model(cfg)
        self.params = params
        self.id_to_char = {int(v): k for k, v in vocab.items()}
        self._logits = jax.jit(lambda p, w: self.model.apply(p, w))

    @classmethod
    def from_hf_dir(cls, path: str) -> "Wav2Vec2CTC":
        from ...interop.wav2vec2_map import load_wav2vec2

        return cls(*load_wav2vec2(path))

    def transcribe(self, wav16k: np.ndarray) -> str:
        x = np.asarray(wav16k, np.float32)
        # HF Wav2Vec2FeatureExtractor zero-mean/unit-var normalization
        x = (x - x.mean()) / np.sqrt(x.var() + 1e-7)
        logits = self._logits(self.params, jnp.asarray(x)[None])
        return ctc_greedy_decode(np.asarray(logits)[0], self.id_to_char)
