"""FastPitch building blocks in flax.linen.

Behavioral parity targets (architecture, not code) — reference:
- FFTransformer / TransformerLayer / MultiHeadAttn / PositionwiseConvFF /
  PositionalEmbedding: python/fastpitch1_1/fastpitch/transformer.py
- TemporalPredictor + ConvReLUNorm: python/fastpitch1_1/fastpitch/model.py:103-122,
  common/layers.py
- ConvAttention soft aligner: python/fastpitch1_1/fastpitch/attention.py:83-220

TPU notes: everything is channels-last (B, T, C) so convs lower to MXU-friendly
matmuls; masks are multiplicative; shapes static under jit.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def sinusoid_positions(length: int, dim: int, dtype=jnp.float32) -> jnp.ndarray:
    """[sin | cos] sinusoidal embeddings (reference transformer.py:21-35)."""
    inv_freq = 1.0 / (10000 ** (np.arange(0.0, dim, 2.0) / dim))
    pos = np.arange(length, dtype=np.float64)[:, None] * inv_freq[None, :]
    emb = np.concatenate([np.sin(pos), np.cos(pos)], axis=1)
    return jnp.asarray(emb, dtype=dtype)


class Conv1d(nn.Module):
    """'same'-padded 1D conv over (B, T, C)."""

    features: int
    kernel_size: int = 3
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        return nn.Conv(
            self.features,
            kernel_size=(self.kernel_size,),
            padding="SAME",
            use_bias=self.use_bias,
        )(x)


class ConvReLUNorm(nn.Module):
    """conv → relu → LayerNorm → dropout (reference common/layers.py ConvReLUNorm)."""

    features: int
    kernel_size: int = 3
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, *, deterministic: bool):
        x = Conv1d(self.features, self.kernel_size)(x)
        x = nn.relu(x)
        x = nn.LayerNorm(epsilon=1e-5)(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class TemporalPredictor(nn.Module):
    """Per-position scalar predictor (duration / pitch / energy)."""

    filter_size: int = 256
    kernel_size: int = 3
    dropout: float = 0.1
    n_layers: int = 2
    n_predictions: int = 1

    @nn.compact
    def __call__(self, enc_out, enc_mask, *, deterministic: bool = True):
        # enc_out (B, T, C); enc_mask (B, T, 1)
        out = enc_out * enc_mask
        for _ in range(self.n_layers):
            out = ConvReLUNorm(
                self.filter_size, self.kernel_size, self.dropout
            )(out, deterministic=deterministic)
        out = nn.Dense(self.n_predictions)(out)
        return out * enc_mask  # (B, T, n_predictions)


class MultiHeadAttn(nn.Module):
    """Post-LN self attention (reference transformer.py:81-152)."""

    n_head: int
    d_head: int
    dropout: float = 0.1
    dropatt: float = 0.1

    @nn.compact
    def __call__(self, x, pad_mask, *, deterministic: bool = True):
        # x (B, T, C); pad_mask (B, T, 1) — 1 for valid positions.
        B, T, C = x.shape
        qkv = nn.Dense(3 * self.n_head * self.d_head, name="qkv_net")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):
            return t.reshape(B, T, self.n_head, self.d_head)

        q, k, v = heads(q), heads(k), heads(v)
        scale = 1.0 / np.sqrt(self.d_head)
        score = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        neg = jnp.finfo(score.dtype).min
        score = jnp.where(pad_mask[:, None, None, :, 0] > 0, score, neg)
        prob = jax.nn.softmax(score, axis=-1)
        prob = nn.Dropout(self.dropatt)(prob, deterministic=deterministic)
        vec = jnp.einsum("bhqk,bkhd->bqhd", prob, v).reshape(B, T, -1)
        out = nn.Dense(C, use_bias=False, name="o_net")(vec)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5)(x + out)


class PositionwiseConvFF(nn.Module):
    """conv(k) → relu → conv(k) → dropout, post-LN residual."""

    d_inner: int
    kernel_size: int = 3
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        h = Conv1d(self.d_inner, self.kernel_size)(x)
        h = nn.relu(h)
        h = Conv1d(x.shape[-1], self.kernel_size)(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return nn.LayerNorm(epsilon=1e-5)(x + h)


class FFTransformer(nn.Module):
    """Stack of self-attn + conv-FF layers with sinusoidal positions.

    Reference transformer.py:170-262. `embed_input` selects token-embedding
    mode (encoder) vs pre-encoded mode (decoder).
    """

    n_layer: int = 6
    n_head: int = 1
    d_model: int = 384
    d_head: int = 64
    d_inner: int = 1536
    kernel_size: int = 3
    dropout: float = 0.1
    dropatt: float = 0.1
    dropemb: float = 0.0
    embed_input: bool = True
    n_embed: int = 148
    padding_idx: int = 0

    def setup(self):
        if self.embed_input:
            self.word_emb = nn.Embed(self.n_embed, self.d_model)
        self.attn_layers = [
            MultiHeadAttn(self.n_head, self.d_head, self.dropout, self.dropatt)
            for _ in range(self.n_layer)
        ]
        self.ff_layers = [
            PositionwiseConvFF(self.d_inner, self.kernel_size, self.dropout)
            for _ in range(self.n_layer)
        ]
        self.emb_drop = nn.Dropout(self.dropemb)

    def embed(self, tokens):
        """Token embedding table (shared with the ConvAttention aligner)."""
        return self.word_emb(tokens)

    def __call__(
        self,
        inp,
        seq_lens: Optional[jnp.ndarray] = None,
        conditioning=0.0,
        *,
        deterministic: bool = True,
    ):
        if self.embed_input:
            tokens = inp
            x = self.word_emb(tokens)
            mask = (tokens != self.padding_idx)[..., None].astype(x.dtype)
        else:
            x = inp
            T = x.shape[1]
            mask = (jnp.arange(T)[None, :] < seq_lens[:, None])[..., None].astype(
                x.dtype
            )

        pos = sinusoid_positions(x.shape[1], self.d_model, x.dtype)[None] * mask
        out = self.emb_drop(x + pos + conditioning, deterministic=deterministic)
        for attn, ff in zip(self.attn_layers, self.ff_layers):
            out = attn(out, mask, deterministic=deterministic) * mask
            out = ff(out, deterministic=deterministic) * mask
        return out, mask


class ConvAttention(nn.Module):
    """Gaussian-isotropic soft aligner between mel (queries) and text (keys).

    Reference attention.py:83-220 with align_query_enc_type='3xconv'.
    Returns (attn_soft, attn_logprob), both (B, T_mel, T_text).
    """

    n_mel_channels: int = 80
    n_text_channels: int = 384
    n_att_channels: int = 80

    @nn.compact
    def __call__(self, queries, keys, key_pad_mask, attn_prior=None):
        # queries (B, T_mel, n_mel); keys (B, T_text, C_text);
        # key_pad_mask (B, T_text) 1=valid.
        k = Conv1d(self.n_text_channels * 2, 3, use_bias=True)(keys)
        k = nn.relu(k)
        k = Conv1d(self.n_att_channels, 1, use_bias=True)(k)

        q = Conv1d(self.n_mel_channels * 2, 3)(queries)
        q = nn.relu(q)
        q = Conv1d(self.n_mel_channels, 1)(q)
        q = nn.relu(q)
        q = Conv1d(self.n_att_channels, 1)(q)

        # -0.0005 * ||q - k||^2 → (B, T_mel, T_text)
        q2 = (q**2).sum(-1)[:, :, None]
        k2 = (k**2).sum(-1)[:, None, :]
        qk = jnp.einsum("bqc,bkc->bqk", q, k)
        attn = -0.0005 * (q2 - 2.0 * qk + k2)
        if attn_prior is not None:
            attn = jax.nn.log_softmax(attn, axis=-1) + jnp.log(attn_prior + 1e-8)
        attn_logprob = attn
        neg = jnp.finfo(attn.dtype).min
        attn = jnp.where(key_pad_mask[:, None, :] > 0, attn, neg)
        return jax.nn.softmax(attn, axis=-1), attn_logprob
