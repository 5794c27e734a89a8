"""xVAPitch (VITS-family) building blocks in flax.

Parity targets (architecture, not code):
- RelativePositionMultiHeadAttention / RelativePositionTransformer /
  FeedForwardNetwork / LayerNorm2: reference python/xvapitch/glow_tts.py
  (window-4 relative attention per Shaw et al. 2018, channel LayerNorm,
  conv-FFN with asymmetric 'same' padding).
- WN gated dilated conv stack: reference python/xvapitch/wavenet.py:15-118
  (fused tanh·sigmoid gate, per-layer global conditioning slices, weight norm).
- DilatedDepthSeparableConv / ElementwiseAffine / ConvFlow (spline):
  reference python/xvapitch/sdp.py:40-178.

All tensors are channels-last (B, T, C); convs lower to MXU matmuls.
"""
from __future__ import annotations


import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.spline import rational_quadratic_spline


def _conv1d(features, kernel_size=1, groups=1, name=None, use_bias=True):
    return nn.Conv(
        features,
        kernel_size=(kernel_size,),
        feature_group_count=groups,
        padding="SAME",
        use_bias=use_bias,
        name=name,
    )


class RelativePositionMultiHeadAttention(nn.Module):
    """Multi-head self-attention with windowed relative position embeddings.

    reference glow_tts.py:59-310 (rel_attn_window_size=4).
    """

    channels: int
    out_channels: int
    num_heads: int
    window_size: int = 4
    dropout_p: float = 0.0

    @nn.compact
    def __call__(self, x, attn_mask, *, deterministic: bool = True):
        # x (B, T, C_in); attn_mask (B, 1, T, T) or (B, T, T)
        B, T, _ = x.shape
        H = self.num_heads
        k_ch = self.channels // H
        q = _conv1d(self.channels, name="conv_q")(x)
        k = _conv1d(self.channels, name="conv_k")(x)
        v = _conv1d(self.channels, name="conv_v")(x)

        def split_heads(t):
            return t.reshape(B, T, H, k_ch).transpose(0, 2, 1, 3)  # (B,H,T,k)

        q, k, v = split_heads(q), split_heads(k), split_heads(v)
        scale = 1.0 / np.sqrt(k_ch)
        scores = jnp.einsum("bhqc,bhkc->bhqk", q * scale, k)

        w = self.window_size
        emb_rel_k = self.param(
            "emb_rel_k",
            nn.initializers.normal(k_ch**-0.5),
            (1, 2 * w + 1, k_ch),
        )
        emb_rel_v = self.param(
            "emb_rel_v",
            nn.initializers.normal(k_ch**-0.5),
            (1, 2 * w + 1, k_ch),
        )
        rel_k = _expand_relative_embeddings(emb_rel_k, T, w)  # (1, 2T-1, k)
        rel_logits = jnp.einsum("bhqc,gmc->bhqm", q * scale, rel_k)
        scores = scores + _relative_to_absolute(rel_logits)

        if attn_mask is not None:
            if attn_mask.ndim == 3:
                attn_mask = attn_mask[:, None]
            scores = jnp.where(attn_mask > 0, scores, -1e4)
        p = jax.nn.softmax(scores, axis=-1)
        p = nn.Dropout(self.dropout_p)(p, deterministic=deterministic)
        out = jnp.einsum("bhqk,bhkc->bhqc", p, v)

        rel_v = _expand_relative_embeddings(emb_rel_v, T, w)
        p_rel = _absolute_to_relative(p)  # (B,H,T,2T-1)
        out = out + jnp.einsum("bhqm,gmc->bhqc", p_rel, rel_v)

        out = out.transpose(0, 2, 1, 3).reshape(B, T, H * k_ch)
        return _conv1d(self.out_channels, name="conv_o")(out)


def _expand_relative_embeddings(emb: jnp.ndarray, length: int, window: int) -> jnp.ndarray:
    """(1, 2w+1, k) → (1, 2*length-1, k): zero-pad or center-slice."""
    pad = max(length - (window + 1), 0)
    start = max((window + 1) - length, 0)
    out = jnp.pad(emb, ((0, 0), (pad, pad), (0, 0)))
    return out[:, start : start + 2 * length - 1]


def _relative_to_absolute(x: jnp.ndarray) -> jnp.ndarray:
    """(B,H,T,2T-1) rel logits → (B,H,T,T) abs (reference glow_tts:253-270)."""
    B, H, T, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
    x = x.reshape(B, H, T * 2 * T)
    x = jnp.pad(x, ((0, 0), (0, 0), (0, T - 1)))
    x = x.reshape(B, H, T + 1, 2 * T - 1)
    return x[:, :, :T, T - 1 :]


def _absolute_to_relative(x: jnp.ndarray) -> jnp.ndarray:
    """(B,H,T,T) → (B,H,T,2T-1) (reference glow_tts:272-287)."""
    B, H, T, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, T - 1)))
    x = x.reshape(B, H, T * (2 * T - 1))
    x = jnp.pad(x, ((0, 0), (0, 0), (T, 0)))
    x = x.reshape(B, H, T, 2 * T)
    return x[:, :, :, 1:]


class FeedForwardNetwork(nn.Module):
    """conv(k) → relu → dropout → conv(k), masked, asymmetric same-pad."""

    out_channels: int
    hidden_channels: int
    kernel_size: int = 3
    dropout_p: float = 0.0

    @nn.compact
    def __call__(self, x, x_mask, *, deterministic: bool = True):
        h = _conv1d(self.hidden_channels, self.kernel_size)(x * x_mask)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout_p)(h, deterministic=deterministic)
        h = _conv1d(self.out_channels, self.kernel_size)(h * x_mask)
        return h * x_mask


class RelativePositionTransformer(nn.Module):
    """Stack of rel-pos attention + conv FFN with post-LN
    (reference glow_tts.py:373-465, layer_norm_type='2')."""

    in_channels: int
    out_channels: int
    hidden_channels: int
    hidden_channels_ffn: int
    num_heads: int
    num_layers: int
    kernel_size: int = 3
    dropout_p: float = 0.0
    window_size: int = 4

    @nn.compact
    def __call__(self, x, x_mask, *, deterministic: bool = True):
        # x (B, T, C); x_mask (B, T, 1)
        attn_mask = x_mask[:, None, :, 0][:, :, None, :] * x_mask[:, None, :, 0][:, :, :, None]
        for i in range(self.num_layers):
            x = x * x_mask
            y = RelativePositionMultiHeadAttention(
                self.hidden_channels,  # == in_channels on layer 0 per reference
                self.hidden_channels,
                self.num_heads,
                self.window_size,
                self.dropout_p,
            )(x, attn_mask, deterministic=deterministic)
            y = nn.Dropout(self.dropout_p)(y, deterministic=deterministic)
            # eps 1e-4: reference glow_tts LayerNorm (type "1", :8-29)
            x = nn.LayerNorm(epsilon=1e-4)(x + y)

            last = (i + 1) == self.num_layers
            ffn_out = self.out_channels if last else self.hidden_channels
            y = FeedForwardNetwork(
                ffn_out, self.hidden_channels_ffn, self.kernel_size, self.dropout_p
            )(x, x_mask, deterministic=deterministic)
            y = nn.Dropout(self.dropout_p)(y, deterministic=deterministic)
            if last and self.hidden_channels != self.out_channels:
                x = _conv1d(self.out_channels, name="proj")(x)
            # reference (glow_tts.py:480-483): when out_channels == 1 the
            # last layer skips the norm AND drops the FFN residual entirely —
            # the final output is proj(x); y is dead compute (params kept for
            # checkpoint parity).
            if self.out_channels != 1 or not last:
                x = nn.LayerNorm(epsilon=1e-4)(x + y)
        return x * x_mask


class WN(nn.Module):
    """Non-causal WaveNet stack with gated units and global conditioning
    (reference wavenet.py:15-118). channels-last."""

    hidden_channels: int
    kernel_size: int = 5
    dilation_rate: int = 1
    num_layers: int = 16
    cond_channels: int = 0
    dropout_p: float = 0.0

    @nn.compact
    def __call__(self, x, x_mask=None, g=None, *, deterministic: bool = True):
        # x (B, T, H); g (B, 1, cond) or (B, T, cond)
        Hc = self.hidden_channels
        mask = 1.0 if x_mask is None else x_mask
        output = jnp.zeros_like(x)
        if g is not None and self.cond_channels:
            g_all = nn.WeightNorm(
                nn.Conv(2 * Hc * self.num_layers, (1,), name="cond_layer")
            )(g)
        for i in range(self.num_layers):
            dilation = self.dilation_rate**i
            x_in = nn.WeightNorm(
                nn.Conv(2 * Hc, (self.kernel_size,), kernel_dilation=(dilation,),
                        padding="SAME", name=f"in_{i}")
            )(x)
            x_in = nn.Dropout(self.dropout_p)(x_in, deterministic=deterministic)
            if g is not None and self.cond_channels:
                g_l = g_all[..., i * 2 * Hc : (i + 1) * 2 * Hc]
            else:
                g_l = 0.0
            acts = x_in + g_l
            acts = jnp.tanh(acts[..., :Hc]) * jax.nn.sigmoid(acts[..., Hc:])
            rs_ch = 2 * Hc if i < self.num_layers - 1 else Hc
            res_skip = nn.WeightNorm(
                nn.Conv(rs_ch, (1,), name=f"res_skip_{i}")
            )(acts)
            if i < self.num_layers - 1:
                x = (x + res_skip[..., :Hc]) * mask
                output = output + res_skip[..., Hc:]
            else:
                output = output + res_skip
        return output * mask


class DilatedDepthSeparableConv(nn.Module):
    """Depthwise dilated (3^i) + pointwise convs with per-step LN + gelu
    (reference sdp.py:40-94)."""

    channels: int
    kernel_size: int = 3
    num_layers: int = 3
    dropout_p: float = 0.0

    @nn.compact
    def __call__(self, x, x_mask, g=None, *, deterministic: bool = True):
        if g is not None:
            x = x + g
        for i in range(self.num_layers):
            dilation = self.kernel_size**i
            y = nn.Conv(
                self.channels, (self.kernel_size,), kernel_dilation=(dilation,),
                feature_group_count=self.channels, padding="SAME",
            )(x * x_mask)
            # eps 1e-5: reference sdp.py LayerNorm2 (:24-34); exact (erf)
            # gelu — torch F.gelu default, not the tanh approximation
            y = nn.LayerNorm(epsilon=1e-5)(y)
            y = nn.gelu(y, approximate=False)
            y = nn.Conv(self.channels, (1,))(y)
            y = nn.LayerNorm(epsilon=1e-5)(y)
            y = nn.gelu(y, approximate=False)
            y = nn.Dropout(self.dropout_p)(y, deterministic=deterministic)
            x = x + y
        return x * x_mask


class ElementwiseAffine(nn.Module):
    """Learned per-channel affine flow (reference sdp.py:97-113)."""

    channels: int

    @nn.compact
    def __call__(self, x, x_mask, reverse: bool = False, **kwargs):
        m = self.param("m", nn.initializers.zeros, (self.channels,))
        logs = self.param("logs", nn.initializers.zeros, (self.channels,))
        if not reverse:
            y = (m + jnp.exp(logs) * x) * x_mask
            logdet = jnp.sum(logs[None, None, :] * x_mask, axis=(1, 2))
            return y, logdet
        return (x - m) * jnp.exp(-logs) * x_mask


class ConvFlow(nn.Module):
    """Coupling flow with rational-quadratic spline transform
    (reference sdp.py:116-178): split 2ch → [x0 | spline(x1; params(x0,g))]."""

    in_channels: int = 2
    filter_channels: int = 192
    kernel_size: int = 3
    num_layers: int = 3
    num_bins: int = 10
    tail_bound: float = 5.0

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False,
                 *, deterministic: bool = True):
        half = self.in_channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = _conv1d(self.filter_channels, name="pre")(x0)
        h = DilatedDepthSeparableConv(
            self.filter_channels, self.kernel_size, self.num_layers
        )(h, x_mask, g=g, deterministic=deterministic)
        # proj zero-init: every spline flow starts as the identity (uniform
        # bins, unit derivatives) — reference sdp.py:145-147
        params = nn.Conv(
            half * (self.num_bins * 3 - 1), (1,), padding="SAME", name="proj",
            kernel_init=nn.initializers.zeros, bias_init=nn.initializers.zeros,
        )(h) * x_mask
        B, T, _ = x0.shape
        params = params.reshape(B, T, half, 3 * self.num_bins - 1)
        denom = np.sqrt(self.filter_channels)
        uw = params[..., : self.num_bins] / denom
        uh = params[..., self.num_bins : 2 * self.num_bins] / denom
        ud = params[..., 2 * self.num_bins :]
        out1, logabsdet = rational_quadratic_spline(
            x1, uw, uh, ud, inverse=reverse, tail_bound=self.tail_bound
        )
        out = jnp.concatenate([x0, out1], axis=-1) * x_mask
        logdet = jnp.sum(logabsdet * x_mask, axis=(1, 2))
        if not reverse:
            return out, logdet
        return out
