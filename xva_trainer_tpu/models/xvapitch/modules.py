"""xVAPitch sub-networks (flax): text/posterior encoders, flows, SDP,
pitch predictor, language-adversarial classifier.

Parity targets:
- TextEncoder: reference python/xvapitch/model.py:1089-1170 (embedding scaled
  by sqrt(hidden), lang-emb concat, 10-layer rel-pos transformer, stats proj).
- PosteriorEncoder: :1422-1475 (513-ch linear spec → WN16 → m/logs → z).
- ResidualCouplingBlock(s): :1358-1421, 1476-1544 (mean-only couplings,
  channel flip between flows).
- StochasticDurationPredictor: python/xvapitch/sdp.py:179-326.
- RelativePositioningPitchEnergyEncoder: model.py:1268-1355.
- ReversalClassifier: model.py:1045-1085 (gradient-reversal lang classifier).
"""
from __future__ import annotations

import functools
import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .layers import (
    ConvFlow,
    DilatedDepthSeparableConv,
    ElementwiseAffine,
    RelativePositionTransformer,
    WN,
    _conv1d,
)


def sequence_mask(lengths: jnp.ndarray, max_len: int) -> jnp.ndarray:
    """(B,) → (B, max_len, 1) float mask."""
    return (jnp.arange(max_len)[None, :] < lengths[:, None])[..., None].astype(
        jnp.float32
    )


class TextEncoder(nn.Module):
    n_vocab: int
    out_channels: int = 256
    hidden_channels: int = 256
    hidden_channels_ffn: int = 768
    num_heads: int = 2
    num_layers: int = 10
    kernel_size: int = 3
    dropout_p: float = 0.1
    language_emb_dim: int = 12

    def setup(self):
        self.emb = nn.Embed(
            self.n_vocab,
            self.hidden_channels,
            embedding_init=nn.initializers.normal(self.hidden_channels**-0.5),
        )
        h = self.hidden_channels + self.language_emb_dim
        self.encoder = RelativePositionTransformer(
            in_channels=h,
            out_channels=h,
            hidden_channels=h,
            hidden_channels_ffn=self.hidden_channels_ffn,
            num_heads=self.num_heads,
            num_layers=self.num_layers,
            kernel_size=self.kernel_size,
            dropout_p=self.dropout_p,
        )
        self.proj = _conv1d(self.out_channels * 2, name=None)

    def __call__(self, tokens, x_lengths, lang_emb, *, deterministic: bool = True):
        """tokens (B, T) int; lang_emb (B, lang_dim).
        Returns x (B, T, h+lang), x_emb, x_mask (B, T, 1)."""
        x_emb = self.emb(tokens) * math.sqrt(self.hidden_channels)
        lang_full = jnp.broadcast_to(
            lang_emb[:, None, :], (*tokens.shape, lang_emb.shape[-1])
        )
        x = jnp.concatenate([x_emb, lang_full], axis=-1)
        x_mask = sequence_mask(x_lengths, tokens.shape[1])
        x = self.encoder(x * x_mask, x_mask, deterministic=deterministic)
        return x, x_emb, x_mask

    def stats(self, x, x_mask):
        """Prior stats from encoded text: (m_p, logs_p) each (B, T, out)."""
        s = self.proj(x) * x_mask
        return s[..., : self.out_channels], s[..., self.out_channels :]


class PosteriorEncoder(nn.Module):
    in_channels: int = 513
    out_channels: int = 256
    hidden_channels: int = 256
    kernel_size: int = 5
    dilation_rate: int = 1
    num_layers: int = 16
    cond_channels: int = 512

    @nn.compact
    def __call__(self, y, y_lengths, g=None, *, rng=None, deterministic: bool = True):
        """y (B, T, 513) linear spec; g (B, cond). Returns z, m, logs, y_mask."""
        y_mask = sequence_mask(y_lengths, y.shape[1])
        h = _conv1d(self.hidden_channels, name="pre")(y) * y_mask
        g_in = g[:, None, :] if (g is not None and g.ndim == 2) else g
        h = WN(
            self.hidden_channels, self.kernel_size, self.dilation_rate,
            self.num_layers, self.cond_channels, name="enc",
        )(h, y_mask, g=g_in, deterministic=deterministic)
        stats = _conv1d(self.out_channels * 2, name="proj")(h) * y_mask
        m = stats[..., : self.out_channels]
        logs = stats[..., self.out_channels :]
        if rng is None:
            rng = self.make_rng("noise")
        z = (m + jax.random.normal(rng, m.shape) * jnp.exp(logs)) * y_mask
        return z, m, logs, y_mask


class ResidualCouplingBlock(nn.Module):
    """Mean-only affine coupling with a WN inner net (reference :1476-1544)."""

    channels: int = 256
    hidden_channels: int = 256
    kernel_size: int = 5
    dilation_rate: int = 1
    num_layers: int = 4
    cond_channels: int = 512

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False,
                 *, deterministic: bool = True):
        half = self.channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = _conv1d(self.hidden_channels, name="pre")(x0) * x_mask
        g_in = g[:, None, :] if (g is not None and g.ndim == 2) else g
        h = WN(
            self.hidden_channels, self.kernel_size, self.dilation_rate,
            self.num_layers, self.cond_channels, name="enc",
        )(h, x_mask, g=g_in, deterministic=deterministic)
        m = _conv1d(half, name="post", use_bias=True)(h) * x_mask
        if not reverse:
            x1 = (m + x1) * x_mask  # mean-only: log_scale = 0
            return jnp.concatenate([x0, x1], axis=-1), jnp.zeros(x.shape[0])
        x1 = (x1 - m) * x_mask
        return jnp.concatenate([x0, x1], axis=-1)


class ResidualCouplingBlocks(nn.Module):
    """4 coupling flows with channel flip between (reference :1358-1421)."""

    channels: int = 256
    hidden_channels: int = 256
    kernel_size: int = 5
    dilation_rate: int = 1
    num_layers: int = 4
    num_flows: int = 4
    cond_channels: int = 512

    def setup(self):
        self.flows = [
            ResidualCouplingBlock(
                self.channels, self.hidden_channels, self.kernel_size,
                self.dilation_rate, self.num_layers, self.cond_channels,
            )
            for _ in range(self.num_flows)
        ]

    def __call__(self, x, x_mask, g=None, reverse: bool = False,
                 *, deterministic: bool = True):
        if not reverse:
            for flow in self.flows:
                x, _ = flow(x, x_mask, g=g, deterministic=deterministic)
                x = jnp.flip(x, axis=-1)
            return x
        for flow in reversed(self.flows):
            x = jnp.flip(x, axis=-1)
            x = flow(x, x_mask, g=g, reverse=True, deterministic=deterministic)
        return x


class StochasticDurationPredictor(nn.Module):
    """Spline-flow SDP (reference python/xvapitch/sdp.py:179-326).

    forward(reverse=False) → per-item duration NLL; reverse=True → log-durs.
    """

    in_channels: int = 256
    hidden_channels: int = 256
    kernel_size: int = 3
    dropout_p: float = 0.5
    num_flows: int = 4
    cond_channels: int = 512
    language_emb_dim: int = 12

    def setup(self):
        self.pre = _conv1d(self.hidden_channels)
        self.convs = DilatedDepthSeparableConv(
            self.hidden_channels, self.kernel_size, 3, self.dropout_p
        )
        self.proj = _conv1d(self.hidden_channels)
        self.flows = [ElementwiseAffine(2)] + [
            ConvFlow(2, self.hidden_channels, self.kernel_size)
            for _ in range(self.num_flows)
        ]
        self.post_pre = _conv1d(self.hidden_channels)
        self.post_convs = DilatedDepthSeparableConv(
            self.hidden_channels, self.kernel_size, 3, self.dropout_p
        )
        self.post_proj = _conv1d(self.hidden_channels)
        self.post_flows = [ElementwiseAffine(2)] + [
            ConvFlow(2, self.hidden_channels, self.kernel_size)
            for _ in range(self.num_flows)
        ]
        if self.cond_channels:
            self.cond = _conv1d(self.hidden_channels)
        if self.language_emb_dim:
            self.cond_lang = _conv1d(self.hidden_channels)

    def _encode_text(self, x, x_mask, g, lang_emb, deterministic):
        x = self.pre(x)
        if g is not None:
            if g.ndim == 2:
                g = g[:, None, :]
            x = x + self.cond(g)
        if lang_emb is not None:
            if lang_emb.ndim == 2:
                lang_emb = lang_emb[:, None, :]
            x = x + self.cond_lang(lang_emb)
        x = self.convs(x, x_mask, deterministic=deterministic)
        return self.proj(x) * x_mask

    def __call__(self, x, x_mask, dr=None, g=None, lang_emb=None,
                 reverse: bool = False, noise_scale: float = 1.0,
                 *, deterministic: bool = True):
        x = jax.lax.stop_gradient(x)  # detach_dp_input (reference model.py:793)
        x = self._encode_text(x, x_mask, g, lang_emb, deterministic)
        B, T, _ = x.shape

        if not reverse:
            assert dr is not None  # (B, T, 1)
            h = self.post_pre(dr)
            h = self.post_convs(h, x_mask, deterministic=deterministic)
            h = self.post_proj(h) * x_mask
            noise = (
                jax.random.normal(self.make_rng("noise"), (B, T, 2)) * x_mask
            )
            z_q = noise
            logdet_tot_q = 0.0
            for idx, flow in enumerate(self.post_flows):
                z_q, logdet_q = flow(z_q, x_mask, g=(x + h),
                                     deterministic=deterministic)
                logdet_tot_q += logdet_q
                if idx > 0:
                    z_q = jnp.flip(z_q, axis=-1)
            z_u, z_v = z_q[..., :1], z_q[..., 1:]
            u = jax.nn.sigmoid(z_u) * x_mask
            z0 = (dr - u) * x_mask
            logdet_tot_q += jnp.sum(
                (jax.nn.log_sigmoid(z_u) + jax.nn.log_sigmoid(-z_u)) * x_mask,
                axis=(1, 2),
            )
            nll_posterior = (
                jnp.sum(-0.5 * (math.log(2 * math.pi) + noise**2) * x_mask,
                        axis=(1, 2))
                - logdet_tot_q
            )
            z0 = jnp.log(jnp.clip(z0, min=1e-5)) * x_mask
            logdet_tot = jnp.sum(-z0, axis=(1, 2))
            z = jnp.concatenate([z0, z_v], axis=-1)
            for idx, flow in enumerate(self.flows):
                z, logdet = flow(z, x_mask, g=x, deterministic=deterministic)
                logdet_tot += logdet
                if idx > 0:
                    z = jnp.flip(z, axis=-1)
            nll_flow = (
                jnp.sum(0.5 * (math.log(2 * math.pi) + z**2) * x_mask,
                        axis=(1, 2))
                - logdet_tot
            )
            return nll_flow + nll_posterior

        # reverse: sample log-durations
        flows = list(reversed(self.flows))
        flows = flows[:-2] + [flows[-1]]  # drop the unused flow (reference :322)
        z = jax.random.normal(self.make_rng("noise"), (B, T, 2)) * noise_scale
        for flow in flows:
            z = jnp.flip(z, axis=-1)
            z = flow(z, x_mask, g=x, reverse=True, deterministic=deterministic)
        return z[..., :1]  # logw


class RelativePositioningPitchEnergyEncoder(nn.Module):
    """Per-token pitch predictor: rel-pos transformer with speaker cond
    concat, out_channels=1 (reference model.py:1268-1355)."""

    hidden_channels: int = 268  # latent + lang_emb_dim
    hidden_channels_ffn: int = 768
    num_heads: int = 2
    num_layers: int = 3
    kernel_size: int = 3
    dropout_p: float = 0.1
    conditioning_emb_dim: int = 512

    @nn.compact
    def __call__(self, x, x_lengths, speaker_emb=None, *, deterministic=True):
        # x (B, T, hidden); speaker_emb (B, cond)
        if speaker_emb is not None:
            se = jnp.broadcast_to(
                speaker_emb[:, None, :], (*x.shape[:2], speaker_emb.shape[-1])
            )
            x = jnp.concatenate([x, se], axis=-1)
        x_mask = sequence_mask(x_lengths, x.shape[1])
        h = self.hidden_channels + self.conditioning_emb_dim
        return RelativePositionTransformer(
            in_channels=h, out_channels=1, hidden_channels=h,
            hidden_channels_ffn=self.hidden_channels_ffn,
            num_heads=self.num_heads, num_layers=self.num_layers,
            kernel_size=self.kernel_size, dropout_p=self.dropout_p,
        )(x * x_mask, x_mask, deterministic=deterministic)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def gradient_reversal(x, clamp: float = 0.25):
    return x


def _grev_fwd(x, clamp):
    return x, None


def _grev_bwd(clamp, _res, g):
    return (-jnp.clip(g, -clamp, clamp),)


gradient_reversal.defvjp(_grev_fwd, _grev_bwd)


class ReversalClassifier(nn.Module):
    """Language-adversarial classifier over z_p frames
    (reference model.py:1045-1085): gradient reversal with ±0.25 clipping,
    hidden linear → language logits."""

    input_dim: int = 256
    hidden_dim: int = 256
    output_dim: int = 31
    clipping: float = 0.25

    @nn.compact
    def __call__(self, x):
        # The reference's forward does NOT apply GradientReversalFunction —
        # the apply is commented out (model.py:1068) — so for parity the
        # encoder trains TOWARD language predictability. gradient_reversal
        # (with clipping) is kept above for opt-in adversarial use.
        h = nn.Dense(self.hidden_dim)(x)
        return nn.Dense(self.output_dim)(h)
