"""HiFi-GAN in flax: MRF generator + MPD/MSD discriminators + LSGAN losses.

Parity target: reference python/hifigan/models.py (Generator:81-138,
ResBlock1:17-55, DiscriminatorP:141-177, MultiPeriodDiscriminator:180-204,
DiscriminatorS:207-240, MultiScaleDiscriminator:243-273, losses:276-331) with
config_v1.json hyperparameters (upsample [8,8,2,2] kernels [16,16,4,4],
initial 512 channels, resblock kernels [3,7,11] dilations [1,3,5]).

TPU-first notes:
- channels-last (B, T, C); convs lower onto the MXU.
- weight norm via flax nn.WeightNorm (explicit g·v/||v|| reparameterization,
  matching torch weight_norm training geometry).
- MSD's first discriminator uses power-iteration spectral norm
  (mutable 'batch_stats' carries the u/v vectors).
- optional 512-d speaker conditioning (reference Generator cond_layer:106-107,
  and the xVAPitch decoder python/xvapitch/hifigan.py:233-263).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

LRELU_SLOPE = 0.1


@dataclasses.dataclass(frozen=True)
class HifiganConfig:
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilation_sizes: Tuple[Tuple[int, ...], ...] = (
        (1, 3, 5),
        (1, 3, 5),
        (1, 3, 5),
    )
    upsample_rates: Tuple[int, ...] = (8, 8, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    in_channels: int = 80
    cond_channels: int = 0  # 512 for speaker-conditioned variants
    # xVAPitch decoder variant (reference python/xvapitch/model.py:134-149):
    conv_pre_weight_norm: bool = True
    conv_post_weight_norm: bool = True
    conv_post_bias: bool = True

    @property
    def hop(self) -> int:
        h = 1
        for u in self.upsample_rates:
            h *= u
        return h


def _wn_conv(features, kernel_size, strides=1, dilation=1, groups=1, init_std=None):
    ki = (
        nn.initializers.normal(init_std)
        if init_std
        else nn.initializers.lecun_normal()
    )
    conv = nn.Conv(
        features,
        kernel_size=(kernel_size,),
        strides=(strides,),
        kernel_dilation=(dilation,),
        feature_group_count=groups,
        padding="SAME",
        kernel_init=ki,
    )
    return nn.WeightNorm(conv)


class ResBlock1(nn.Module):
    """MRF residual block: 3×(lrelu → dilated conv → lrelu → conv) + skip."""

    channels: int
    kernel_size: int = 3
    dilations: Tuple[int, ...] = (1, 3, 5)

    @nn.compact
    def __call__(self, x):
        for d in self.dilations:
            xt = nn.leaky_relu(x, LRELU_SLOPE)
            xt = _wn_conv(self.channels, self.kernel_size, dilation=d, init_std=0.01)(xt)
            xt = nn.leaky_relu(xt, LRELU_SLOPE)
            xt = _wn_conv(self.channels, self.kernel_size, dilation=1, init_std=0.01)(xt)
            x = xt + x
        return x


class ResBlock2(nn.Module):
    channels: int
    kernel_size: int = 3
    dilations: Tuple[int, ...] = (1, 3)

    @nn.compact
    def __call__(self, x):
        for d in self.dilations:
            xt = nn.leaky_relu(x, LRELU_SLOPE)
            xt = _wn_conv(self.channels, self.kernel_size, dilation=d, init_std=0.01)(xt)
            x = xt + x
        return x


class Generator(nn.Module):
    """mel (B, T, 80) → waveform (B, T*256, 1) in [-1, 1]."""

    cfg: HifiganConfig = HifiganConfig()

    @nn.compact
    def __call__(self, x, cond_emb=None):
        c = self.cfg
        if c.conv_pre_weight_norm:
            x = _wn_conv(c.upsample_initial_channel, 7)(x)
        else:
            x = nn.Conv(c.upsample_initial_channel, (7,), padding="SAME")(x)
        if c.cond_channels:
            # cond_emb (B, cond_channels) or (B, 1, cond_channels)
            if cond_emb.ndim == 2:
                cond_emb = cond_emb[:, None, :]
            x = x + nn.Conv(c.upsample_initial_channel, (1,))(cond_emb)
        for i, (u, k) in enumerate(zip(c.upsample_rates, c.upsample_kernel_sizes)):
            x = nn.leaky_relu(x, LRELU_SLOPE)
            ch = c.upsample_initial_channel // (2 ** (i + 1))
            x = nn.WeightNorm(
                nn.ConvTranspose(
                    ch,
                    kernel_size=(k,),
                    strides=(u,),
                    padding="SAME",
                    kernel_init=nn.initializers.normal(0.01),
                )
            )(x)
            xs = 0.0
            for kr, dr in zip(c.resblock_kernel_sizes, c.resblock_dilation_sizes):
                xs = xs + ResBlock1(ch, kr, tuple(dr))(x)
            x = xs / len(c.resblock_kernel_sizes)
        x = nn.leaky_relu(x)
        if c.conv_post_weight_norm:
            x = _wn_conv(1, 7, init_std=0.01)(x)
        else:
            x = nn.Conv(
                1, (7,), padding="SAME", use_bias=c.conv_post_bias,
                kernel_init=nn.initializers.normal(0.01),
            )(x)
        return jnp.tanh(x)


class DiscriminatorP(nn.Module):
    """Period discriminator on (B, T, 1) audio folded to (B, T/p, p, 1).

    Padding is the torch-exact symmetric (k-1)//2 per conv (reference
    python/hifigan/models.py:141-177 / python/xvapitch/hifigan.py:301-360) —
    'SAME' would distribute padding differently under stride and break
    checkpoint-import forward parity.
    """

    period: int
    kernel_size: int = 5
    stride: int = 3

    @nn.compact
    def __call__(self, x):
        B, T, C = x.shape
        p = self.period
        if T % p != 0:
            pad = p - T % p
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)), mode="reflect")
            T = T + pad
        x = x.reshape(B, T // p, p, C)
        kpad = ((self.kernel_size - 1) // 2,) * 2
        fmap = []
        for ch in (32, 128, 512, 1024):
            x = nn.WeightNorm(
                nn.Conv(ch, (self.kernel_size, 1), strides=(self.stride, 1),
                        padding=(kpad, (0, 0)))
            )(x)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        x = nn.WeightNorm(
            nn.Conv(1024, (self.kernel_size, 1), padding=(kpad, (0, 0)))
        )(x)
        x = nn.leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
        x = nn.WeightNorm(nn.Conv(1, (3, 1), padding=((1, 1), (0, 0))))(x)
        fmap.append(x)
        return x.reshape(B, -1), fmap


# v2 MSD scale discriminator (reference python/hifigan/models.py:207-216):
# (channels, kernel, stride, groups, padding)
V2_SCALE_SPECS = (
    (128, 15, 1, 1, 7),
    (128, 41, 2, 4, 20),
    (256, 41, 2, 16, 20),
    (512, 41, 4, 16, 20),
    (1024, 41, 4, 16, 20),
    (1024, 41, 1, 16, 20),
    (1024, 5, 1, 1, 2),
)

# v3 (xVAPitch) scale discriminator (reference python/xvapitch/model.py:1560-1568)
V3_SCALE_SPECS = (
    (16, 15, 1, 1, 7),
    (64, 41, 4, 4, 20),
    (256, 41, 4, 16, 20),
    (1024, 41, 4, 64, 20),
    (1024, 41, 4, 256, 20),
    (1024, 5, 1, 1, 2),
)


class DiscriminatorS(nn.Module):
    """Scale discriminator on raw (possibly pooled) audio.

    Explicit torch-parity padding per conv (see DiscriminatorP note)."""

    use_spectral_norm: bool = False
    specs: tuple = V2_SCALE_SPECS

    @nn.compact
    def __call__(self, x, *, update_sn_stats: bool = False):
        def norm(conv):
            if self.use_spectral_norm:
                return nn.SpectralNorm(conv)
            return nn.WeightNorm(conv)

        fmap = []
        for ch, k, s, g, p in self.specs:
            conv = nn.Conv(
                ch, (k,), strides=(s,), feature_group_count=g,
                padding=((p, p),),
            )
            if self.use_spectral_norm:
                x = norm(conv)(x, update_stats=update_sn_stats)
            else:
                x = norm(conv)(x)
            x = nn.leaky_relu(x, LRELU_SLOPE)
            fmap.append(x)
        post = nn.Conv(1, (3,), padding=((1, 1),))
        if self.use_spectral_norm:
            x = norm(post)(x, update_stats=update_sn_stats)
        else:
            x = norm(post)(x)
        fmap.append(x)
        return x.reshape(x.shape[0], -1), fmap


def _avg_pool(x):
    return nn.avg_pool(x, window_shape=(4,), strides=(2,), padding=((2, 2),))


class MultiPeriodDiscriminator(nn.Module):
    periods: Sequence[int] = (2, 3, 5, 7, 11)

    @nn.compact
    def __call__(self, y, y_hat):
        outs_r, outs_g, fmaps_r, fmaps_g = [], [], [], []
        for p in self.periods:
            d = DiscriminatorP(p)
            o_r, f_r = d(y)
            o_g, f_g = d(y_hat)
            outs_r.append(o_r)
            outs_g.append(o_g)
            fmaps_r.append(f_r)
            fmaps_g.append(f_g)
        return outs_r, outs_g, fmaps_r, fmaps_g


class MultiScaleDiscriminator(nn.Module):
    n_scales: int = 3

    @nn.compact
    def __call__(self, y, y_hat, *, update_sn_stats: bool = False):
        outs_r, outs_g, fmaps_r, fmaps_g = [], [], [], []
        for i in range(self.n_scales):
            d = DiscriminatorS(use_spectral_norm=(i == 0))
            if i != 0:
                y = _avg_pool(y)
                y_hat = _avg_pool(y_hat)
            o_r, f_r = d(y, update_sn_stats=update_sn_stats)
            o_g, f_g = d(y_hat, update_sn_stats=update_sn_stats)
            outs_r.append(o_r)
            outs_g.append(o_g)
            fmaps_r.append(f_r)
            fmaps_g.append(f_g)
        return outs_r, outs_g, fmaps_r, fmaps_g


class HifiganDiscriminator(nn.Module):
    """MPD + MSD in one module (one param tree, one optimizer).

    periods/n_scales default to the full config; reduced values exist for
    structural (multi-chip dryrun) validation only."""

    periods: Sequence[int] = (2, 3, 5, 7, 11)
    n_scales: int = 3

    @nn.compact
    def __call__(self, y, y_hat, *, update_sn_stats: bool = False):
        p = MultiPeriodDiscriminator(self.periods)(y, y_hat)
        s = MultiScaleDiscriminator(self.n_scales)(
            y, y_hat, update_sn_stats=update_sn_stats
        )
        return tuple(a + b for a, b in zip(p, s))


# ---------------- losses (reference models.py:276-331) ----------------


def feature_matching_loss(fmaps_r, fmaps_g):
    """Σ mean|real_fmap - fake_fmap| × 2."""
    loss = 0.0
    for fr, fg in zip(fmaps_r, fmaps_g):
        for r, g in zip(fr, fg):
            loss += jnp.mean(jnp.abs(jax.lax.stop_gradient(r) - g))
    return loss * 2.0


def discriminator_loss(outs_real, outs_fake):
    """LSGAN: Σ mean((1-D(y))²) + mean(D(ŷ)²)."""
    loss = 0.0
    for dr, dg in zip(outs_real, outs_fake):
        loss += jnp.mean((1.0 - dr) ** 2) + jnp.mean(dg**2)
    return loss


def generator_adv_loss(outs_fake):
    """LSGAN: Σ mean((1-D(ŷ))²)."""
    loss = 0.0
    for dg in outs_fake:
        loss += jnp.mean((1.0 - dg) ** 2)
    return loss
