"""WaveGlow flow vocoder in flax (legacy v2 inference path).

Parity target: reference python/fastpitch1_1/waveglow/model.py (vendored
NVIDIA WaveGlow): audio squeezed into groups of 8, 12 flows of
[invertible 1x1 conv → WN affine coupling] conditioned on upsampled mels,
with 2 channels dropped to the output every 4 flows; plus the denoiser's
bias-removal trick. Used only by legacy inference (SURVEY.md §2.3), so the
reverse (synthesis) path is the first-class citizen here; forward (training)
is provided for completeness.
"""
from __future__ import annotations

import dataclasses
from typing import List

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..xvapitch.layers import WN


@dataclasses.dataclass(frozen=True)
class WaveGlowConfig:
    n_mel_channels: int = 80
    n_flows: int = 12
    n_group: int = 8
    n_early_every: int = 4
    n_early_size: int = 2
    wn_layers: int = 8
    wn_channels: int = 256
    wn_kernel: int = 3
    hop_length: int = 256


class Invertible1x1Conv(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, z, reverse: bool = False):
        # z (B, T, C)
        def init_w(key, shape):
            w = jax.random.orthogonal(key, shape[0])
            # ensure det +1
            det = jnp.linalg.det(w)
            w = w.at[:, 0].set(jnp.where(det < 0, -w[:, 0], w[:, 0]))
            return w

        W = self.param("W", init_w, (self.channels, self.channels))
        if reverse:
            return z @ jnp.linalg.inv(W)
        logdet = jnp.log(jnp.abs(jnp.linalg.det(W))) * z.shape[1]
        return z @ W, logdet


class AffineCoupling(nn.Module):
    half: int
    cond_channels: int
    wn_layers: int = 8
    wn_channels: int = 256
    wn_kernel: int = 3

    def setup(self):
        self.start = nn.Dense(self.wn_channels)
        self.wn = WN(self.wn_channels, self.wn_kernel, 2, self.wn_layers,
                     cond_channels=self.cond_channels)
        # end layer zero-init (stable identity start)
        self.end = nn.Dense(
            2 * self.half, kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.zeros,
        )

    def _ls_b(self, z0, cond):
        h = self.start(z0)
        h = self.wn(h, None, g=cond)
        out = self.end(h)
        # NVIDIA layout (reference waveglow/model.py:232-233): log_s is the
        # SECOND half of the projection, b the first — imported checkpoints
        # depend on this ordering
        return out[..., self.half :], out[..., : self.half]

    def __call__(self, z, cond, reverse: bool = False):
        z0, z1 = z[..., : self.half], z[..., self.half :]
        log_s, b = self._ls_b(z0, cond)
        if reverse:
            z1 = (z1 - b) * jnp.exp(-log_s)
            return jnp.concatenate([z0, z1], axis=-1)
        z1 = jnp.exp(log_s) * z1 + b
        return jnp.concatenate([z0, z1], axis=-1), jnp.sum(log_s, axis=(1, 2))


class WaveGlow(nn.Module):
    cfg: WaveGlowConfig = WaveGlowConfig()

    def setup(self):
        c = self.cfg
        self.upsample = nn.ConvTranspose(
            c.n_mel_channels, kernel_size=(1024,), strides=(c.hop_length,),
            padding="SAME",
        )
        n_half = c.n_group // 2
        n_remaining = c.n_group
        convs: List = []
        couplings: List = []
        self._early = []
        for k in range(c.n_flows):
            if k % c.n_early_every == 0 and k > 0:
                n_remaining -= c.n_early_size
            convs.append(Invertible1x1Conv(n_remaining))
            couplings.append(
                AffineCoupling(
                    n_remaining // 2,
                    c.n_mel_channels * c.n_group,
                    c.wn_layers, c.wn_channels, c.wn_kernel,
                )
            )
        self.convs = convs
        self.couplings = couplings

    def _cond(self, mel, T_groups):
        """mel (B, T_mel, 80) → (B, T_groups, 80*n_group)."""
        c = self.cfg
        up = self.upsample(mel)  # (B, ~T_mel*hop, 80)
        need = T_groups * c.n_group
        up = up[:, :need]
        B = up.shape[0]
        return up.reshape(B, T_groups, c.n_group * c.n_mel_channels)

    def forward(self, audio, mel):
        """Training direction: audio (B, T, 1) → z, log_s/logdet sums."""
        c = self.cfg
        B, T, _ = audio.shape
        Tg = T // c.n_group
        z = audio[:, : Tg * c.n_group, 0].reshape(B, Tg, c.n_group)
        cond = self._cond(mel, Tg)
        out_z = []
        logdet = jnp.zeros(B)
        n_remaining = c.n_group
        for k in range(c.n_flows):
            if k % c.n_early_every == 0 and k > 0:
                out_z.append(z[..., : c.n_early_size])
                z = z[..., c.n_early_size :]
                n_remaining -= c.n_early_size
            z, ld1 = self.convs[k](z)
            z, ld2 = self.couplings[k](z, cond)
            logdet = logdet + ld1 + ld2
        out_z.append(z)
        return jnp.concatenate(out_z, axis=-1), logdet

    def infer(self, mel, sigma: float = 1.0):
        """mel (B, T_mel, 80) → audio (B, T_mel*hop)."""
        c = self.cfg
        B, T_mel, _ = mel.shape
        Tg = T_mel * c.hop_length // c.n_group
        cond = self._cond(mel, Tg)
        rng = self.make_rng("noise")
        # channel sizes per flow (reverse order)
        sizes, n_remaining = [], c.n_group
        for k in range(c.n_flows):
            if k % c.n_early_every == 0 and k > 0:
                n_remaining -= c.n_early_size
            sizes.append(n_remaining)
        z = jax.random.normal(rng, (B, Tg, sizes[-1])) * sigma
        for k in reversed(range(c.n_flows)):
            z = self.couplings[k](z, cond, reverse=True)
            z = self.convs[k](z, reverse=True)
            if k % c.n_early_every == 0 and k > 0:
                z_extra = jax.random.normal(
                    jax.random.fold_in(rng, k), (B, Tg, c.n_early_size)
                ) * sigma
                z = jnp.concatenate([z_extra, z], axis=-1)
        return z.reshape(B, Tg * c.n_group)

    def __call__(self, mel, sigma: float = 1.0):
        return self.infer(mel, sigma)


class WaveGlowDenoiser:
    """Removes WaveGlow's model bias from synthesized audio (reference
    fastpitch1_1/waveglow/denoiser.py:32-61): run the vocoder on a zero mel at
    sigma=0, keep the |STFT| of that bias audio, then spectral-subtract
    ``strength * bias`` from any synthesized clip (phase preserved).
    """

    def __init__(self, apply_fn, params, n_mel: int = 80, frames: int = 88):
        import jax

        mel = jnp.zeros((1, frames, n_mel))
        bias = apply_fn(params, mel, 0.0, rngs={"noise": jax.random.PRNGKey(0)})
        spec = self._stft(jnp.asarray(bias[0]))
        # first analysis frame of the bias spectrum, as a (n_freqs, 1) column
        self.bias_spec = jnp.abs(spec[:, :1])

    @staticmethod
    def _stft(y):
        from ...ops.griffin_lim import _stft_complex
        from ...ops.stft import DEFAULT_MEL

        return _stft_complex(y, DEFAULT_MEL)

    def __call__(self, audio: jnp.ndarray, strength: float = 0.1) -> jnp.ndarray:
        from ...ops.griffin_lim import istft
        from ...ops.stft import DEFAULT_MEL

        spec = self._stft(audio)
        mag = jnp.maximum(jnp.abs(spec) - self.bias_spec * strength, 0.0)
        phase = spec / jnp.maximum(jnp.abs(spec), 1e-8)
        out = istft(mag * phase, DEFAULT_MEL)
        return out[: audio.shape[-1]]
