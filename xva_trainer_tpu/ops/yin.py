"""Batched on-device YIN f0 (difference fn via rFFT autocorrelation, CMNDF,
parabolic interpolation) — the TPU analogue of ``data/pitch.yin_f0``.

The reference extracts f0 per utterance on the host (librosa.pyin / praat,
reference python/fastpitch1_1/fastpitch/data_function.py:136-146); round 1
replaced that with a C++ YIN, still one host call per item. Here the whole
YIN runs inside the same jit as the mel extraction (ops/features.py), so a
cache build issues ONE device dispatch per length bucket instead of one host
YIN + one device mel per item. Everything is static-shaped: rfft over
2*frame_length, cumsum-based energy terms, argmax-based threshold search —
no data-dependent control flow.

Frame grid parity: the caller supplies a signal already reflect-padded by
``frame_length//2`` on both sides (exactly how ``data/pitch.yin_f0`` centers
frames), and ``n_frames`` is controlled by the caller via the padded length.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..data.pitch import FMAX, FMIN


@functools.partial(
    jax.jit,
    static_argnames=("sr", "frame_length", "hop_length", "n_frames",
                     "fmin", "fmax", "threshold"),
)
def yin_f0_batch(
    y_padded: jnp.ndarray,
    sr: int = 22050,
    frame_length: int = 1024,
    hop_length: int = 256,
    n_frames: int = 0,
    fmin: float = FMIN,
    fmax: float = FMAX,
    threshold: float = 0.15,
) -> jnp.ndarray:
    """f0 (Hz) per frame for a batch, 0 where unvoiced.

    y_padded: (B, T_pad) float32, ALREADY centered (reflect-padded
    frame_length//2 each side per item, zero-padded to T_pad).
    Returns (B, n_frames); frames past an item's true length are garbage and
    must be sliced by the caller (they see zero-padding, usually unvoiced).
    """
    W = frame_length
    tau_min = max(2, int(sr / fmax))
    tau_max = min(W - 1, int(sr / fmin))

    idx = (jnp.arange(n_frames)[:, None] * hop_length
           + jnp.arange(W)[None, :])  # (F, W)
    frames = y_padded[:, idx]  # (B, F, W)

    # Difference function via Wiener–Khinchin, all frames at once
    fft_size = 2 * W
    spec = jnp.fft.rfft(frames, fft_size, axis=-1)
    acf = jnp.fft.irfft(spec * jnp.conj(spec), fft_size,
                        axis=-1)[..., : tau_max + 1]
    sq = frames * frames
    cumsq = jnp.concatenate(
        [jnp.zeros(frames.shape[:-1] + (1,), frames.dtype),
         jnp.cumsum(sq, axis=-1)], axis=-1)  # (B, F, W+1)
    taus = jnp.arange(tau_max + 1)
    r0 = cumsq[..., W]  # (B, F) total energy
    e_head = r0[..., None] - cumsq[..., taus]   # energy of y[tau:W]
    e_tail = cumsq[..., W - taus]               # energy of y[0:W-tau]
    d = jnp.maximum(e_head + e_tail - 2.0 * acf, 0.0)  # (B, F, tau_max+1)

    # Cumulative-mean-normalized difference
    cum = jnp.cumsum(d[..., 1:], axis=-1)
    cmndf = jnp.concatenate(
        [jnp.ones(d.shape[:-1] + (1,), d.dtype),
         d[..., 1:] * taus[1:] / jnp.maximum(cum, 1e-12)], axis=-1)

    # First LOCAL MINIMUM below threshold in [tau_min, tau_max], else the
    # global min (canonical YIN step 4)
    band = cmndf[..., tau_min: tau_max + 1]
    nxt = jnp.concatenate(
        [band[..., 1:],
         jnp.full(band.shape[:-1] + (1,), jnp.inf, band.dtype)], axis=-1)
    cand = (band < threshold) & (band <= nxt)
    first = jnp.where(cand.any(axis=-1), jnp.argmax(cand, axis=-1),
                      jnp.argmin(band, axis=-1))
    tau = first + tau_min  # (B, F)

    # Parabolic interpolation around tau
    t0 = jnp.clip(tau - 1, 0, tau_max)
    t2 = jnp.clip(tau + 1, 0, tau_max)
    d0 = jnp.take_along_axis(cmndf, t0[..., None], axis=-1)[..., 0]
    d1 = jnp.take_along_axis(cmndf, tau[..., None], axis=-1)[..., 0]
    d2 = jnp.take_along_axis(cmndf, t2[..., None], axis=-1)[..., 0]
    denom = 2.0 * (2.0 * d1 - d0 - d2)
    shift = jnp.where(jnp.abs(denom) > 1e-12,
                      (d2 - d0) / jnp.maximum(jnp.abs(denom), 1e-12), 0.0)
    shift = jnp.clip(shift * jnp.sign(denom), -0.5, 0.5)
    tau_f = tau.astype(jnp.float32) + shift

    f0 = sr / jnp.maximum(tau_f, 1e-6)
    voiced = (d1 < threshold) & (f0 >= fmin) & (f0 <= fmax)
    voiced &= (r0 / W) > 1e-6  # low-energy frames are unvoiced
    return jnp.where(voiced, f0, 0.0).astype(jnp.float32)
