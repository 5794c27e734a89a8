"""Fused Pallas TPU kernel: waveform → log-mel (+ linear) spectrogram.

One kernel performs the reference's whole per-item CPU feature pipeline
(reference python/xvapitch/dataset.py:247-251 recomputes mel+linear per epoch
on host): framing, hann windowing, real DFT, magnitude, mel projection and
dynamic-range compression — a single VMEM-resident pass per 128-frame block.

TPU mapping:
- Framing: with hop=256 | n_fft=1024, frame block F[i, q*hop+r] = Y2[i+q, r]
  where Y2 is the signal reshaped (rows, hop). The kernel receives FOUR
  shifted views of Y2 (q = 0..3) as separate inputs, so Pallas's grid
  pipeline double-buffers the HBM→VMEM loads; F is a concat in VMEM.
- Real DFT: windowed DFT basis as a (1024, 1280) matrix ([re|im], each
  zero-padded 513→640 to keep lane-aligned 128-multiples) — frames @ basis
  rides the MXU. HIGHEST precision holds <1e-3 L1 parity (bf16 passes do not).
- Mel: magnitude (128, 640) @ mel^T (640, 128 zero-padded from 513×80),
  then log(clamp(., 1e-5)).

Grid: one program per 128-frame block; batch via leading grid dimension.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .mel import mel_filterbank
from .stft import MelConfig, DEFAULT_MEL, dft_basis, hann_window

BLOCK = 128          # frames per grid step
_RE_PAD = 640        # 513 freq bins zero-padded to a lane multiple
_MEL_PAD = 128       # 80 mel bins padded to one lane


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.lru_cache(maxsize=None)
def _padded_basis(n_fft: int, win_length: int) -> np.ndarray:
    """(n_fft, 2*_RE_PAD) windowed DFT basis, [re | im] each padded to 640."""
    b = dft_basis(n_fft, win_length)  # (n_fft, 2*(n_fft//2+1))
    n_freqs = n_fft // 2 + 1
    out = np.zeros((n_fft, 2 * _RE_PAD), dtype=np.float32)
    out[:, :n_freqs] = b[:, :n_freqs]
    out[:, _RE_PAD : _RE_PAD + n_freqs] = b[:, n_freqs:]
    return out


@functools.lru_cache(maxsize=None)
def _split_radix_consts(n_fft: int, win_length: int):
    """Split-radix (decimation-in-time depth 1) constants.

    The 1024-point windowed real DFT splits into two 512-point DFTs over the
    even/odd samples: X[k] = E[k] + W^k O[k], W = e^{-2πi/1024}, where
    E/O use period-512 bases evaluated at k = 0..512 directly (no mirroring)
    and the window folds into each half-basis. Halves the MXU FLOPs of the
    full-basis matmul.

    Returns (basis_e, basis_o) each (n_fft/2, 2*_RE_PAD) and (cos, sin)
    twiddles each (1, _RE_PAD).
    """
    half = n_fft // 2
    n_freqs = n_fft // 2 + 1  # 513 output bins
    w = hann_window(win_length, n_fft, dtype=np.float64)
    m = np.arange(half)[:, None]
    k = np.arange(n_freqs)[None, :]
    ang = -2.0 * np.pi * m * k / half  # period-half basis at all k
    basis_e = np.zeros((half, 2 * _RE_PAD), np.float32)
    basis_o = np.zeros((half, 2 * _RE_PAD), np.float32)
    basis_e[:, :n_freqs] = (np.cos(ang) * w[0::2][:, None]).astype(np.float32)
    basis_e[:, _RE_PAD : _RE_PAD + n_freqs] = (
        np.sin(ang) * w[0::2][:, None]
    ).astype(np.float32)
    basis_o[:, :n_freqs] = (np.cos(ang) * w[1::2][:, None]).astype(np.float32)
    basis_o[:, _RE_PAD : _RE_PAD + n_freqs] = (
        np.sin(ang) * w[1::2][:, None]
    ).astype(np.float32)
    theta = 2.0 * np.pi * np.arange(n_freqs) / n_fft
    cosv = np.zeros((1, _RE_PAD), np.float32)
    sinv = np.zeros((1, _RE_PAD), np.float32)
    cosv[0, :n_freqs] = np.cos(theta)
    sinv[0, :n_freqs] = np.sin(theta)
    return basis_e, basis_o, cosv, sinv


@functools.lru_cache(maxsize=None)
def _padded_melw(cfg: MelConfig) -> np.ndarray:
    """(_RE_PAD, _MEL_PAD) mel basis transpose, zero padded."""
    fb = mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax)
    out = np.zeros((_RE_PAD, _MEL_PAD), dtype=np.float32)
    out[: cfg.n_freqs, : cfg.n_mels] = fb.T
    return out


def _make_kernel(mag_eps: float, clip_val: float, with_linear: bool):
    def kernel(y0, y1, y2, y3, basis_ref, melw_ref, mel_out, *rest):
        frames = jnp.concatenate([y0[:], y1[:], y2[:], y3[:]], axis=1)
        proj = jax.lax.dot_general(
            frames,
            basis_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        re = proj[:, :_RE_PAD]
        im = proj[:, _RE_PAD:]
        mag = jnp.sqrt(re * re + im * im + mag_eps)
        if with_linear:
            rest[0][:] = mag
        mel = jax.lax.dot_general(
            mag,
            melw_ref[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        mel_out[:] = jnp.log(jnp.clip(mel, min=clip_val))

    return kernel


def _make_split_kernel(mag_eps: float, clip_val: float, with_linear: bool):
    """Split-radix variant: two half-size matmuls + twiddle combine."""

    def kernel(e0, e1, e2, e3, o0, o1, o2, o3, be_ref, bo_ref, cos_ref,
               sin_ref, melw_ref, mel_out, *rest):
        fe = jnp.concatenate([e0[:], e1[:], e2[:], e3[:]], axis=1)  # (B, 512)
        fo = jnp.concatenate([o0[:], o1[:], o2[:], o3[:]], axis=1)
        dot = functools.partial(
            jax.lax.dot_general,
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )
        pe = dot(fe, be_ref[:])  # (B, 2*_RE_PAD)
        po = dot(fo, bo_ref[:])
        c = cos_ref[:]
        s = sin_ref[:]
        ere, eim = pe[:, :_RE_PAD], pe[:, _RE_PAD:]
        ore, oim = po[:, :_RE_PAD], po[:, _RE_PAD:]
        re = ere + c * ore + s * oim
        im = eim + c * oim - s * ore
        mag = jnp.sqrt(re * re + im * im + mag_eps)
        if with_linear:
            rest[0][:] = mag
        mel = dot(mag, melw_ref[:])
        mel_out[:] = jnp.log(jnp.clip(mel, min=clip_val))

    return kernel


def _interpret() -> bool:
    return jax.default_backend() == "cpu"


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "center", "mag_eps", "return_linear", "num_frames",
                     "algorithm"),
)
def _mel_pallas_1d(
    y: jnp.ndarray,
    cfg: MelConfig,
    center: bool,
    mag_eps: float,
    return_linear: bool,
    num_frames: int,
    algorithm: str = "split",
):
    n_fft, hop = cfg.n_fft, cfg.hop_length
    q_count = n_fft // hop
    # center=None: the caller already padded the signal (batched cache
    # builds reflect-pad each item with ITS OWN samples on the host before
    # packing the bucket buffer — ops/features.py); frame 0 starts at y[0].
    if center is None:
        pad = 0
    else:
        pad = n_fft // 2 if center else (n_fft - hop) // 2

    nf_pad = _round_up(max(num_frames, 1), BLOCK)
    rows_needed = nf_pad + q_count - 1
    total = rows_needed * hop

    if pad:
        y = jnp.pad(y, (pad, pad), mode="reflect")
    y = jnp.pad(y, (0, max(0, total - y.shape[0])))[:total]
    y2 = y.reshape(rows_needed, hop)
    y2 = jnp.pad(y2, ((0, q_count), (0, 0)))

    melw = jnp.asarray(_padded_melw(cfg))
    grid = (nf_pad // BLOCK,)
    melw_spec = pl.BlockSpec(melw.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
    out_shape = [jax.ShapeDtypeStruct((nf_pad, _MEL_PAD), jnp.float32)]
    out_specs = [pl.BlockSpec((BLOCK, _MEL_PAD), lambda i: (i, 0), memory_space=pltpu.VMEM)]
    if return_linear:
        out_shape.append(jax.ShapeDtypeStruct((nf_pad, _RE_PAD), jnp.float32))
        out_specs.append(
            pl.BlockSpec((BLOCK, _RE_PAD), lambda i: (i, 0), memory_space=pltpu.VMEM)
        )

    if algorithm == "split" and n_fft % 2 == 0:
        # even/odd sample views: same shift-reshape trick on the half-rate
        # sequences (column m of the concat == sample 2m (+1) of the frame)
        y2e, y2o = y2[:, 0::2], y2[:, 1::2]  # (rows, hop/2)
        views = [
            jax.lax.slice_in_dim(v, q, q + nf_pad, axis=0)
            for v in (y2e, y2o)
            for q in range(q_count)
        ]  # [e0..e3, o0..o3]
        be, bo, cosv, sinv = _split_radix_consts(n_fft, cfg.win_length)
        consts = [jnp.asarray(be), jnp.asarray(bo), jnp.asarray(cosv),
                  jnp.asarray(sinv), melw]
        view_spec = pl.BlockSpec((BLOCK, hop // 2), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
        const_specs = [
            pl.BlockSpec(c.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
            for c in consts
        ]
        flops_per_block = (
            2 * 2 * BLOCK * (n_fft // 2) * 2 * _RE_PAD
            + 2 * BLOCK * _RE_PAD * _MEL_PAD
        )
        kernel = _make_split_kernel(mag_eps, cfg.clip_val, return_linear)
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[view_spec] * (2 * q_count) + const_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=_interpret(),
            cost_estimate=pl.CostEstimate(
                flops=flops_per_block * grid[0],
                bytes_accessed=(q_count * BLOCK * hop + sum(c.size for c in consts))
                * 4 * grid[0],
                transcendentals=BLOCK * (_RE_PAD + _MEL_PAD) * grid[0],
            ),
        )(*views, *consts)
    else:
        views = [
            jax.lax.slice_in_dim(y2, q, q + nf_pad, axis=0)
            for q in range(q_count)
        ]
        basis = jnp.asarray(_padded_basis(n_fft, cfg.win_length))
        view_spec = pl.BlockSpec((BLOCK, hop), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM)
        const_spec = pl.BlockSpec(basis.shape, lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)
        flops_per_block = (
            2 * BLOCK * n_fft * 2 * _RE_PAD + 2 * BLOCK * _RE_PAD * _MEL_PAD
        )
        outs = pl.pallas_call(
            _make_kernel(mag_eps, cfg.clip_val, return_linear),
            grid=grid,
            in_specs=[view_spec] * q_count + [const_spec, melw_spec],
            out_specs=out_specs,
            out_shape=out_shape,
            interpret=_interpret(),
            cost_estimate=pl.CostEstimate(
                flops=flops_per_block * grid[0],
                bytes_accessed=(q_count * BLOCK * hop + basis.size + melw.size)
                * 4 * grid[0],
                transcendentals=BLOCK * (_RE_PAD + _MEL_PAD) * grid[0],
            ),
        )(*views, basis, melw)

    mel = outs[0][:num_frames, : cfg.n_mels].T  # (n_mels, T)
    if return_linear:
        lin = outs[1][:num_frames, : cfg.n_freqs].T  # (n_freqs, T)
        return mel, lin
    return mel


def mel_spectrogram_pallas(
    y: jnp.ndarray,
    cfg: MelConfig = DEFAULT_MEL,
    *,
    center=True,
    mag_eps: float = 0.0,
    return_linear: bool = False,
    algorithm: str = "split",
):
    """Fused log-mel (and optional linear) spectrogram of (T,) or (B, T).

    center=True → Tacotron semantics; center=False with mag_eps=1e-9 →
    HiFi-GAN semantics; center=None → no padding at all (the input is an
    already-padded buffer; frames = 1 + (T - n_fft)//hop — matches
    ``stft_magnitude(center=None)``, used by the batched cache build).
    algorithm: "split" (split-radix, half the MXU FLOPs) or "full"
    (single-basis matmul). Returns (..., n_mels, frames) [+ (..., 513, frames)].
    """
    # the kernels bind exactly n_fft//hop == 4 shifted signal views (the
    # default 1024/256 geometry); other ratios fall back to the XLA path
    # rather than crashing inside pallas_call with an arity mismatch. The
    # fallback must honor `center` — a center=None caller already padded the
    # signal, and re-padding would shift every frame by n_fft//2 samples.
    if cfg.n_fft // cfg.hop_length != 4:
        from .stft import dynamic_range_compression, stft_magnitude

        yb = y if y.ndim > 1 else y[None]
        mag = stft_magnitude(yb, cfg, center=center, mag_eps=mag_eps)
        basis = jnp.asarray(mel_filterbank(
            cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax))
        mel = dynamic_range_compression(
            jnp.einsum("mf,bft->bmt", basis, mag), cfg.clip_val)
        mel = mel if y.ndim > 1 else mel[0]
        if return_linear:
            return mel, (mag if y.ndim > 1 else mag[0])
        return mel

    T = y.shape[-1]
    if center is None:
        num_frames = 1 + (T - cfg.n_fft) // cfg.hop_length
    elif center:
        num_frames = 1 + T // cfg.hop_length
    else:
        num_frames = T // cfg.hop_length
    fn = functools.partial(
        _mel_pallas_1d,
        cfg=cfg,
        center=center,
        mag_eps=mag_eps,
        return_linear=return_linear,
        num_frames=num_frames,
        algorithm=algorithm,
    )
    if y.ndim == 1:
        return fn(y)
    flat = y.reshape(-1, T)
    out = jax.vmap(fn)(flat)
    if return_linear:
        mel, lin = out
        return (
            mel.reshape(*y.shape[:-1], *mel.shape[1:]),
            lin.reshape(*y.shape[:-1], *lin.shape[1:]),
        )
    return out.reshape(*y.shape[:-1], *out.shape[1:])
