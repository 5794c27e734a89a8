"""JAX spectrogram ops matching the reference's two mel pipelines.

Two pipelines exist in the reference and both are reproduced here bit-closely
(<1e-3 L1 vs the PyTorch implementations, verified in tests/test_stft.py):

1. **Tacotron/xVAPitch path** (reference python/xvapitch/stft.py:92-119 +
   dataset.py:29-71): reflect-pad ``n_fft//2`` both sides, hann(periodic)
   window, |STFT|, mel basis matmul, ``log(clamp(x, 1e-5))``. Also the
   513-channel linear spectrogram fed to the VITS posterior encoder.
2. **HiFi-GAN path** (reference python/hifigan/meldataset.py:217-242):
   reflect-pad ``(n_fft-hop)//2`` both sides, center=False,
   ``sqrt(re^2+im^2+1e-9)``, same mel basis + log-clamp.

TPU-first design notes:
- Framing uses a reshape+shift trick (valid whenever ``hop | n_fft``): the
  frame matrix ``F[i, q*hop+r] = y[(i+q)*hop + r]`` is ``n_fft//hop`` shifted
  views of the signal reshaped to ``(T//hop, hop)`` — no gather, no conv,
  fully static shapes.
- The magnitude spectrum can be computed either with XLA's native rFFT or as
  a DFT-basis matmul (frames @ basis) that rides the MXU; the fused Pallas
  kernel in ``pallas_stft.py`` uses the matmul form.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .mel import mel_filterbank


@dataclasses.dataclass(frozen=True)
class MelConfig:
    """Audio/feature constants (reference parity set — BASELINE.md)."""

    sample_rate: int = 22050
    n_fft: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    n_mels: int = 80
    fmin: float = 0.0
    fmax: Optional[float] = 8000.0
    clip_val: float = 1e-5  # dynamic-range compression clamp

    @property
    def n_freqs(self) -> int:
        return self.n_fft // 2 + 1


DEFAULT_MEL = MelConfig()
# HiFi-GAN loss mel uses the full band (fmax_for_loss=null in config_v1.json).
LOSS_MEL = MelConfig(fmax=None)


@functools.lru_cache(maxsize=None)
def hann_window(win_length: int, n_fft: int, dtype=np.float32) -> np.ndarray:
    """Periodic (fftbins=True) hann window, zero-center-padded to n_fft.

    Matches scipy.signal.get_window('hann', win, fftbins=True) +
    librosa pad_center as used at reference python/xvapitch/stft.py:79-82.
    """
    n = np.arange(win_length, dtype=np.float64)
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
    if n_fft > win_length:
        pad = (n_fft - win_length) // 2
        w = np.pad(w, (pad, n_fft - win_length - pad))
    return w.astype(dtype)


def frame_signal(y: jnp.ndarray, n_fft: int, hop: int, num_frames: int) -> jnp.ndarray:
    """Frame an already-padded signal into overlapping windows.

    y: (..., T) with T >= (num_frames + n_fft//hop - 1) * hop.
    Returns (..., num_frames, n_fft).

    Uses the shift-reshape decomposition F[i, q*hop+r] = y[(i+q)*hop + r]
    (requires hop | n_fft) — O(n_fft/hop) slices instead of a gather.
    """
    if n_fft % hop == 0:
        q_count = n_fft // hop
        need = (num_frames + q_count - 1) * hop
        y = y[..., :need]
        y2 = y.reshape(*y.shape[:-1], num_frames + q_count - 1, hop)
        parts = [
            jax.lax.slice_in_dim(y2, q, q + num_frames, axis=-2)
            for q in range(q_count)
        ]
        return jnp.concatenate(parts, axis=-1)
    # General fallback: gather.
    idx = np.arange(num_frames)[:, None] * hop + np.arange(n_fft)[None, :]
    return y[..., idx]


def _pad_reflect(y: jnp.ndarray, pad: int) -> jnp.ndarray:
    pad_cfg = [(0, 0)] * (y.ndim - 1) + [(pad, pad)]
    return jnp.pad(y, pad_cfg, mode="reflect")


def default_stft_method() -> str:
    """STFT formulation for device compute: the windowed-DFT-basis matmul on
    accelerators (rides the MXU — measured 2x the XLA fft lowering for the
    mel cache path, BENCH_r03; TPUs have no FFT hardware), jnp.fft on CPU
    (where the radix FFT beats an O(n²) matmul).

    The target platform is the active ``jax.default_device`` when one is set
    (so CPU-pinned traces on a TPU host — the cpu_init_device pattern — get
    the radix FFT, not the O(n²) matmul; ADVICE r4 low), else the process
    default backend. Called at trace time, so each placement compiles its
    own best form. Escape hatch: ``XVA_STFT_METHOD=fft|matmul`` forces one
    formulation everywhere.
    """
    import os

    env = os.environ.get("XVA_STFT_METHOD")
    if env in ("fft", "matmul"):
        return env
    try:
        dev = jax.config.jax_default_device
        platform = (getattr(dev, "platform", None)
                    or jax.default_backend())
        return "matmul" if platform != "cpu" else "fft"
    except Exception:  # pre-backend-init call
        return "fft"


def stft_magnitude(
    y: jnp.ndarray,
    cfg: MelConfig = DEFAULT_MEL,
    *,
    center: bool = True,
    mag_eps: float = 0.0,
    method: Optional[str] = None,
) -> jnp.ndarray:
    """|STFT| of (..., T) → (..., n_freqs, num_frames).

    center=True  → reference Tacotron semantics (pad n_fft//2 reflect).
    center=False → reference HiFi-GAN semantics: caller is expected to have a
    signal of length T; we reflect-pad (n_fft-hop)//2 and use valid framing.
    center=None  → NO padding: the caller pre-padded each item (host-side
    per-item reflect of n_fft//2, ops/features.py batched cache build), so
    frame t covers item[t*hop - n_fft//2 : t*hop + n_fft//2] exactly like
    center=True; num_frames = 1 + (T - n_fft)//hop.
    method=None → default_stft_method() (matmul on accelerators, fft on CPU;
    both parity-tested against each other and torch at <1e-3 L1).
    """
    if method is None:
        method = default_stft_method()
    n_fft, hop = cfg.n_fft, cfg.hop_length
    T = y.shape[-1]
    if center is None:
        num_frames = 1 + (T - n_fft) // hop
    elif center:
        y = _pad_reflect(y, n_fft // 2)
        num_frames = 1 + T // hop
    else:
        y = _pad_reflect(y, (n_fft - hop) // 2)
        num_frames = T // hop
    # Pad tail so the shift-reshape framing has enough rows.
    q_count = max(1, n_fft // hop)
    need = (num_frames + q_count - 1) * hop
    if y.shape[-1] < need:
        y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(0, need - y.shape[-1])])

    frames = frame_signal(y, n_fft, hop, num_frames)

    if method == "matmul":
        # Window is folded into the DFT basis (conv-basis formulation).
        basis = jnp.asarray(dft_basis(n_fft, cfg.win_length))  # (n_fft, 2*n_freqs)
        # HIGHEST: full-f32 MXU passes (default bf16 passes cost ~1e-2 mag error).
        proj = jnp.matmul(
            frames.astype(jnp.float32), basis, precision=jax.lax.Precision.HIGHEST
        )
        re, im = proj[..., : cfg.n_freqs], proj[..., cfg.n_freqs :]
        mag = jnp.sqrt(re * re + im * im + mag_eps)
    else:
        window = jnp.asarray(hann_window(cfg.win_length, n_fft), dtype=y.dtype)
        spec = jnp.fft.rfft((frames * window).astype(jnp.float32), n=n_fft, axis=-1)
        mag = jnp.sqrt(jnp.real(spec) ** 2 + jnp.imag(spec) ** 2 + mag_eps)
    # (..., num_frames, n_freqs) → (..., n_freqs, num_frames) reference layout
    return jnp.swapaxes(mag, -1, -2)


@functools.lru_cache(maxsize=None)
def dft_basis(n_fft: int, win_length: int, dtype=np.float32) -> np.ndarray:
    """Windowed real-DFT basis (n_fft, 2*(n_fft//2+1)): [re | im] columns.

    frames @ basis == windowed rFFT — the matmul/MXU formulation of the
    reference's conv-basis STFT (python/xvapitch/stft.py:66-88).
    """
    n_freqs = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_freqs)[None, :]
    ang = -2.0 * np.pi * n * k / n_fft
    basis = np.concatenate([np.cos(ang), np.sin(ang)], axis=1)
    w = hann_window(win_length, n_fft, dtype=np.float64)
    return (basis * w[:, None]).astype(dtype)


def dynamic_range_compression(x: jnp.ndarray, clip_val: float = 1e-5) -> jnp.ndarray:
    """log(clamp(x, clip_val)) — reference python/xvapitch/dataset.py:70."""
    return jnp.log(jnp.clip(x, min=clip_val))


def dynamic_range_decompression(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.exp(x)


def linear_spectrogram(y: jnp.ndarray, cfg: MelConfig = DEFAULT_MEL) -> jnp.ndarray:
    """513-ch linear magnitude spectrogram (VITS posterior encoder input).

    Matches AudioProcessor.spectrogram (reference python/xvapitch/audio.py:632)
    with do_amp_to_db_linear=False: raw magnitude, centered frames.
    """
    return stft_magnitude(y, cfg, center=True)


def mel_spectrogram(
    y: jnp.ndarray,
    cfg: MelConfig = DEFAULT_MEL,
    *,
    method: Optional[str] = None,
) -> jnp.ndarray:
    """Tacotron-style log-mel of (..., T) in [-1,1] → (..., n_mels, frames).

    Parity target: TacotronSTFT.mel_spectrogram (reference
    python/xvapitch/dataset.py:52-71).
    """
    mag = stft_magnitude(y, cfg, center=True, method=method)
    basis = jnp.asarray(
        mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax)
    )
    mel = jnp.einsum("mf,...ft->...mt", basis, mag)
    return dynamic_range_compression(mel, cfg.clip_val)


def mel_spectrogram_hifigan(
    y: jnp.ndarray,
    cfg: MelConfig = DEFAULT_MEL,
    *,
    method: Optional[str] = None,
) -> jnp.ndarray:
    """HiFi-GAN-style log-mel: center=False, (n_fft-hop)/2 pad, +1e-9 mag eps.

    Parity target: mel_spectrogram (reference python/hifigan/meldataset.py:217-242),
    also used as the training mel loss in both GAN trainers.
    """
    mag = stft_magnitude(y, cfg, center=False, mag_eps=1e-9, method=method)
    basis = jnp.asarray(
        mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax)
    )
    mel = jnp.einsum("mf,...ft->...mt", basis, mag)
    return dynamic_range_compression(mel, cfg.clip_val)
