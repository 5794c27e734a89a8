"""Griffin-Lim phase reconstruction + inverse STFT (jax).

Reference parity: AudioProcessor griffin-lim / inv_melspectrogram
(python/xvapitch/audio.py:632-760) and the conv-basis iSTFT
(python/xvapitch/stft.py:121-153). Used for viz sample synthesis from
predicted mels (output_samples, xva_train.py:1323-1365) without a vocoder.
"""
from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from .mel import inverse_mel_filterbank
from .stft import DEFAULT_MEL, MelConfig, hann_window, stft_magnitude, frame_signal


def istft(spec: jnp.ndarray, cfg: MelConfig = DEFAULT_MEL) -> jnp.ndarray:
    """Complex (n_freqs, T) → waveform via overlap-add with window-sumsquare
    normalization (reference stft.py inverse + util window_sumsquare)."""
    n_fft, hop = cfg.n_fft, cfg.hop_length
    frames = jnp.fft.irfft(spec.T, n=n_fft, axis=-1)  # (T, n_fft)
    win = jnp.asarray(hann_window(cfg.win_length, n_fft))
    frames = frames * win
    T = spec.shape[-1]
    out_len = n_fft + (T - 1) * hop

    idx = np.arange(T)[:, None] * hop + np.arange(n_fft)[None, :]
    out = jnp.zeros(out_len).at[idx.reshape(-1)].add(frames.reshape(-1))
    wss = jnp.zeros(out_len).at[idx.reshape(-1)].add(
        jnp.tile(win**2, (T, 1)).reshape(-1)
    )
    out = out / jnp.maximum(wss, 1e-8)
    return out[n_fft // 2 : n_fft // 2 + (T - 1) * hop]


def griffin_lim(
    magnitude: jnp.ndarray,
    cfg: MelConfig = DEFAULT_MEL,
    n_iter: int = 32,
    seed: int = 0,
) -> jnp.ndarray:
    """|STFT| (n_freqs, T) → waveform by iterative phase refinement."""
    rng = jax.random.PRNGKey(seed)
    angles = jax.random.uniform(rng, magnitude.shape, minval=-np.pi, maxval=np.pi)

    def body(i, angles):
        spec = magnitude * jnp.exp(1j * angles)
        y = istft(spec, cfg)
        new = _stft_complex(y, cfg)
        return jnp.angle(new[:, : magnitude.shape[1]])

    angles = jax.lax.fori_loop(0, n_iter, body, angles)
    return istft(magnitude * jnp.exp(1j * angles), cfg)


def _stft_complex(y: jnp.ndarray, cfg: MelConfig) -> jnp.ndarray:
    n_fft, hop = cfg.n_fft, cfg.hop_length
    T = y.shape[-1]
    y = jnp.pad(y, (n_fft // 2, n_fft // 2), mode="reflect")
    num_frames = 1 + T // hop
    need = (num_frames + n_fft // hop - 1) * hop
    if y.shape[-1] < need:
        y = jnp.pad(y, (0, need - y.shape[-1]))
    frames = frame_signal(y[None], n_fft, hop, num_frames)[0]
    win = jnp.asarray(hann_window(cfg.win_length, n_fft))
    return jnp.fft.rfft(frames * win, n=n_fft, axis=-1).T


def mel_to_wav(
    log_mel: jnp.ndarray, cfg: MelConfig = DEFAULT_MEL, n_iter: int = 32
) -> jnp.ndarray:
    """log-mel (n_mels, T) → waveform (viz-quality, Griffin-Lim)."""
    inv = jnp.asarray(
        inverse_mel_filterbank(
            sample_rate=cfg.sample_rate, n_fft=cfg.n_fft, n_mels=cfg.n_mels,
            fmin=cfg.fmin, fmax=cfg.fmax,
        )
    )
    mag = jnp.maximum(inv @ jnp.exp(log_mel), 0.0)
    return griffin_lim(mag, cfg, n_iter)
