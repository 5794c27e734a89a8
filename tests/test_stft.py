"""Golden-parity tests: JAX mel/linear spectrograms vs the PyTorch reference
pipeline (torch.stft with the exact padding/window/compression semantics of
reference python/xvapitch/stft.py + dataset.py and python/hifigan/meldataset.py).

BASELINE.md north star: mel outputs < 1e-3 L1 vs the PyTorch reference.
"""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from xva_trainer_tpu.ops import (
    DEFAULT_MEL,
    MelConfig,
    hann_window,
    linear_spectrogram,
    mel_filterbank,
    mel_spectrogram,
    mel_spectrogram_hifigan,
)


def _torch_mel_tacotron(y: np.ndarray, cfg: MelConfig) -> np.ndarray:
    """Reference TacotronSTFT.mel_spectrogram semantics in torch.

    reflect-pad n_fft//2 both sides, hann(periodic), |STFT|, mel matmul,
    log(clamp(., 1e-5)). (reference python/xvapitch/stft.py:92-119,
    dataset.py:52-71 — same math, centered torch.stft.)
    """
    yt = torch.from_numpy(y).float()
    win = torch.from_numpy(hann_window(cfg.win_length, cfg.n_fft).copy())
    spec = torch.stft(
        yt,
        cfg.n_fft,
        hop_length=cfg.hop_length,
        win_length=cfg.n_fft,
        window=win,
        center=True,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    mag = spec.abs()
    basis = torch.from_numpy(
        mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax).copy()
    )
    mel = torch.matmul(basis, mag)
    return torch.log(torch.clamp(mel, min=cfg.clip_val)).numpy()


def _torch_mel_hifigan(y: np.ndarray, cfg: MelConfig) -> np.ndarray:
    """Reference hifigan/meldataset.py:217-242 semantics in torch."""
    yt = torch.from_numpy(y).float()
    pad = (cfg.n_fft - cfg.hop_length) // 2
    yt = torch.nn.functional.pad(yt.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
    win = torch.hann_window(cfg.win_length)
    spec = torch.stft(
        yt,
        cfg.n_fft,
        hop_length=cfg.hop_length,
        win_length=cfg.win_length,
        window=win,
        center=False,
        pad_mode="reflect",
        normalized=False,
        onesided=True,
        return_complex=True,
    )
    spec = torch.sqrt(spec.real**2 + spec.imag**2 + 1e-9)
    basis = torch.from_numpy(
        mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.n_mels, cfg.fmin, cfg.fmax).copy()
    )
    mel = torch.matmul(basis, spec)
    return torch.log(torch.clamp(mel, min=cfg.clip_val)).numpy()


@pytest.fixture(scope="module")
def audio_batch():
    rng = np.random.default_rng(0)
    T = 22050  # 1s, multiple of hop
    t = np.arange(T) / 22050.0
    sig = 0.5 * np.sin(2 * np.pi * 220 * t) + 0.2 * np.sin(2 * np.pi * 3313 * t)
    noise = 0.05 * rng.standard_normal((4, T))
    batch = np.clip(sig[None, :] + noise, -1.0, 1.0).astype(np.float32)
    return batch


def test_mel_filterbank_properties():
    fb = mel_filterbank(22050, 1024, 80, 0.0, 8000.0)
    assert fb.shape == (80, 513)
    assert fb.min() >= 0.0
    # every filter has support; supports increase in center frequency
    peaks = fb.argmax(axis=1)
    assert (np.diff(peaks) >= 0).all()
    assert fb.sum() > 0
    # Slaney norm: filter areas ~equal (2/bandwidth normalization)
    areas = fb.sum(axis=1)
    assert areas[5:].std() / areas[5:].mean() < 0.2


def test_hann_window_matches_torch():
    w = hann_window(1024, 1024)
    wt = torch.hann_window(1024).numpy()
    np.testing.assert_allclose(w, wt, atol=1e-6)


def test_mel_tacotron_parity(audio_batch):
    ref = _torch_mel_tacotron(audio_batch, DEFAULT_MEL)
    ours = np.asarray(mel_spectrogram(jnp.asarray(audio_batch)))
    assert ours.shape == ref.shape  # (B, 80, 1 + T//hop)
    l1 = np.abs(ours - ref).mean()
    assert l1 < 1e-3, f"mel L1 {l1}"


def test_mel_tacotron_parity_matmul(audio_batch):
    ref = _torch_mel_tacotron(audio_batch, DEFAULT_MEL)
    ours = np.asarray(mel_spectrogram(jnp.asarray(audio_batch), method="matmul"))
    l1 = np.abs(ours - ref).mean()
    assert l1 < 1e-3, f"mel (matmul) L1 {l1}"


def test_mel_hifigan_parity(audio_batch):
    ref = _torch_mel_hifigan(audio_batch, DEFAULT_MEL)
    ours = np.asarray(mel_spectrogram_hifigan(jnp.asarray(audio_batch)))
    assert ours.shape == ref.shape  # (B, 80, T//hop)
    l1 = np.abs(ours - ref).mean()
    assert l1 < 1e-3, f"hifigan mel L1 {l1}"


def test_mel_hifigan_fullband_parity(audio_batch):
    cfg = MelConfig(fmax=None)
    ref = _torch_mel_hifigan(audio_batch, cfg)
    ours = np.asarray(mel_spectrogram_hifigan(jnp.asarray(audio_batch), cfg))
    l1 = np.abs(ours - ref).mean()
    assert l1 < 1e-3


def test_linear_spectrogram_parity(audio_batch):
    yt = torch.from_numpy(audio_batch).float()
    win = torch.from_numpy(hann_window(1024, 1024).copy())
    spec = torch.stft(
        yt, 1024, hop_length=256, win_length=1024, window=win,
        center=True, pad_mode="reflect", normalized=False,
        onesided=True, return_complex=True,
    ).abs().numpy()
    ours = np.asarray(linear_spectrogram(jnp.asarray(audio_batch)))
    assert ours.shape == spec.shape == (4, 513, 87)
    assert np.abs(ours - spec).mean() < 1e-3


def test_odd_length_signal():
    rng = np.random.default_rng(1)
    y = rng.standard_normal((2, 22051)).astype(np.float32) * 0.1
    ref = _torch_mel_tacotron(y, DEFAULT_MEL)
    ours = np.asarray(mel_spectrogram(jnp.asarray(y)))
    assert ours.shape == ref.shape
    assert np.abs(ours - ref).mean() < 1e-3


def test_fft_vs_matmul_cross_parity(audio_batch):
    """The two STFT formulations (XLA fft / MXU DFT-basis matmul) must agree
    closely: default_stft_method() picks matmul on accelerators and fft on
    CPU, so any drift between them would mean the train step computes a
    different spectrogram on TPU than every CPU-run parity test checks."""
    from xva_trainer_tpu.ops.stft import stft_magnitude

    y = jnp.asarray(audio_batch)
    a = np.asarray(stft_magnitude(y, method="fft"))
    b = np.asarray(stft_magnitude(y, method="matmul"))
    assert np.abs(a - b).max() < 2e-3
    assert np.abs(a - b).mean() < 1e-5
    ml_a = np.asarray(mel_spectrogram_hifigan(y, method="fft"))
    ml_b = np.asarray(mel_spectrogram_hifigan(y, method="matmul"))
    assert np.abs(ml_a - ml_b).max() < 5e-3  # post-log, clamped at 1e-5


def test_default_stft_method_env_override(monkeypatch):
    from xva_trainer_tpu.ops.stft import default_stft_method

    monkeypatch.setenv("XVA_STFT_METHOD", "matmul")
    assert default_stft_method() == "matmul"
    monkeypatch.setenv("XVA_STFT_METHOD", "fft")
    assert default_stft_method() == "fft"
    monkeypatch.delenv("XVA_STFT_METHOD")
    assert default_stft_method() in ("fft", "matmul")
