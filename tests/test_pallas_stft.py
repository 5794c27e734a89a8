"""Fused Pallas mel kernel parity vs the jnp reference path (interpret mode on CPU)."""
import pytest

pytestmark = pytest.mark.slow  # full-size/e2e tier: run via `make test-all`
import numpy as np
import jax.numpy as jnp

from xva_trainer_tpu.ops import mel_spectrogram, mel_spectrogram_hifigan, linear_spectrogram, MelConfig
from xva_trainer_tpu.ops.pallas_stft import mel_spectrogram_pallas


def _audio(b=2, T=22050):
    rng = np.random.default_rng(3)
    t = np.arange(T) / 22050.0
    sig = 0.5 * np.sin(2 * np.pi * 330 * t)
    return np.clip(sig + 0.05 * rng.standard_normal((b, T)), -1, 1).astype(np.float32)


def test_pallas_mel_tacotron_parity():
    y = _audio()
    ref = np.asarray(mel_spectrogram(jnp.asarray(y)))
    ours = np.asarray(mel_spectrogram_pallas(jnp.asarray(y)))
    assert ours.shape == ref.shape
    assert np.abs(ours - ref).mean() < 1e-3


def test_pallas_mel_with_linear():
    y = _audio(b=1)
    mel, lin = mel_spectrogram_pallas(jnp.asarray(y), return_linear=True)
    ref_lin = np.asarray(linear_spectrogram(jnp.asarray(y)))
    assert lin.shape == ref_lin.shape == (1, 513, 87)
    assert np.abs(np.asarray(lin) - ref_lin).mean() < 1e-3


def test_pallas_mel_hifigan_parity():
    y = _audio()
    ref = np.asarray(mel_spectrogram_hifigan(jnp.asarray(y)))
    ours = np.asarray(
        mel_spectrogram_pallas(jnp.asarray(y), center=False, mag_eps=1e-9)
    )
    assert ours.shape == ref.shape
    assert np.abs(ours - ref).mean() < 1e-3


def test_pallas_mel_short_input():
    # shorter than one 128-frame block
    y = _audio(b=1, T=4096)
    ref = np.asarray(mel_spectrogram(jnp.asarray(y)))
    ours = np.asarray(mel_spectrogram_pallas(jnp.asarray(y)))
    assert ours.shape == ref.shape == (1, 80, 17)
    assert np.abs(ours - ref).mean() < 1e-3
