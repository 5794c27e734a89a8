"""Griffin-Lim reconstruction quality on a tone."""
import numpy as np
import jax.numpy as jnp

from xva_trainer_tpu.ops import mel_spectrogram, stft_magnitude
from xva_trainer_tpu.ops.griffin_lim import griffin_lim, istft, mel_to_wav, _stft_complex
from xva_trainer_tpu.ops.stft import DEFAULT_MEL


def _tone(f=440.0, sec=0.5, sr=22050):
    t = np.arange(int(sr * sec)) / sr
    return (0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32)


def test_istft_roundtrip():
    y = _tone()
    spec = _stft_complex(jnp.asarray(y), DEFAULT_MEL)
    y2 = np.asarray(istft(spec, DEFAULT_MEL))
    n = min(len(y), len(y2))
    # ignore edges
    err = np.abs(y2[256 : n - 256] - y[256 : n - 256]).max()
    assert err < 1e-3, err


def test_griffin_lim_tone():
    y = _tone()
    mag = stft_magnitude(jnp.asarray(y)[None], DEFAULT_MEL)[0]
    rec = np.asarray(griffin_lim(mag, n_iter=16))
    spec = np.abs(np.fft.rfft(rec * np.hanning(len(rec))))
    peak = spec.argmax() * 22050 / len(rec)
    assert abs(peak - 440) < 10


def test_mel_to_wav_runs():
    y = _tone()
    mel = mel_spectrogram(jnp.asarray(y)[None])[0]
    rec = np.asarray(mel_to_wav(mel, n_iter=4))
    assert np.isfinite(rec).all() and len(rec) > 0
