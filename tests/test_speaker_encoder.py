"""Speaker encoder: shapes, pooling, crop embedding, and discriminativity
(different "voices" should be farther apart than same-voice crops, even with
random weights thanks to the instance-norm + spectral frontend)."""
import pytest

pytestmark = pytest.mark.slow  # full-size/e2e tier: run via `make test-all`
import numpy as np
import jax.numpy as jnp
import torch

from xva_trainer_tpu.models.speaker_encoder import SpeakerEncoder, spk_mel_spectrogram
from xva_trainer_tpu.ops.mel import mel_filterbank


def _voice(f0: float, seconds: float = 2.0, seed: int = 0):
    rng = np.random.default_rng(seed)
    t = np.arange(int(16000 * seconds)) / 16000
    harmonics = sum(
        (0.5 / k) * np.sin(2 * np.pi * f0 * k * t + rng.uniform(0, 6))
        for k in range(1, 6)
    )
    return (0.3 * harmonics + 0.01 * rng.standard_normal(len(t))).astype(np.float32)


def test_frontend_matches_torchaudio():
    try:
        import torchaudio
    except ImportError:
        import pytest

        pytest.skip("torchaudio not available")
    y = _voice(160, 1.0)
    ours = np.asarray(spk_mel_spectrogram(jnp.asarray(y)[None]))[0]
    tf = torchaudio.transforms.MelSpectrogram(
        sample_rate=16000, n_fft=512, win_length=400, hop_length=160,
        window_fn=torch.hamming_window, n_mels=64,
    )
    yt = torch.from_numpy(np.concatenate([y[1:2], y]))
    yt = yt[1:] - 0.97 * yt[:-1]
    ref = tf(yt[None]).numpy()[0]
    assert ours.shape == ref.shape
    rel = np.abs(ours - ref).mean() / (np.abs(ref).mean() + 1e-9)
    assert rel < 1e-3, rel


def test_htk_filterbank():
    fb = mel_filterbank(16000, 512, 64, 0.0, 8000.0, htk=True, norm=None)
    assert fb.shape == (64, 257)
    assert fb.max() <= 1.0 + 1e-6  # unnormalized triangles peak at 1


def test_embedding_shapes_and_discriminativity():
    enc = SpeakerEncoder()
    e1 = enc.compute_embedding(_voice(110, seed=1))
    e1b = enc.compute_embedding(_voice(110, seed=2))
    e2 = enc.compute_embedding(_voice(300, seed=3))
    assert e1.shape == (512,)
    np.testing.assert_allclose(np.linalg.norm(e1), 1.0, atol=1e-5)
    same = float(e1 @ e1b)
    diff = float(e1 @ e2)
    assert same > diff, (same, diff)
