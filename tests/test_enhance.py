"""Learned speech enhancement: training improves SI-SDR on synthetic noise."""
import pytest

pytestmark = pytest.mark.slow  # full-size/e2e tier: run via `make test-all`
import numpy as np

from xva_trainer_tpu.models.enhance import (
    EnhanceConfig,
    SpeechEnhancer,
    si_sdr,
    train_enhancer,
)

TINY = EnhanceConfig(n_fft=256, hop=64, base_channels=8, depth=2)


def _make_data(seed=0, n=22050 * 4):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 22050
    clean = 0.4 * np.sin(2 * np.pi * 220 * t) * (
        0.5 + 0.5 * np.sin(2 * np.pi * 1.3 * t)
    )
    noise = 0.25 * rng.standard_normal(n)
    return (clean + noise).astype(np.float32), clean.astype(np.float32)


def test_enhancer_shapes():
    enh = SpeechEnhancer(cfg=TINY, chunk_seconds=0.5)
    y = np.random.default_rng(0).standard_normal(22050).astype(np.float32) * 0.1
    out = enh.enhance(y)
    assert out.shape == y.shape
    assert np.isfinite(out).all()


def test_training_improves_si_sdr():
    noisy, clean = _make_data()
    import jax.numpy as jnp

    base = float(si_sdr(jnp.asarray(noisy), jnp.asarray(clean)))
    params, losses = train_enhancer(noisy, clean, TINY, steps=40,
                                    segment=8192, batch=2)
    assert losses[-1] < losses[0]  # loss (−SI-SDR) decreases
    enh = SpeechEnhancer(params, TINY, chunk_seconds=0.4)
    out = enh.enhance(noisy[:22050])
    improved = float(si_sdr(jnp.asarray(out), jnp.asarray(clean[:22050])))
    assert improved > base + 1.0  # ≥1 dB better than the noisy input
