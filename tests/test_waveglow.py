"""WaveGlow: forward/inverse consistency + inference shape."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from xva_trainer_tpu.models.waveglow import WaveGlow, WaveGlowConfig

TINY = WaveGlowConfig(n_flows=4, wn_layers=2, wn_channels=32, hop_length=256)


@pytest.fixture(scope="module")
def model_params():
    model = WaveGlow(TINY)
    mel = jnp.zeros((1, 8, 80))
    params = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, mel
    )
    return model, params


def test_infer_shape(model_params):
    model, params = model_params
    mel = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 80)), jnp.float32)
    wav = model.apply(params, mel, rngs={"noise": jax.random.PRNGKey(2)})
    assert wav.shape == (2, 8 * 256)
    assert np.isfinite(np.asarray(wav)).all()


def test_denoiser_removes_bias(model_params):
    """The denoiser subtracts the sigma=0 bias spectrum: denoising the bias
    audio itself at strength=1 must shrink its energy, and strength=0 must be
    a near-identity (reference waveglow/denoiser.py:56-61)."""
    from xva_trainer_tpu.models.waveglow.model import WaveGlowDenoiser

    model, params = model_params
    den = WaveGlowDenoiser(model.apply, params, frames=8)
    bias_audio = model.apply(
        params, jnp.zeros((1, 8, 80)), 0.0, rngs={"noise": jax.random.PRNGKey(0)}
    )[0]
    out_full = np.asarray(den(bias_audio, strength=1.0))
    out_zero = np.asarray(den(bias_audio, strength=0.0))
    e = float(np.sum(bias_audio**2))
    assert float(np.sum(out_full**2)) < 0.9 * e or e < 1e-10
    # strength 0 round-trips through STFT/iSTFT
    n = min(len(out_zero), bias_audio.shape[-1]) - 512
    assert np.allclose(out_zero[256:n], np.asarray(bias_audio)[256:n], atol=1e-3)


def test_forward_inverse_consistency(model_params):
    """infer(z) then forward(audio) should reproduce a Gaussian-scale z."""
    model, params = model_params
    rng = np.random.default_rng(1)
    mel = jnp.asarray(rng.standard_normal((1, 8, 80)).astype(np.float32))
    audio = model.apply(params, mel, 1.0, rngs={"noise": jax.random.PRNGKey(3)})
    z, logdet = model.apply(
        params, audio[..., None], mel, method=WaveGlow.forward
    )
    assert np.isfinite(np.asarray(z)).all()
    assert np.isfinite(np.asarray(logdet)).all()
    # round-trip: z should be ~unit-normal (it was sampled as such)
    assert 0.5 < float(jnp.std(z)) < 2.0
