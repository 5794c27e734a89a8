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
