"""Device beta-binomial attention prior (ops/attn_prior.py) parity tests.

Reference semantics: python/fastpitch1_1/common/utils.py
beta_binomial_prior_distribution — rows i=1..M of betabinom(P, i, M+1-i).pmf
over k=0..P-1.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import betabinom

from xva_trainer_tpu.ops.attn_prior import beta_binomial_attn_prior


def exact_host_prior(P: int, M: int) -> np.ndarray:
    x = np.arange(P)
    return np.stack(
        [betabinom(P, i, M + 1 - i).pmf(x) for i in range(1, M + 1)]
    ).astype(np.float32)  # (M, P)


@pytest.mark.parametrize("P,M", [(7, 19), (32, 128), (96, 384), (128, 511)])
def test_matches_scipy_exact(P, M):
    t_x, t_y = 128, 512
    out = np.asarray(
        beta_binomial_attn_prior(
            jnp.array([P]), jnp.array([M]), t_x=t_x, t_y=t_y
        )
    )[0]
    ref = exact_host_prior(P, M)
    # f32 evaluation of cancelling ~5e3-magnitude log terms floors the
    # accuracy near 1e-3 relative — still ~5x tighter than the host
    # interpolator's zoom error (see test_close_to_host_interpolator)
    np.testing.assert_allclose(out[:M, :P], ref, atol=2e-4, rtol=3e-3)
    # masked region exactly zero
    assert np.all(out[M:, :] == 0)
    assert np.all(out[:, P:] == 0)
    # NOTE: rows are NOT normalized — the reference evaluates pmf at
    # x=arange(P), truncating the k=P tail (common/utils.py), and we match.


def test_batched_lengths_independent():
    lens_p = jnp.array([5, 40, 128])
    lens_m = jnp.array([9, 160, 512])
    out = np.asarray(
        beta_binomial_attn_prior(lens_p, lens_m, t_x=128, t_y=512)
    )
    for b, (P, M) in enumerate(zip([5, 40, 128], [9, 160, 512])):
        np.testing.assert_allclose(
            out[b, :M, :P], exact_host_prior(P, M), atol=2e-4, rtol=3e-3
        )


def test_close_to_host_interpolator():
    """The host collate path (data/prior.py) zoom-interpolates a rounded-size
    base and sits ~1.1e-2 from the exact pmf at (96, 384); the device prior is
    ~1e-4 from exact. They must agree to the interpolator's own error."""
    from xva_trainer_tpu.data.prior import BetaBinomialInterpolator

    interp = BetaBinomialInterpolator()
    P, M = 96, 384
    approx = interp(M, P)  # (M, P)
    out = np.asarray(
        beta_binomial_attn_prior(jnp.array([P]), jnp.array([M]), 128, 512)
    )[0, :M, :P]
    assert np.max(np.abs(out - approx)) < 2e-2


def test_jit_static_shapes():
    fn = jax.jit(beta_binomial_attn_prior, static_argnums=(2, 3))
    a = fn(jnp.array([32, 64]), jnp.array([100, 200]), 64, 256)
    b = fn(jnp.array([10, 20]), jnp.array([50, 60]), 64, 256)  # cache hit
    assert a.shape == b.shape == (2, 256, 64)
    assert bool(jnp.all(jnp.isfinite(a))) and bool(jnp.all(jnp.isfinite(b)))


def test_stage1_step_device_prior_equivalence():
    """A stage-1 train step with device_prior=True (no prior in the batch)
    must match the same step fed the exact scipy host prior — proving the
    wiring, not just the op."""
    import optax

    from xva_trainer_tpu.models.fastpitch import FastPitchConfig, FastPitch
    from xva_trainer_tpu.train.fastpitch_trainer import (
        TrainState, make_stage_step,
    )

    cfg = FastPitchConfig(
        symbols_embedding_dim=64, in_fft_n_layers=1, out_fft_n_layers=1,
        in_fft_d_head=32, out_fft_d_head=32, in_fft_filter_size=64,
        out_fft_filter_size=64, predictor_filter_size=32,
    )
    model = FastPitch(cfg)
    B, t_x, t_y = 2, 16, 64
    rng = np.random.default_rng(0)
    tokens = rng.integers(1, 40, (B, t_x)).astype(np.int32)
    in_lens = np.array([12, 16], np.int32)
    mel = rng.normal(size=(B, t_y, 80)).astype(np.float32)
    mel_lens = np.array([50, 64], np.int32)
    prior = np.zeros((B, t_y, t_x), np.float32)
    for b in range(B):
        P, M = int(in_lens[b]), int(mel_lens[b])
        prior[b, :M, :P] = exact_host_prior(P, M)
    pitch = np.zeros((B, 1, t_y), np.float32)
    energy = np.zeros((B, t_y), np.float32)

    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(tokens), jnp.asarray(in_lens),
        jnp.asarray(mel), jnp.asarray(mel_lens), jnp.asarray(pitch),
        jnp.asarray(energy), jnp.asarray(prior),
    )
    tx = optax.sgd(1e-3)

    def run(device_prior, with_prior_in_batch):
        import copy

        step = make_stage_step(model, 1, tx, use_amp=False,
                               device_prior=device_prior)
        state = TrainState(params=copy.deepcopy(params),
                           opt_state=tx.init(params), step=jnp.zeros((),
                           jnp.int32))
        batch = {
            "tokens": jnp.asarray(tokens), "in_lens": jnp.asarray(in_lens),
            "mel": jnp.asarray(mel), "mel_lens": jnp.asarray(mel_lens),
        }
        if with_prior_in_batch:
            batch["prior"] = jnp.asarray(prior)
        _, meta = step(state, batch, jnp.asarray(0.0), jax.random.PRNGKey(7))
        return float(meta["loss"])

    loss_host = run(device_prior=False, with_prior_in_batch=True)
    loss_dev = run(device_prior=True, with_prior_in_batch=False)
    assert np.isfinite(loss_host) and np.isfinite(loss_dev)
    # identical up to the device prior's f32 evaluation error (~1e-3 relative)
    assert abs(loss_host - loss_dev) < 2e-3 * max(1.0, abs(loss_host))
