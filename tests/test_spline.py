"""Rational-quadratic spline: forward/inverse round-trip + logdet consistency."""
import numpy as np
import jax.numpy as jnp

from xva_trainer_tpu.ops.spline import rational_quadratic_spline


def test_spline_roundtrip():
    rng = np.random.default_rng(0)
    K = 10
    x = jnp.asarray(rng.uniform(-8, 8, (4, 64)).astype(np.float32))  # incl. tails
    uw = jnp.asarray(rng.standard_normal((4, 64, K)).astype(np.float32))
    uh = jnp.asarray(rng.standard_normal((4, 64, K)).astype(np.float32))
    ud = jnp.asarray(rng.standard_normal((4, 64, K - 1)).astype(np.float32))

    y, ld_f = rational_quadratic_spline(x, uw, uh, ud, inverse=False)
    x2, ld_i = rational_quadratic_spline(y, uw, uh, ud, inverse=True)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=2e-3)
    # logdets cancel
    np.testing.assert_allclose(
        np.asarray(ld_f + ld_i), 0.0, atol=2e-3
    )
    # tails are identity
    outside = np.abs(np.asarray(x)) > 5.0
    np.testing.assert_allclose(np.asarray(y)[outside], np.asarray(x)[outside])


def test_spline_monotonic():
    rng = np.random.default_rng(1)
    K = 10
    x = jnp.asarray(np.linspace(-4.9, 4.9, 200, dtype=np.float32))
    uw = jnp.asarray(np.tile(rng.standard_normal((1, K)), (200, 1)).astype(np.float32))
    uh = jnp.asarray(np.tile(rng.standard_normal((1, K)), (200, 1)).astype(np.float32))
    ud = jnp.asarray(np.tile(rng.standard_normal((1, K - 1)), (200, 1)).astype(np.float32))
    y, _ = rational_quadratic_spline(x, uw, uh, ud)
    assert (np.diff(np.asarray(y)) > 0).all()
