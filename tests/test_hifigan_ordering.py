"""HiFi-GAN D-first vs G-first update-ordering semantics (VERDICT r1 #9).

Reference v2 steps D first, then G against the UPDATED discriminator
(hifigan/xva_train.py:451-567); the default fused step updates G against the
stale D to save a generator forward. Given identical inputs and init:
- the D update must be IDENTICAL across orderings (same fakes from the same
  initial G),
- the G update must DIFFER (stale vs updated D),
both finite.
"""
import pytest

pytestmark = pytest.mark.slow  # full-size/e2e tier: run via `make test-all`
import jax
import jax.numpy as jnp
import numpy as np
import optax

from xva_trainer_tpu.models.hifigan import (
    Generator,
    HifiganConfig,
    HifiganDiscriminator,
)
from xva_trainer_tpu.ops.stft import MelConfig
from xva_trainer_tpu.train.hifigan_trainer import (
    SEGMENT_SIZE,
    GanState,
    make_gan_step,
)


def _setup():
    gen = Generator(HifiganConfig(upsample_initial_channel=16))
    disc = HifiganDiscriminator(periods=(2,), n_scales=1)
    rng = np.random.default_rng(0)
    seg = jnp.asarray(
        np.clip(rng.standard_normal((2, SEGMENT_SIZE, 1)) * 0.1, -1, 1)
        .astype(np.float32))
    mel = jnp.zeros((2, SEGMENT_SIZE // 256, 80), jnp.float32)
    g_params = gen.init(jax.random.PRNGKey(0), mel)
    d_vars = disc.init(jax.random.PRNGKey(1), seg, seg)
    g_tx = optax.adamw(2e-4, b1=0.8, b2=0.99)
    d_tx = optax.adamw(2e-4, b1=0.8, b2=0.99)

    def fresh_state():
        # deep-copy: the step donates its input state (donate_argnums=0), so
        # each variant needs its own buffers
        cp = lambda t: jax.tree_util.tree_map(jnp.array, t)
        return GanState(
            g_params=cp(g_params), d_params=cp({"params": d_vars["params"]}),
            d_stats=cp(d_vars.get("batch_stats", {})),
            g_opt=g_tx.init(cp(g_params)),
            d_opt=d_tx.init(cp({"params": d_vars["params"]})),
            step=jnp.zeros((), jnp.int32))

    return gen, disc, g_tx, d_tx, seg, fresh_state


def test_orderings_same_d_update_different_g_update():
    gen, disc, g_tx, d_tx, seg, fresh_state = _setup()
    out = {}
    for d_first in (False, True):
        step = make_gan_step(gen, disc, g_tx, d_tx, MelConfig(),
                             use_amp=False, d_first=d_first)
        state, meta = step(fresh_state(), seg)
        assert np.isfinite(float(meta["g_loss"]))
        assert np.isfinite(float(meta["d_loss"]))
        out[d_first] = state

    d_a = jax.tree_util.tree_leaves(out[False].d_params)
    d_b = jax.tree_util.tree_leaves(out[True].d_params)
    for a, b in zip(d_a, d_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    g_diff = max(
        float(jnp.abs(a - b).max())
        for a, b in zip(jax.tree_util.tree_leaves(out[False].g_params),
                        jax.tree_util.tree_leaves(out[True].g_params))
    )
    assert g_diff > 0.0, "G updates should differ between orderings"
