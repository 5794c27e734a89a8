"""Fused G+D single-backward v3 step == two-pass formulation.

make_v3_step(fused_gd=True) computes both gradient trees in one backward
over ``g_loss + d_loss`` with stop_gradient routing. This test proves the
routing is exact: starting from identical state and batch, the fused and
unfused steps must produce the same losses and the same updated G and D
parameter trees (small float noise from different XLA fusion orders only).
"""

import pytest

pytestmark = pytest.mark.slow  # numerics-parity tier: run via `make test-all`
import copy

import jax
import jax.numpy as jnp
import numpy as np
import optax

from xva_trainer_tpu.models.xvapitch import (
    VitsDiscriminator,
    XVAPitch,
    XVAPitchConfig,
)
from xva_trainer_tpu.train.xvapitch_trainer import (
    V3State,
    _materialize_spec,
    make_v3_step,
)

B, T_TEXT, T_SPEC = 2, 24, 64
HOP = 256


def _tiny_batch(seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(T_SPEC * HOP) / 22050
    wav = np.stack([
        (0.4 * np.sin(2 * np.pi * (140 + 50 * i) * t)).astype(np.float32)
        for i in range(B)
    ])[..., None]
    wav16 = (wav * 32767.0).astype(np.int16)
    return {
        "tokens": jnp.asarray(rng.integers(1, 500, (B, T_TEXT)), jnp.int32),
        "tlens": jnp.asarray([T_TEXT, T_TEXT - 4], jnp.int32),
        "slens": jnp.asarray([T_SPEC, T_SPEC - 8], jnp.int32),
        "pitch": jnp.asarray(rng.standard_normal((B, 1, T_SPEC)), jnp.float32),
        "energy": jnp.asarray(rng.standard_normal((B, T_SPEC)), jnp.float32),
        "wav": jnp.asarray(wav16),
        "dvec": jnp.asarray(rng.standard_normal((B, 512)) * 0.1, jnp.float32),
        "lang": jnp.zeros((B,), jnp.int32),
    }


@pytest.mark.parametrize("use_amp", [False, True])
def test_v3_fused_gd_matches_unfused(use_amp):
    cfg = XVAPitchConfig(
        n_vocab=524, big=False, upsample_initial_channel=32,
        resblock_kernel_sizes=(3,), spec_segment_size=8, mltts_rc=False,
        text_layers=2, posterior_layers=3, flow_wn_layers=2, num_flows=2,
        sdp_flows=2, pitch_layers=1,
    )
    model, disc = XVAPitch(cfg), VitsDiscriminator()
    batch = _tiny_batch()
    rngs = {k: jax.random.PRNGKey(i) for i, k in enumerate(
        ["params", "noise", "segments", "dropout"])}
    lin0, wav0 = _materialize_spec(batch, hop=cfg.hop_length)
    g_params = model.init(
        rngs, batch["tokens"], batch["tlens"], lin0, batch["slens"],
        batch["pitch"], batch["energy"], wav0, batch["dvec"], batch["lang"],
    )
    seg = jnp.zeros((B, cfg.spec_segment_size * cfg.hop_length, 1))
    d_params = disc.init(jax.random.PRNGKey(9), seg, seg)
    g_tx, d_tx = optax.sgd(1e-3), optax.sgd(1e-3)

    results = {}
    for fused in (False, True):
        step = make_v3_step(model, disc, g_tx, d_tx, freeze_post_dec=False,
                            use_amp=use_amp, fused_gd=fused)
        state = V3State(
            g_params=copy.deepcopy(g_params),
            d_params=copy.deepcopy(d_params),
            g_opt=g_tx.init(g_params), d_opt=d_tx.init(d_params),
            step=jnp.zeros((), jnp.int32),
        )
        new_state, meta = step(state, batch, jax.random.PRNGKey(3))
        results[fused] = (new_state, meta)

    m0, m1 = results[False][1], results[True][1]
    assert np.isfinite(float(m0["loss"]))
    np.testing.assert_allclose(float(m0["loss"]), float(m1["loss"]),
                               rtol=1e-5)
    np.testing.assert_allclose(float(m0["loss_disc"]),
                               float(m1["loss_disc"]), rtol=1e-5)

    # updated parameter trees identical (up to XLA fusion-order float noise)
    for attr in ("g_params", "d_params"):
        a = jax.tree_util.tree_leaves(getattr(results[False][0], attr))
        b = jax.tree_util.tree_leaves(getattr(results[True][0], attr))
        assert len(a) == len(b)
        for xa, xb in zip(a, b):
            np.testing.assert_allclose(
                np.asarray(xa), np.asarray(xb), rtol=2e-4, atol=2e-6)


def test_v3_fused_gd_freeze_and_hifi_only_paths():
    """The stage-1 freeze mask and hifi_only variants run and stay finite
    under the fused step (same _finish tail as unfused)."""
    cfg = XVAPitchConfig(
        n_vocab=524, big=False, upsample_initial_channel=32,
        resblock_kernel_sizes=(3,), spec_segment_size=8, mltts_rc=False,
        text_layers=2, posterior_layers=3, flow_wn_layers=2, num_flows=2,
        sdp_flows=2, pitch_layers=1,
    )
    model, disc = XVAPitch(cfg), VitsDiscriminator()
    batch = _tiny_batch(1)
    rngs = {k: jax.random.PRNGKey(i) for i, k in enumerate(
        ["params", "noise", "segments", "dropout"])}
    lin0, wav0 = _materialize_spec(batch, hop=cfg.hop_length)
    g_params = model.init(
        rngs, batch["tokens"], batch["tlens"], lin0, batch["slens"],
        batch["pitch"], batch["energy"], wav0, batch["dvec"], batch["lang"],
    )
    seg = jnp.zeros((B, cfg.spec_segment_size * cfg.hop_length, 1))
    d_params = disc.init(jax.random.PRNGKey(9), seg, seg)
    g_tx, d_tx = optax.sgd(1e-3), optax.sgd(1e-3)

    for kwargs in ({"freeze_post_dec": True},
                   {"freeze_post_dec": False, "hifi_only": True}):
        step = make_v3_step(model, disc, g_tx, d_tx, use_amp=False,
                            fused_gd=True, **kwargs)
        state = V3State(
            g_params=copy.deepcopy(g_params),
            d_params=copy.deepcopy(d_params),
            g_opt=g_tx.init(g_params), d_opt=d_tx.init(d_params),
            step=jnp.zeros((), jnp.int32),
        )
        _, meta = step(state, batch, jax.random.PRNGKey(4))
        assert np.isfinite(float(meta["loss"])), kwargs
        assert np.isfinite(float(meta["loss_disc"])), kwargs
