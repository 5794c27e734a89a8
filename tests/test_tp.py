"""Tensor parallelism over the "model" mesh axis (parallel/tp.py).

The reference has no TP (SURVEY.md §2.6); the framework reserves the axis and
these tests prove the reservation is real: a FastPitch train step runs on a
(data=4, model=2) mesh with the 1536-wide FFN Megatron-sharded, and matches
the replicated run's loss.
"""

import pytest

pytestmark = pytest.mark.slow  # numerics-parity tier: run via `make test-all`
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from xva_trainer_tpu.parallel.mesh import make_mesh, shard_batch
from xva_trainer_tpu.parallel.tp import (
    FASTPITCH_TP_RULES,
    XVAPITCH_TP_RULES,
    shard_params,
    sharding_summary,
    tp_pspecs,
)


def _fp_setup(ffn=64):
    from xva_trainer_tpu.models.fastpitch import FastPitch, FastPitchConfig

    cfg = FastPitchConfig(
        symbols_embedding_dim=64, in_fft_n_layers=1, out_fft_n_layers=1,
        in_fft_d_head=32, out_fft_d_head=32, in_fft_filter_size=ffn,
        out_fft_filter_size=ffn, predictor_filter_size=32,
    )
    model = FastPitch(cfg)
    B, Tt, Tm = 8, 16, 64
    rng = np.random.default_rng(0)
    batch = {
        "tokens": jnp.asarray(rng.integers(1, 148, (B, Tt)).astype(np.int32)),
        "in_lens": jnp.full((B,), Tt, jnp.int32),
        "mel": jnp.asarray(rng.standard_normal((B, Tm, 80)).astype(np.float32)),
        "mel_lens": jnp.full((B,), Tm, jnp.int32),
        "pitch": jnp.zeros((B, 1, Tm)),
        "energy": jnp.zeros((B, Tm)),
        "prior": jnp.full((B, Tm, Tt), 1.0 / Tt),
    }
    params = model.init(jax.random.PRNGKey(0), batch["tokens"],
                        batch["in_lens"], batch["mel"], batch["mel_lens"],
                        batch["pitch"], batch["energy"], batch["prior"])
    return model, params, batch


def test_ffn_params_are_sharded():
    mesh = make_mesh(n_data=4, n_model=2)
    _, params, _ = _fp_setup()
    with mesh:
        sharded = shard_params(params, mesh, FASTPITCH_TP_RULES)
    summary = sharding_summary(sharded, mesh)
    # both FFT stacks: conv1 kernel+bias column-parallel, conv2 row-parallel
    assert any("encoder/ff_layers_0/Conv1d_0" in k for k in summary), summary
    assert any("decoder/ff_layers_0/Conv1d_1" in k for k in summary), summary
    col = [v for k, v in summary.items() if "Conv1d_0/Conv_0/kernel" in k]
    assert all("'model'" in v for v in col)


def test_undividable_dims_fall_back_to_replicated():
    mesh = make_mesh(n_data=4, n_model=2)
    _, params, _ = _fp_setup(ffn=66)  # 66 % 2 == 0 → shards; 33 wouldn't
    with mesh:
        sharded = shard_params(params, mesh, FASTPITCH_TP_RULES)
    assert sharding_summary(sharded, mesh)
    # now a filter size that does NOT divide the model axis
    _, params2, _ = _fp_setup(ffn=33)
    with mesh:
        sharded2 = shard_params(params2, mesh, FASTPITCH_TP_RULES)
    assert not any(
        "Conv1d_0/Conv_0/kernel" in k
        for k in sharding_summary(sharded2, mesh)
    )


def test_tp_train_step_matches_replicated():
    """Full stage-4 step under dp4 x tp2 == the dp-only step (same seed)."""
    from xva_trainer_tpu.train.fastpitch_trainer import TrainState, make_stage_step
    from xva_trainer_tpu.train.optim import make_fastpitch_optimizer

    model, params, batch = _fp_setup()
    tx = make_fastpitch_optimizer(0.1, 1e-6, 10)
    step = make_stage_step(model, 4, tx, use_amp=False)

    def run(mesh, place):
        with mesh:
            # fresh host copy per run: the jitted step donates its state, and
            # device_put may alias the source buffers
            fresh = jax.tree_util.tree_map(lambda x: np.asarray(x), params)
            p = place(fresh, mesh)
            state = TrainState(params=p, opt_state=tx.init(p),
                               step=jnp.zeros((), jnp.int32))
            dev = shard_batch(mesh, batch)
            state, meta = step(state, dev, jnp.asarray(0.0),
                               jax.random.PRNGKey(1))
            state, meta = step(state, dev, jnp.asarray(0.0),
                               jax.random.PRNGKey(2))
            jax.block_until_ready(state.params)
            return float(meta["loss"]), state

    loss_tp, state_tp = run(
        make_mesh(n_data=4, n_model=2),
        lambda p, m: shard_params(p, m, FASTPITCH_TP_RULES),
    )
    loss_dp, state_dp = run(
        make_mesh(n_data=8, n_model=1),
        lambda p, m: jax.device_put(
            p, jax.sharding.NamedSharding(m, jax.sharding.PartitionSpec())
        ),
    )
    assert np.isfinite(loss_tp) and np.isfinite(loss_dp)
    assert abs(loss_tp - loss_dp) < 1e-3 * max(1.0, abs(loss_dp))
    # updated FFN params still live on the model axis after the optimizer step
    assert sharding_summary(state_tp.params, None)


def test_xvapitch_rules_match_ffn():
    from xva_trainer_tpu.models.xvapitch.layers import RelativePositionTransformer

    m = RelativePositionTransformer(
        in_channels=32, hidden_channels=32, out_channels=32,
        hidden_channels_ffn=64, num_heads=2, num_layers=2,
    )
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 32)), jnp.ones((1, 8, 1)))
    specs = tp_pspecs(p, XVAPITCH_TP_RULES)
    flat = {
        "/".join(str(k.key) for k in path): s
        for path, s in jax.tree_util.tree_flatten_with_path(specs)[0]
    }
    sharded = [k for k, s in flat.items() if s != jax.sharding.PartitionSpec()]
    assert any("FeedForwardNetwork_0/Conv_0/kernel" in k for k in sharded)
    assert any("FeedForwardNetwork_0/Conv_1/kernel" in k for k in sharded)
