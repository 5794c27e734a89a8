"""Mixed-precision (bf16 compute / fp32 masters) tests — train/amp.py.

The reference trains under torch.cuda.amp by default (use_amp defaults true,
reference python/xvapitch/xva_train.py:551); the TPU analogue is bf16 compute
with fp32 master params and fp32 losses. These tests check:
- the cast helpers preserve structure / integer leaves / exclusions;
- each trainer's amp step runs, produces finite fp32 losses and fp32 params,
  and stays close to the fp32 step's loss on the same batch;
- MAS returns identical paths for bf16 and fp32 inputs (ops/mas.py always
  accumulates fp32).
"""

import pytest

pytestmark = pytest.mark.slow  # numerics-parity tier: run via `make test-all`
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from xva_trainer_tpu.train import amp


def test_cast_floats_leaves_ints_alone():
    tree = {"a": jnp.ones((2, 2), jnp.float32),
            "b": jnp.ones((3,), jnp.int32),
            "c": [jnp.zeros((1,), jnp.bool_), 4]}
    out = amp.cast_floats(tree, jnp.bfloat16)
    assert out["a"].dtype == jnp.bfloat16
    assert out["b"].dtype == jnp.int32
    assert out["c"][0].dtype == jnp.bool_
    assert out["c"][1] == 4


def test_cast_params_exclude_keeps_module_fp32():
    variables = {"params": {
        "keep_me": {"kernel": jnp.ones((2, 2), jnp.float32)},
        "cast_me": {"kernel": jnp.ones((2, 2), jnp.float32)},
    }}
    out = amp.cast_params(variables, jnp.bfloat16, exclude=("keep_me",))
    assert out["params"]["keep_me"]["kernel"].dtype == jnp.float32
    assert out["params"]["cast_me"]["kernel"].dtype == jnp.bfloat16


def test_amp_apply_outputs_fp32():
    import flax.linen as nn

    class M(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Dense(8)(x)

    m = M()
    x = jnp.ones((2, 4), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x)
    # compute really runs bf16: cast params + input → flax promotes to bf16
    y_raw = m.apply(amp.cast_params(v, jnp.bfloat16), x.astype(jnp.bfloat16))
    assert y_raw.dtype == jnp.bfloat16
    # ...and amp_apply returns the fp32-cast result of that bf16 compute
    y = amp.amp_apply(m.apply, v, x)
    assert y.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(y, np.float32),
                               np.asarray(y_raw, np.float32))


def test_mas_bf16_matches_fp32():
    from xva_trainer_tpu.ops.mas import maximum_path

    rng = np.random.default_rng(0)
    value = rng.standard_normal((2, 12, 40)).astype(np.float32)
    mask = np.ones((2, 12, 40), np.float32)
    mask[0, 9:, :] = 0
    mask[0, :, 30:] = 0
    p32 = maximum_path(jnp.asarray(value), jnp.asarray(mask))
    p16 = maximum_path(jnp.asarray(value, jnp.bfloat16),
                       jnp.asarray(mask, jnp.bfloat16))
    assert p16.dtype == jnp.bfloat16
    # same value input → identical path (DP accumulates fp32 internally)
    np.testing.assert_array_equal(np.asarray(p32), np.asarray(p16, np.float32))


def _tiny_v3():
    from xva_trainer_tpu.models.xvapitch import (
        VitsDiscriminator, XVAPitch, XVAPitchConfig,
    )

    cfg = XVAPitchConfig(
        n_vocab=524, big=False, upsample_initial_channel=32,
        resblock_kernel_sizes=(3,), spec_segment_size=8, mltts_rc=False,
        text_layers=2, posterior_layers=3, flow_wn_layers=2, num_flows=2,
        sdp_flows=2, pitch_layers=1,
    )
    return XVAPitch(cfg), VitsDiscriminator(periods=(2, 3)), cfg


def _v3_batch(cfg, B=2, T_TEXT=12, T_SPEC=24, seed=0):
    rng = np.random.default_rng(seed)
    tokens = np.zeros((B, T_TEXT), np.int32)
    tlens = np.array([T_TEXT, T_TEXT - 3], np.int32)
    for b, l in enumerate(tlens):
        tokens[b, :l] = rng.integers(1, 100, l)
    slens = np.array([T_SPEC, T_SPEC - 5], np.int32)
    return {
        "tokens": jnp.asarray(tokens),
        "tlens": jnp.asarray(tlens),
        "linear": jnp.asarray(
            np.abs(rng.standard_normal((B, T_SPEC, 513))).astype(np.float32)),
        "slens": jnp.asarray(slens),
        "pitch": jnp.asarray(rng.standard_normal((B, 1, T_SPEC)).astype(np.float32)),
        "energy": jnp.asarray(np.zeros((B, T_SPEC), np.float32)),
        "wav": jnp.asarray(
            (rng.standard_normal((B, T_SPEC * 256, 1)) * 0.1).astype(np.float32)),
        "dvec": jnp.asarray((rng.standard_normal((B, 512)) * 0.1).astype(np.float32)),
        "lang": jnp.asarray(np.zeros((B,), np.int32)),
    }


@pytest.mark.parametrize("use_amp", [False, True])
def test_v3_step_amp_runs_and_matches(use_amp):
    from xva_trainer_tpu.train.xvapitch_trainer import V3State, make_v3_step

    model, disc, cfg = _tiny_v3()
    batch = _v3_batch(cfg)
    rngs = {k: jax.random.PRNGKey(i) for i, k in enumerate(
        ["params", "noise", "segments", "dropout"])}
    g_params = model.init(
        rngs, batch["tokens"], batch["tlens"], batch["linear"], batch["slens"],
        batch["pitch"], batch["energy"], batch["wav"], batch["dvec"],
        batch["lang"],
    )
    seg = jnp.zeros((2, cfg.spec_segment_size * cfg.hop_length, 1))
    d_params = disc.init(jax.random.PRNGKey(9), seg, seg)
    g_tx = optax.adamw(1e-4, b1=0.8, b2=0.99, weight_decay=0.01)
    d_tx = optax.adamw(1e-4, b1=0.8, b2=0.99, weight_decay=0.01)
    state = V3State(g_params=g_params, d_params=d_params,
                    g_opt=g_tx.init(g_params), d_opt=d_tx.init(d_params),
                    step=jnp.zeros((), jnp.int32))
    step = make_v3_step(model, disc, g_tx, d_tx, freeze_post_dec=False,
                        use_amp=use_amp)
    new_state, meta = step(state, batch, jax.random.PRNGKey(7))
    loss = float(meta["loss"])
    assert np.isfinite(loss)
    assert meta["loss"].dtype == jnp.float32
    # masters stay fp32 under amp
    leaves = jax.tree_util.tree_leaves(new_state.g_params)
    assert all(l.dtype == jnp.float32 for l in leaves
               if jnp.issubdtype(l.dtype, jnp.floating))
    if use_amp:
        test_v3_step_amp_runs_and_matches.amp_loss = loss
    else:
        test_v3_step_amp_runs_and_matches.fp32_loss = loss


def test_v3_amp_loss_close_to_fp32():
    fp32 = getattr(test_v3_step_amp_runs_and_matches, "fp32_loss", None)
    bf16 = getattr(test_v3_step_amp_runs_and_matches, "amp_loss", None)
    if fp32 is None or bf16 is None:
        pytest.skip("parametrized steps did not run")
    # random-init GAN losses are large; bf16 rounding should stay within a few %
    assert abs(bf16 - fp32) / max(abs(fp32), 1e-6) < 0.05


@pytest.mark.parametrize("use_amp", [False, True])
def test_hifigan_step_amp(use_amp):
    from xva_trainer_tpu.models.hifigan import (
        Generator, HifiganConfig, HifiganDiscriminator,
    )
    from xva_trainer_tpu.ops.stft import MelConfig
    from xva_trainer_tpu.train.hifigan_trainer import (
        GanState, SEGMENT_SIZE, make_gan_step,
    )

    gen = Generator(HifiganConfig(upsample_initial_channel=16))
    disc = HifiganDiscriminator(periods=(2, 3))
    rng = np.random.default_rng(0)
    B = 2
    seg = jnp.asarray(
        np.clip(rng.standard_normal((B, SEGMENT_SIZE, 1)) * 0.1, -1, 1)
        .astype(np.float32))
    mel = jnp.zeros((B, SEGMENT_SIZE // 256, 80), jnp.float32)
    g_params = gen.init(jax.random.PRNGKey(0), mel)
    d_vars = disc.init(jax.random.PRNGKey(1), seg, seg)
    g_tx = optax.adamw(2e-4, b1=0.8, b2=0.99)
    d_tx = optax.adamw(2e-4, b1=0.8, b2=0.99)
    state = GanState(
        g_params=g_params, d_params={"params": d_vars["params"]},
        d_stats=d_vars.get("batch_stats", {}),
        g_opt=g_tx.init(g_params), d_opt=d_tx.init({"params": d_vars["params"]}),
        step=jnp.zeros((), jnp.int32))
    step = make_gan_step(gen, disc, g_tx, d_tx, MelConfig(), use_amp=use_amp)
    new_state, meta = step(state, seg)
    assert np.isfinite(float(meta["g_loss"]))
    assert np.isfinite(float(meta["d_loss"]))
    leaves = jax.tree_util.tree_leaves(
        (new_state.g_params, new_state.d_params, new_state.d_stats))
    assert all(l.dtype == jnp.float32 for l in leaves
               if jnp.issubdtype(l.dtype, jnp.floating))


@pytest.mark.parametrize("use_amp", [False, True])
def test_fastpitch_stage4_step_amp(use_amp):
    from xva_trainer_tpu.models.fastpitch import FastPitch, FastPitchConfig
    from xva_trainer_tpu.train.fastpitch_trainer import (
        TrainState, make_stage_step,
    )

    cfg = FastPitchConfig(
        n_symbols=40, symbols_embedding_dim=64, in_fft_n_layers=2,
        out_fft_n_layers=2, in_fft_d_head=32, out_fft_d_head=32,
        in_fft_filter_size=128, out_fft_filter_size=128,
        predictor_filter_size=32,
    )
    model = FastPitch(cfg)
    rng = np.random.default_rng(0)
    B, T_TEXT, T_MEL = 2, 10, 40
    tokens = np.zeros((B, T_TEXT), np.int32)
    in_lens = np.array([T_TEXT, T_TEXT - 2], np.int32)
    for b, l in enumerate(in_lens):
        tokens[b, :l] = rng.integers(1, 40, l)
    mel_lens = np.array([T_MEL, T_MEL - 6], np.int32)
    mel = np.zeros((B, T_MEL, 80), np.float32)
    pitch = np.zeros((B, 1, T_MEL), np.float32)
    energy = np.zeros((B, T_MEL), np.float32)
    for b, l in enumerate(mel_lens):
        mel[b, :l] = rng.standard_normal((l, 80))
        pitch[b, 0, :l] = rng.standard_normal(l)
        energy[b, :l] = np.abs(rng.standard_normal(l))
    batch = {
        "tokens": jnp.asarray(tokens),
        "in_lens": jnp.asarray(in_lens),
        "mel": jnp.asarray(mel),
        "mel_lens": jnp.asarray(mel_lens),
        "pitch": jnp.asarray(pitch),
        "energy": jnp.asarray(energy),
        "prior": jnp.asarray(np.full((B, T_MEL, T_TEXT), 1.0 / T_TEXT, np.float32)),
    }
    params = model.init(
        jax.random.PRNGKey(0), batch["tokens"], batch["in_lens"], batch["mel"],
        batch["mel_lens"], batch["pitch"], batch["energy"], batch["prior"],
    )
    tx = optax.adamw(1e-4)
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    step = make_stage_step(model, 4, tx, use_amp=use_amp)
    new_state, meta = step(state, batch, jnp.asarray(0.5), jax.random.PRNGKey(3))
    assert np.isfinite(float(meta["loss"]))
    leaves = jax.tree_util.tree_leaves(new_state.params)
    assert all(l.dtype == jnp.float32 for l in leaves
               if jnp.issubdtype(l.dtype, jnp.floating))


def test_lion_optimizer_option():
    """optimizer='lion' mirrors the reference --lion flag (lr/5, wd*5,
    training_util.py:45-51) and produces finite updates."""
    import jax.numpy as jnp
    import optax

    from xva_trainer_tpu.train.optim import make_gan_optimizer

    tx = make_gan_optimizer(2e-4, kind="lion", grad_accum=2)
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros(4)}
    state = tx.init(params)
    grads = {"w": jnp.full((4, 4), 0.1), "b": jnp.full(4, -0.2)}
    for _ in range(2):
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    assert all(bool(jnp.isfinite(v).all()) for v in params.values())
    assert float(params["w"][0, 0]) != 1.0  # an update actually applied
