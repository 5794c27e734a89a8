"""FastPitch model smoke + behavior tests (CPU, tiny dims)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from xva_trainer_tpu.models.fastpitch import (
    FastPitch,
    FastPitchConfig,
    average_pitch,
    regulate_len,
    loss as fp_loss,
)

CFG = FastPitchConfig(
    n_symbols=40,
    symbols_embedding_dim=64,
    in_fft_n_layers=2,
    out_fft_n_layers=2,
    in_fft_d_head=32,
    out_fft_d_head=32,
    in_fft_filter_size=128,
    out_fft_filter_size=128,
    predictor_filter_size=32,
)

B, T_TEXT, T_MEL = 2, 11, 37


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    tokens = np.zeros((B, T_TEXT), np.int32)
    in_lens = np.array([11, 7], np.int32)
    for b, l in enumerate(in_lens):
        tokens[b, :l] = rng.integers(1, 40, l)
    mel_lens = np.array([37, 25], np.int32)
    mel = np.zeros((B, T_MEL, 80), np.float32)
    for b, l in enumerate(mel_lens):
        mel[b, :l] = rng.standard_normal((l, 80))
    pitch = np.zeros((B, 1, T_MEL), np.float32)
    energy = np.zeros((B, T_MEL), np.float32)
    for b, l in enumerate(mel_lens):
        pitch[b, 0, :l] = rng.standard_normal(l)
        energy[b, :l] = np.abs(rng.standard_normal(l))
    prior = np.ones((B, T_MEL, T_TEXT), np.float32) / T_TEXT
    return dict(
        tokens=jnp.asarray(tokens),
        in_lens=jnp.asarray(in_lens),
        mel=jnp.asarray(mel),
        mel_lens=jnp.asarray(mel_lens),
        pitch=jnp.asarray(pitch),
        energy=jnp.asarray(energy),
        prior=jnp.asarray(prior),
    )


@pytest.fixture(scope="module")
def model_and_params(batch):
    model = FastPitch(CFG)
    params = model.init(
        jax.random.PRNGKey(0),
        batch["tokens"], batch["in_lens"], batch["mel"], batch["mel_lens"],
        batch["pitch"], batch["energy"], batch["prior"],
    )
    return model, params


def test_regulate_len():
    durs = jnp.asarray([[2, 0, 3], [1, 1, 1]])
    enc = jnp.arange(2 * 3 * 4, dtype=jnp.float32).reshape(2, 3, 4)
    out, lens = regulate_len(durs, enc, mel_max_len=6)
    assert out.shape == (2, 6, 4)
    np.testing.assert_array_equal(np.asarray(lens), [5, 3])
    # first item: token0 ×2, token2 ×3, then zero pad
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(enc[0, 0]))
    np.testing.assert_allclose(np.asarray(out[0, 1]), np.asarray(enc[0, 0]))
    np.testing.assert_allclose(np.asarray(out[0, 2]), np.asarray(enc[0, 2]))
    np.testing.assert_allclose(np.asarray(out[0, 5]), 0)


def test_average_pitch():
    pitch = jnp.asarray([[[1.0, 2.0, 0.0, 4.0, 6.0, 0.0]]])  # (1,1,6)
    durs = jnp.asarray([[2, 2, 2]])
    avg = average_pitch(pitch, durs)
    # token0: mean(1,2)=1.5; token1: nonzero {4} → 4 (0 excluded); token2: mean(6)=6
    np.testing.assert_allclose(np.asarray(avg[0, 0]), [1.5, 4.0, 6.0])


def test_stage1_forward_and_loss(model_and_params, batch):
    model, params = model_and_params
    out = model.apply(
        params, batch["tokens"], batch["in_lens"], batch["mel"],
        batch["mel_lens"], batch["prior"], method=FastPitch.stage1,
    )
    assert out["attn_soft"].shape == (B, T_MEL, T_TEXT)
    assert out["durations"].shape == (B, T_TEXT)
    # durations sum to mel length per item
    np.testing.assert_array_equal(
        np.asarray(out["durations"].sum(1)), np.asarray(batch["mel_lens"])
    )
    # padded text positions get zero duration
    assert float(out["durations"][1, 7:].sum()) == 0
    loss, meta = fp_loss.stage1_loss(
        out, batch["in_lens"], batch["mel_lens"], jnp.asarray(0.5)
    )
    assert np.isfinite(float(loss))
    assert float(meta["attn_loss"]) > 0


def test_stage2_forward_and_loss(model_and_params, batch):
    model, params = model_and_params
    out = model.apply(
        params, batch["tokens"], batch["in_lens"], batch["mel"],
        batch["mel_lens"], batch["prior"], method=FastPitch.stage2,
    )
    assert out["log_dur_pred"].shape == (B, T_TEXT)
    loss, meta = fp_loss.stage2_loss(out, batch["in_lens"])
    assert np.isfinite(float(loss))


def test_full_forward_and_losses(model_and_params, batch):
    model, params = model_and_params
    out = model.apply(
        params, batch["tokens"], batch["in_lens"], batch["mel"],
        batch["mel_lens"], batch["pitch"], batch["energy"], batch["prior"],
    )
    assert out["mel_out"].shape == (B, T_MEL, 80)
    l3, _ = fp_loss.stage3_loss(out, batch["mel"], batch["in_lens"])
    l4, _ = fp_loss.stage4_loss(out, batch["mel"])
    assert np.isfinite(float(l3)) and np.isfinite(float(l4))


def test_infer(model_and_params, batch):
    model, params = model_and_params
    out = model.apply(
        params, batch["tokens"][:, :], method=FastPitch.infer,
        mel_max_len=64,
    )
    assert out["mel_out"].shape == (B, 80, 64)
    assert np.isfinite(np.asarray(out["mel_out"])).all()


def test_grads_flow(model_and_params, batch):
    model, params = model_and_params

    def loss_fn(p):
        out = model.apply(
            p, batch["tokens"], batch["in_lens"], batch["mel"],
            batch["mel_lens"], batch["pitch"], batch["energy"], batch["prior"],
            deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)},
        )
        l, _ = fp_loss.stage4_loss(out, batch["mel"])
        return l

    g = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(x)).all() for x in leaves)
    # decoder gets gradient
    gnorm = sum(float((x**2).sum()) for x in leaves)
    assert gnorm > 0
