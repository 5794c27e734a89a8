"""xVAPitch (VITS) model smoke tests: train_step, losses, infer, VC (tiny dims)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from xva_trainer_tpu.models.xvapitch import (
    VitsDiscriminator,
    XVAPitch,
    XVAPitchConfig,
    losses as v_losses,
)
from xva_trainer_tpu.models.xvapitch.model import rand_segments, segment

TINY = XVAPitchConfig(
    n_vocab=60,
    big=False,              # latent 192 → use even smaller below
    upsample_initial_channel=32,
    resblock_kernel_sizes=(3,),
    spec_segment_size=8,
    mltts_rc=True,          # exercise the reversal classifier (off by default
                            # for app/base-checkpoint parity)
    text_layers=2, posterior_layers=3, flow_wn_layers=2, num_flows=2,
    sdp_flows=2, pitch_layers=1,
)

B, T_TEXT, T_SPEC = 2, 9, 24
HOP = 256


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(0)
    tokens = np.zeros((B, T_TEXT), np.int32)
    tlens = np.array([9, 6], np.int32)
    for b, l in enumerate(tlens):
        tokens[b, :l] = rng.integers(1, 60, l)
    slens = np.array([24, 16], np.int32)
    linear = np.zeros((B, T_SPEC, 513), np.float32)
    pitch = np.zeros((B, 1, T_SPEC), np.float32)
    wav = np.zeros((B, T_SPEC * HOP, 1), np.float32)
    for b, l in enumerate(slens):
        linear[b, :l] = np.abs(rng.standard_normal((l, 513))) * 0.1
        pitch[b, 0, :l] = rng.standard_normal(l)
        wav[b, : l * HOP, 0] = rng.standard_normal(l * HOP) * 0.1
    return dict(
        tokens=jnp.asarray(tokens), tlens=jnp.asarray(tlens),
        linear=jnp.asarray(linear), slens=jnp.asarray(slens),
        pitch=jnp.asarray(pitch),
        energy=jnp.zeros((B, T_SPEC)),
        wav=jnp.asarray(wav),
        dvec=jnp.asarray(rng.standard_normal((B, 512)).astype(np.float32) * 0.1),
        lang=jnp.asarray(np.array([0, 5], np.int32)),
    )


@pytest.fixture(scope="module")
def model_and_params(batch):
    model = XVAPitch(TINY)
    rngs = {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1),
            "segments": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)}
    params = model.init(
        rngs, batch["tokens"], batch["tlens"], batch["linear"], batch["slens"],
        batch["pitch"], batch["energy"], batch["wav"], batch["dvec"], batch["lang"],
    )
    return model, params


def test_rand_segments():
    x = jnp.arange(2 * 20 * 3, dtype=jnp.float32).reshape(2, 20, 3)
    lens = jnp.asarray([20, 10])
    seg, ids = rand_segments(x, lens, 8, jax.random.PRNGKey(0))
    assert seg.shape == (2, 8, 3)
    ids_np = np.asarray(ids)
    assert (ids_np >= 0).all() and ids_np[1] <= 2  # 10 - 8
    np.testing.assert_allclose(
        np.asarray(seg[0]), np.asarray(x[0, ids_np[0] : ids_np[0] + 8])
    )


def test_train_step_outputs(model_and_params, batch):
    model, params = model_and_params
    rngs = {"noise": jax.random.PRNGKey(4), "segments": jax.random.PRNGKey(5),
            "dropout": jax.random.PRNGKey(6)}
    out = model.apply(
        params, batch["tokens"], batch["tlens"], batch["linear"], batch["slens"],
        batch["pitch"], batch["energy"], batch["wav"], batch["dvec"], batch["lang"],
        method=XVAPitch.train_step, rngs=rngs,
    )
    assert out["model_outputs"].shape == (B, TINY.spec_segment_size * HOP, 1)
    assert out["waveform_seg"].shape == out["model_outputs"].shape
    assert out["z_p"].shape == (B, T_SPEC, 192)
    assert out["m_p"].shape == (B, T_SPEC, 192)  # expanded to frame rate
    assert out["pitch_pred"].shape == (B, 1, T_TEXT)
    assert out["lang_prediction"].shape == (B, T_SPEC, 31)
    # durations sum to spec length per item
    durs = np.asarray(out["attn_durations"])
    np.testing.assert_array_equal(durs.sum(1), np.asarray(batch["slens"]))


def test_generator_and_disc_losses(model_and_params, batch):
    model, params = model_and_params
    rngs = {"noise": jax.random.PRNGKey(4), "segments": jax.random.PRNGKey(5),
            "dropout": jax.random.PRNGKey(6)}
    out = model.apply(
        params, batch["tokens"], batch["tlens"], batch["linear"], batch["slens"],
        batch["pitch"], batch["energy"], batch["wav"], batch["dvec"], batch["lang"],
        method=XVAPitch.train_step, rngs=rngs,
    )
    disc = VitsDiscriminator()
    dparams = disc.init(jax.random.PRNGKey(7), out["model_outputs"],
                        out["waveform_seg"])
    s_fake, f_fake, s_real, f_real = disc.apply(
        dparams, out["model_outputs"], out["waveform_seg"]
    )
    assert len(s_fake) == 6  # 1 scale + 5 periods
    loss, meta = v_losses.generator_loss(
        out, s_fake, f_fake, f_real,
        language_ids=batch["lang"], spec_lengths=batch["slens"],
    )
    assert np.isfinite(float(loss))
    for k in ("loss_mel", "loss_kl", "loss_duration", "loss_pitch", "loss_feat"):
        assert np.isfinite(float(meta[k])), k
    assert meta["per_sample_mel"].shape == (B,)
    dl, _ = v_losses.discriminator_loss(s_real, s_fake)
    assert np.isfinite(float(dl))


def test_infer_and_vc(model_and_params, batch):
    model, params = model_and_params
    rngs = {"noise": jax.random.PRNGKey(8), "dropout": jax.random.PRNGKey(9)}
    out = model.apply(
        params, batch["tokens"], batch["dvec"], batch["lang"], batch["tlens"],
        method=XVAPitch.infer, max_frames=64, rngs=rngs,
    )
    assert out["wav"].shape == (B, 64 * HOP)
    assert np.isfinite(np.asarray(out["wav"])).all()
    assert (np.asarray(out["y_lengths"]) >= 1).all()

    vc = model.apply(
        params, batch["linear"], batch["slens"], batch["dvec"], batch["dvec"][::-1],
        method=XVAPitch.voice_conversion, rngs=rngs,
    )
    assert vc.shape == (B, T_SPEC * HOP)
    assert np.isfinite(np.asarray(vc)).all()
