"""Trainers LEARN — convergence + gradient-flow assertions (VERDICT r4 #6).

Every other trainer test asserts finiteness or step-vs-step parity; none
would catch a regression that silently zeroes a gradient tree (e.g. a bad
freeze mask). These tests overfit a fixed batch with each real jitted step
and assert (a) the smoothed loss strictly decreases, (b) exactly the
modules each stage declares trainable actually move, and frozen modules
stay bit-identical (reference freeze semantics
python/fastpitch1_1/xva_train.py:589-672), (c) a trained tiny xVAPitch's
preview is mel-closer to the training voice than the random-init model
(reference loss-delta machinery python/xvapitch/xva_train.py:806-842).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xva_trainer_tpu.models.fastpitch import FastPitch, FastPitchConfig

TINY_FP = FastPitchConfig(
    symbols_embedding_dim=64, in_fft_n_layers=1, out_fft_n_layers=1,
    in_fft_d_head=32, out_fft_d_head=32, in_fft_filter_size=64,
    out_fft_filter_size=64, predictor_filter_size=32,
)


def _fp_batch(B=4, T_TEXT=16, T_MEL=64, seed=0):
    rng = np.random.default_rng(seed)
    tokens = np.zeros((B, T_TEXT), np.int32)
    for b in range(B):
        tokens[b] = rng.integers(1, 148, T_TEXT)
    # a learnable mel target: smooth low-rank structure, not white noise
    t = np.linspace(0, 1, T_MEL)[None, :, None]
    m = np.linspace(0, 1, 80)[None, None, :]
    mel = (np.sin(6 * t + 4 * m + rng.uniform(0, 2, (B, 1, 1)))
           ).astype(np.float32)
    durs = np.full((B, T_TEXT), T_MEL / T_TEXT, np.float32)
    return {
        "tokens": jnp.asarray(tokens),
        "in_lens": jnp.full((B,), T_TEXT, jnp.int32),
        "mel": jnp.asarray(mel),
        "mel_lens": jnp.full((B,), T_MEL, jnp.int32),
        "pitch": jnp.asarray(rng.standard_normal((B, 1, T_MEL)).astype(np.float32) * 0.3),
        "energy": jnp.asarray(np.abs(rng.standard_normal((B, T_MEL))).astype(np.float32)),
        "prior": jnp.full((B, T_MEL, T_TEXT), 1.0 / T_TEXT, jnp.float32),
        "durs": jnp.asarray(durs),
    }


def _fp_state_and_step(stage: int, use_gt_durs: bool, lr: float = 0.05):
    from xva_trainer_tpu.train.fastpitch_trainer import (
        TrainState,
        make_stage_step,
    )
    from xva_trainer_tpu.train.optim import (
        fastpitch_stage_mask,
        make_fastpitch_optimizer,
    )

    model = FastPitch(TINY_FP)
    batch = _fp_batch()
    params = model.init(jax.random.PRNGKey(0), batch["tokens"],
                        batch["in_lens"], batch["mel"], batch["mel_lens"],
                        batch["pitch"], batch["energy"], batch["prior"])
    tx = make_fastpitch_optimizer(lr, 0.0, warmup_steps=5,
                                  freeze_mask=fastpitch_stage_mask(stage))
    state = TrainState(params=params, opt_state=tx.init(params),
                       step=jnp.zeros((), jnp.int32))
    step = make_stage_step(model, stage, tx, use_gt_durs=use_gt_durs)
    return state, step, batch


def _run_steps(state, step, batch, n, kl=0.0):
    losses = []
    for i in range(n):
        state, meta = step(state, batch, jnp.asarray(kl),
                           jax.random.PRNGKey(i))
        losses.append(float(meta["loss"]))
    return state, losses


def _leaf_deltas(before, after):
    """{dotted/path: max |delta|} over param leaves."""
    flat_b = jax.tree_util.tree_flatten_with_path(before)[0]
    flat_a = jax.tree_util.tree_flatten_with_path(after)[0]
    out = {}
    for (path, b), (_, a) in zip(flat_b, flat_a):
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        out[key] = float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
    return out


def _assert_freeze_semantics(stage, deltas):
    from xva_trainer_tpu.train.optim import _STAGE_FROZEN_MODULES

    frozen = _STAGE_FROZEN_MODULES[stage]
    moved_frozen = [k for k, d in deltas.items()
                    if d > 0 and any(f in k.split("/") for f in frozen)]
    assert not moved_frozen, (
        f"stage {stage}: frozen modules moved: {moved_frozen[:5]}")
    trainable = {k: d for k, d in deltas.items()
                 if not any(f in k.split("/") for f in frozen)}
    assert any(d > 0 for d in trainable.values()), (
        f"stage {stage}: NO trainable param moved — a freeze-mask bug "
        f"zeroed the gradient tree")


def test_fastpitch_stage4_converges_default_tier():
    """Default-tier canary: 30 stage-4 steps on a fixed batch must cut the
    smoothed loss. Catches any regression that stops gradient flow."""
    state, step, batch = _fp_state_and_step(4, use_gt_durs=True)
    before = jax.device_get(state.params)
    state, losses = _run_steps(state, step, batch, 30)
    head, tail = np.mean(losses[:5]), np.mean(losses[-5:])
    assert np.isfinite(losses).all()
    assert tail < head * 0.9, f"loss did not decrease: {head} -> {tail}"
    _assert_freeze_semantics(4, _leaf_deltas(before, state.params))


@pytest.mark.slow
@pytest.mark.parametrize("stage", [1, 2, 3])
def test_fastpitch_every_stage_trains(stage):
    """Stages 1-3: loss decreases AND exactly the stage's trainable modules
    move (frozen stay bit-identical) — the direct freeze-mask regression
    test (VERDICT r4 #6 done-criterion)."""
    use_gt = stage >= 2
    state, step, batch = _fp_state_and_step(stage, use_gt_durs=use_gt)
    before = jax.device_get(state.params)
    kl = 1.0 if stage == 1 else 0.0
    state, losses = _run_steps(state, step, batch, 40, kl=kl)
    head, tail = np.mean(losses[:5]), np.mean(losses[-5:])
    assert np.isfinite(losses).all()
    assert tail < head, f"stage {stage} loss did not decrease: {head} -> {tail}"
    _assert_freeze_semantics(stage, _leaf_deltas(before, state.params))


@pytest.mark.slow
def test_hifigan_gan_converges():
    """Tiny HiFi-GAN G+D adversarial steps on a tonal target: the mel L1
    must fall — a zeroed generator gradient tree fails this."""
    import optax

    from xva_trainer_tpu.models.hifigan import (
        Generator,
        HifiganConfig,
        HifiganDiscriminator,
    )
    from xva_trainer_tpu.ops.stft import MelConfig
    from xva_trainer_tpu.train.hifigan_trainer import (
        GanState,
        make_gan_step,
    )

    gen = Generator(HifiganConfig(upsample_initial_channel=32,
                                  resblock_kernel_sizes=(3,),
                                  resblock_dilation_sizes=((1, 3),)))
    disc = HifiganDiscriminator()
    B = 2
    # the step is shape-agnostic: a half-size segment keeps the identical
    # program structure (MPD periods, MSD pools, both loss mels) at CPU-
    # viable cost — production SEGMENT_SIZE through full MPD/MSD backward
    # was >8 min on the 1-CPU test host
    seg_size = 4096
    t = np.arange(seg_size) / 22050.0
    seg = np.stack([
        0.4 * np.sin(2 * np.pi * 220.0 * t),
        0.4 * np.sin(2 * np.pi * 330.0 * t),
    ]).astype(np.float32)[..., None]
    seg = jnp.asarray(seg)
    mel1 = jnp.zeros((1, seg_size // 256, 80), jnp.float32)
    g_params = gen.init(jax.random.PRNGKey(0), mel1)
    d_vars = disc.init(jax.random.PRNGKey(1), seg[:1], seg[:1])
    g_tx = optax.adamw(2e-3, b1=0.8, b2=0.99)
    d_tx = optax.adamw(2e-3, b1=0.8, b2=0.99)
    state = GanState(
        g_params=g_params, d_params={"params": d_vars["params"]},
        d_stats=d_vars.get("batch_stats", {}),
        g_opt=g_tx.init(g_params),
        d_opt=d_tx.init({"params": d_vars["params"]}),
        step=jnp.zeros((), jnp.int32),
    )
    step = make_gan_step(gen, disc, g_tx, d_tx, MelConfig())
    mels = []
    for _ in range(40):
        state, meta = step(state, seg)
        mels.append(float(meta["mel_l1"]))
    head, tail = np.mean(mels[:10]), np.mean(mels[-10:])
    assert np.isfinite(mels).all()
    assert tail < head * 0.9, f"mel L1 did not decrease: {head} -> {tail}"


TINY_V3_KW = dict(
    n_vocab=524, big=False, upsample_initial_channel=32,
    resblock_kernel_sizes=(3,), spec_segment_size=8, mltts_rc=False,
    text_layers=2, posterior_layers=3, flow_wn_layers=2, num_flows=2,
    sdp_flows=2, pitch_layers=1,
)


def _v3_batch(B=2, T_TEXT=12, T_SPEC=48, f0=220.0, seed=0):
    rng = np.random.default_rng(seed)
    tokens = np.zeros((B, T_TEXT), np.int32)
    for b in range(B):
        tokens[b] = rng.integers(1, 524, T_TEXT)
    t = np.arange(T_SPEC * 256) / 22050.0
    wav = np.stack([0.4 * np.sin(2 * np.pi * (f0 + 30 * b) * t)
                    for b in range(B)]).astype(np.float32)
    return {
        "tokens": jnp.asarray(tokens),
        "tlens": jnp.full((B,), T_TEXT, jnp.int32),
        "slens": jnp.full((B,), T_SPEC, jnp.int32),
        "pitch": jnp.zeros((B, 1, T_SPEC), jnp.float32),
        "energy": jnp.zeros((B, T_SPEC), jnp.float32),
        "wav": jnp.asarray(
            np.round(np.clip(wav, -1, 1) * 32767.0).astype(np.int16))[..., None],
        "dvec": jnp.asarray(
            (rng.standard_normal((B, 512)) * 0.1).astype(np.float32)),
        "lang": jnp.zeros((B,), jnp.int32),
    }


def _v3_state_and_step(lr=2e-3, seed=0):
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

    cfg = XVAPitchConfig(**TINY_V3_KW)
    model = XVAPitch(cfg)
    disc = VitsDiscriminator()
    batch = _v3_batch()
    rngs = {k: jax.random.PRNGKey(seed + i) for i, k in enumerate(
        ["params", "noise", "segments", "dropout"])}
    lin0, wav0 = _materialize_spec(batch, hop=cfg.hop_length)
    g_params = model.init(
        rngs, batch["tokens"], batch["tlens"], lin0, batch["slens"],
        batch["pitch"], batch["energy"], wav0, batch["dvec"], batch["lang"],
    )
    seg = jnp.zeros((2, cfg.spec_segment_size * cfg.hop_length, 1))
    d_params = disc.init(jax.random.PRNGKey(9), seg, seg)
    g_tx = optax.adamw(lr, b1=0.8, b2=0.99)
    d_tx = optax.adamw(lr, b1=0.8, b2=0.99)
    state = V3State(g_params=g_params, d_params=d_params,
                    g_opt=g_tx.init(g_params), d_opt=d_tx.init(d_params),
                    step=jnp.zeros((), jnp.int32))
    step = make_v3_step(model, disc, g_tx, d_tx, freeze_post_dec=False)
    return model, cfg, state, step, batch


@pytest.mark.slow
def test_xvapitch_mel_converges():
    """Tiny xVAPitch fused G+D steps on a tonal voice: the mel component of
    the generator loss must fall."""
    _, _, state, step, batch = _v3_state_and_step()
    mels = []
    for i in range(50):
        state, meta = step(state, batch, jax.random.PRNGKey(i))
        mels.append(float(meta["loss_mel"]))
    head, tail = np.mean(mels[:10]), np.mean(mels[-10:])
    assert np.isfinite(mels).all()
    assert tail < head * 0.95, f"v3 mel loss did not decrease: {head} -> {tail}"


def _mean_mel(wav: np.ndarray) -> np.ndarray:
    from xva_trainer_tpu.ops import mel_spectrogram

    m = np.asarray(mel_spectrogram(jnp.asarray(wav)))
    return m.mean(axis=-1)  # time-averaged (n_mels,) signature


@pytest.mark.slow
def test_xvapitch_preview_mel_improves_over_random_init():
    """The trained model's preview (infer) is mel-closer to the training
    voice than the random-init model's preview (VERDICT r4 #6: the v3
    integration criterion)."""
    model, cfg, state, step, batch = _v3_state_and_step()
    tokens = batch["tokens"][:1]
    dvec = batch["dvec"][:1]
    lang = batch["lang"][:1]

    def preview(g_params):
        out = model.apply(g_params, tokens, dvec, lang,
                          method=model.infer, max_frames=64,
                          deterministic=True,
                          rngs={"noise": jax.random.PRNGKey(0)})
        wav = np.asarray(out["wav"] if isinstance(out, dict) else out)
        return wav.reshape(-1)

    target = _mean_mel(
        np.asarray(batch["wav"][0, :, 0], np.float32) / 32767.0)
    rand_sig = _mean_mel(preview(state.g_params))
    for i in range(120):
        state, _ = step(state, batch, jax.random.PRNGKey(i))
    trained_sig = _mean_mel(preview(state.g_params))
    d_rand = float(np.linalg.norm(rand_sig - target))
    d_trained = float(np.linalg.norm(trained_sig - target))
    assert d_trained < d_rand, (
        f"preview did not move toward the voice: random {d_rand:.2f} vs "
        f"trained {d_trained:.2f}")
