"""End-to-end FastPitch training smoke: synthetic dataset → 4-stage trainer →
checkpoints → xVASynth export → torch.load verification. Runs on a 2-device
CPU mesh (DP sharding path exercised for real)."""

import pytest

pytestmark = pytest.mark.slow  # full-size/e2e tier: run via `make test-all`
import os

import numpy as np
import pytest

from xva_trainer_tpu.data import FeatureCache, save_wav
from xva_trainer_tpu.data.dataset import Bucket, BucketBatcher
from xva_trainer_tpu.data.text import TextProcessor
from xva_trainer_tpu.models.fastpitch import FastPitchConfig
from xva_trainer_tpu.parallel.mesh import make_mesh
from xva_trainer_tpu.train.fastpitch_trainer import (
    FastPitchTrainConfig,
    FastPitchTrainer,
)

TINY_MODEL = FastPitchConfig(
    symbols_embedding_dim=64,
    in_fft_n_layers=1,
    out_fft_n_layers=1,
    in_fft_d_head=32,
    out_fft_d_head=32,
    in_fft_filter_size=64,
    out_fft_filter_size=64,
    predictor_filter_size=32,
)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("fpds")
    ds = tmp / "ds"
    (ds / "wavs").mkdir(parents=True)
    rng = np.random.default_rng(0)
    lines = []
    for i in range(8):
        t = np.arange(int(22050 * rng.uniform(0.7, 1.2))) / 22050
        y = (0.4 * np.sin(2 * np.pi * (150 + 30 * i) * t)).astype(np.float32)
        save_wav(str(ds / "wavs" / f"it{i}.wav"), y)
        lines.append(f"it{i}.wav|short sample {i}")
    (ds / "metadata.csv").write_text("\n".join(lines))
    tp = TextProcessor()
    cache = FeatureCache(str(ds), tp.encode, use_pallas=False)
    cache.build()
    return cache, str(tmp / "out")


def test_fastpitch_end_to_end(dataset):
    cache, out_dir = dataset
    batcher = BucketBatcher(cache, batch_size=4, buckets=[Bucket(32, 128)], seed=0)
    cfg = FastPitchTrainConfig(
        output_dir=out_dir, batch_size=4, target_bs=4, warmup_steps=2,
        base_lr=0.05,
    )
    mesh = make_mesh(n_data=2, n_model=1)
    trainer = FastPitchTrainer(cache, cfg, TINY_MODEL, mesh=mesh)
    trainer.setup(batcher, resume=False)

    # run each stage a couple of epochs by forcing progression
    for stage in (1, 2, 3, 4):
        trainer.stage = stage
        trainer._stage_objects()
        trainer.reset_opt_state()
        import jax

        losses, _ = trainer.run_epoch(batcher, jax.random.PRNGKey(stage))
        assert len(losses) == 2  # 8 items / bs 4
        assert all(np.isfinite(l) for l in losses), f"stage {stage}: {losses}"

    trainer.save_checkpoint()
    assert trainer.ckpt.latest_step() is not None

    # training.log + graphs.json channels exist
    trainer.finish_epoch(losses)
    assert os.path.exists(os.path.join(out_dir, "training.log"))
    assert os.path.exists(os.path.join(out_dir, "graphs.json"))

    # export + torch readback
    path = trainer.export("testvoice")
    assert os.path.exists(path) and os.path.exists(path.replace(".pt", ".json"))
    import torch

    # flat torch-named fp16 state dict (reference xva_train.py:1030-1047)
    d = torch.load(path, weights_only=True)
    assert "encoder.word_emb.weight" in d
    assert "proj.weight" in d and "pitch_mean" in d
    leaves = []

    def walk(x):
        if isinstance(x, dict):
            for v in x.values():
                walk(v)
        else:
            leaves.append(x)

    walk(d)
    assert any(getattr(l, "dtype", None) == torch.float16 for l in leaves)


def test_reset_opt_state_no_retrace(dataset):
    """Optimizer re-init (stage advance) must not invalidate the compiled
    steps. A bare ``tx.init`` returns *uncommitted* default-device arrays;
    jit keys on placement, so every already-compiled bucket shape would
    recompile on the first epoch after the reset (~50-70s per shape over a
    remote-compile tunnel — measured as the entire 208s/epoch stage-2
    "steady state" of the round-3 north star). ``reset_opt_state`` commits
    the fresh state over the mesh; the jit cache must not grow."""
    import jax

    cache, out = dataset
    batcher = BucketBatcher(cache, batch_size=4, buckets=[Bucket(32, 128)])
    cfg = FastPitchTrainConfig(output_dir=out + "_retrace", batch_size=4,
                               target_bs=4, warmup_steps=2)
    tr = FastPitchTrainer(cache, cfg, TINY_MODEL,
                          mesh=make_mesh(n_data=2, n_model=1))
    tr.setup(batcher, resume=False)
    rng = jax.random.PRNGKey(0)
    _, rng = tr.run_epoch(batcher, rng)  # compiles every bucket shape
    n_compiled = _jit_cache_size(tr._step_fn)
    assert n_compiled >= 1
    tr.reset_opt_state()
    _, rng = tr.run_epoch(batcher, rng)
    assert _jit_cache_size(tr._step_fn) == n_compiled


def _jit_cache_size(fn):
    """Private-API guard (a JAX upgrade may drop _cache_size): skip rather
    than error."""
    if not hasattr(fn, "_cache_size"):
        pytest.skip("jit _cache_size private API unavailable on this JAX")
    return fn._cache_size()


def test_zero_batch_matches_collate(dataset):
    """zero_batch (the precompiler's dummy-batch builder) must stay shape/
    dtype-identical to what BucketBatcher.collate emits — any drift means the
    precompiled executables silently miss and every stage recompiles."""
    from xva_trainer_tpu.data.dataset import zero_batch

    cache, _ = dataset
    b = Bucket(32, 128)
    for use_durs in (False, True):
        for half in (False, True):
            batcher = BucketBatcher(cache, batch_size=4, buckets=[b],
                                    half_feed=half)
            batcher.use_durs = use_durs
            real = batcher.collate(b, [])
            dummy = zero_batch(b, 4, n_mels=cache.mel_cfg.n_mels,
                               half_feed=half, with_prior=True,
                               with_durs=use_durs)
            assert set(real) == set(dummy), (use_durs, half)
            for k in real:
                if k == "ids":
                    continue
                assert real[k].shape == dummy[k].shape, k
                assert real[k].dtype == dummy[k].dtype, k


def test_precompile_stage_no_retrace(dataset):
    """A background AOT precompile_stage must make the stage's first real
    epoch reuse the compiled executable (no recompile), without touching the
    live training state. Proven two ways: the warm first epoch runs much
    faster than a cold stage's first epoch (compile >> step at these sizes),
    and a second epoch adds no new jit cache entries over the first."""
    import time

    import jax

    cache, out = dataset
    batcher = BucketBatcher(cache, batch_size=4, buckets=[Bucket(32, 128)])
    cfg = FastPitchTrainConfig(output_dir=out + "_precompile", batch_size=4,
                               target_bs=4, warmup_steps=2)
    tr = FastPitchTrainer(cache, cfg, TINY_MODEL,
                          mesh=make_mesh(n_data=2, n_model=1))
    tr.setup(batcher, resume=False)

    # precompile stage 3 (no gt durations in this cache) on a worker thread,
    # exactly as train/pipeline.py runs it — AOT: allocates nothing on device
    from xva_trainer_tpu.train.precompile import Precompiler

    pre = Precompiler(max_workers=2)
    pre.submit("fp_stage3", tr.precompile_stage, 3, 4, [Bucket(32, 128)],
               False)
    assert pre.wait(timeout=600)
    assert pre.errors == [], pre.errors

    tr.stage = 3
    tr._stage_objects()
    tr.reset_opt_state()
    t0 = time.perf_counter()
    losses, _ = tr.run_epoch(batcher, jax.random.PRNGKey(3))
    warm_first = time.perf_counter() - t0
    assert len(losses) == 2 and all(np.isfinite(l) for l in losses)
    n = _jit_cache_size(tr._step_fn)
    assert n >= 1
    # a second epoch must not add compiles (reset_opt_state already covered
    # by test_reset_opt_state_no_retrace; this pins the precompiled entry)
    losses2, _ = tr.run_epoch(batcher, jax.random.PRNGKey(4))
    assert _jit_cache_size(tr._step_fn) == n

    # cold control: stage 4 was never precompiled → its first epoch pays the
    # compile, which dwarfs the two actual steps
    tr.stage = 4
    tr._stage_objects()
    tr.reset_opt_state()
    t0 = time.perf_counter()
    tr.run_epoch(batcher, jax.random.PRNGKey(5))
    cold_first = time.perf_counter() - t0
    assert warm_first < cold_first / 2, (warm_first, cold_first)


def test_resume_roundtrip(dataset):
    cache, out_dir = dataset
    batcher = BucketBatcher(cache, batch_size=4, buckets=[Bucket(32, 128)], seed=0)
    cfg = FastPitchTrainConfig(
        output_dir=out_dir, batch_size=4, target_bs=4, warmup_steps=2
    )
    mesh = make_mesh(n_data=2, n_model=1)
    tr2 = FastPitchTrainer(cache, cfg, TINY_MODEL, mesh=mesh)
    tr2.setup(batcher, resume=True)
    assert tr2.total_iter > 0  # picked up the checkpoint from the prior test


def test_stage_transitions_never_skip_stage_4():
    """Stage N hitting its early-stop target advances to N+1 and KEEPS
    training; only stage 4 completing ends the run (a bug returned True on
    the 3->4 transition, so the mel stage trained zero epochs)."""
    from xva_trainer_tpu.train.early_stop import EarlyStopState

    class _T(FastPitchTrainer):
        def __init__(self):  # bypass heavy init; exercise only finish_epoch
            self.stage = 3
            self.epoch = 0
            self.total_iter = 0
            self.cfg = FastPitchTrainConfig(output_dir="/tmp/xva_t34")
            self.early = EarlyStopState(target_delta=1e9, min_epochs=0)
            self.logger = type("L", (), {"log": lambda s, m: None})()
            self.graphs = type(
                "G", (), {"add_loss": lambda s, *a: None,
                          "add_delta": lambda s, *a: None})()

        def save_checkpoint(self):
            pass

        def _stage_objects(self):
            self.early = EarlyStopState(target_delta=1e9, min_epochs=0)

        def reset_opt_state(self):
            pass

    class _State:
        params = None

        def replace(self, **kw):
            return self

    class _Tx:
        def init(self, p):
            return None

    t = _T()
    t.state, t.tx = _State(), _Tx()
    # huge target + zero min epochs: two flat epochs trip the early stop
    assert t.finish_epoch([1.0]) is False
    done = False
    for _ in range(10):
        done = t.finish_epoch([1.0])
        if t.stage == 4:
            break
    assert t.stage == 4 and done is False  # 3->4 advanced, run continues

    for _ in range(10):
        if t.finish_epoch([1.0]):
            break
    assert t.stage == 4  # completing stage 4 ends the run without advancing


def test_half_feed_matches_f32_feed(dataset):
    """The float16 host feed (BucketBatcher.half_feed) must ship f16 mel/
    pitch/energy and produce the same stage-4 loss as the f32 feed to within
    f16 rounding of the inputs."""
    import jax

    from xva_trainer_tpu.train.fastpitch_trainer import (
        TrainState,
        make_stage_step,
    )
    from xva_trainer_tpu.train.optim import make_fastpitch_optimizer

    cache, out_dir = dataset
    half = BucketBatcher(cache, batch_size=4, buckets=[Bucket(32, 128)],
                         seed=0, half_feed=True)
    full = BucketBatcher(cache, batch_size=4, buckets=[Bucket(32, 128)],
                         seed=0, half_feed=False)
    bh = next(half.epoch(shuffle=False))
    bf = next(full.epoch(shuffle=False))
    assert bh["mel"].dtype == np.float16 and bh["pitch"].dtype == np.float16
    assert bf["mel"].dtype == np.float32
    assert bh["mel"].nbytes * 2 == bf["mel"].nbytes
    np.testing.assert_allclose(bh["mel"].astype(np.float32), bf["mel"],
                               rtol=2e-3, atol=2e-3)

    import jax.numpy as jnp

    from xva_trainer_tpu.models.fastpitch import FastPitch

    model = FastPitch(TINY_MODEL)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.asarray(bf["tokens"]), jnp.asarray(bf["in_lens"]),
        jnp.asarray(bf["mel"]), jnp.asarray(bf["mel_lens"]),
        jnp.asarray(bf["pitch"]), jnp.asarray(bf["energy"]),
        jnp.asarray(bf["prior"]),
    )
    tx = make_fastpitch_optimizer(0.05, 1e-6, 2)
    step = make_stage_step(model, 4, tx, use_gt_durs=False, use_amp=False)

    def run(b):
        # the step donates its state — give each run its own buffer copies
        p = jax.tree_util.tree_map(jnp.copy, params)
        state = TrainState(params=p, opt_state=tx.init(p),
                           step=jnp.zeros((), jnp.int32))
        sel = {k: v for k, v in b.items() if k != "ids"}
        _, meta = step(state, sel, jnp.asarray(0.0), jax.random.PRNGKey(7))
        return float(meta["loss"])

    l_half, l_full = run(bh), run(bf)
    assert np.isfinite(l_half) and np.isfinite(l_full)
    assert abs(l_half - l_full) < 0.02 * max(1.0, abs(l_full))
