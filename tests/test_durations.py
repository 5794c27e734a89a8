"""Duration pre-extraction + gt-durs training path (stages ≥2 without MAS)."""

import pytest

pytestmark = pytest.mark.slow  # numerics-parity tier: run via `make test-all`
import numpy as np
import jax
import jax.numpy as jnp

from xva_trainer_tpu.data import FeatureCache, save_wav
from xva_trainer_tpu.data.dataset import Bucket, BucketBatcher
from xva_trainer_tpu.data.text import TextProcessor
from xva_trainer_tpu.models.fastpitch import FastPitchConfig
from xva_trainer_tpu.parallel.mesh import make_mesh
from xva_trainer_tpu.train.fastpitch_trainer import (
    FastPitchTrainConfig,
    FastPitchTrainer,
)

TINY = FastPitchConfig(
    symbols_embedding_dim=64, in_fft_n_layers=1, out_fft_n_layers=1,
    in_fft_d_head=32, out_fft_d_head=32, in_fft_filter_size=64,
    out_fft_filter_size=64, predictor_filter_size=32,
)


def test_extract_and_train_with_gt_durs(tmp_path):
    ds = tmp_path / "ds"
    (ds / "wavs").mkdir(parents=True)
    rng = np.random.default_rng(0)
    lines = []
    for i in range(4):
        t = np.arange(int(22050 * 0.8)) / 22050
        y = (0.4 * np.sin(2 * np.pi * (160 + 20 * i) * t)).astype(np.float32)
        save_wav(str(ds / "wavs" / f"d{i}.wav"), y)
        lines.append(f"d{i}.wav|sample line {i}")
    (ds / "metadata.csv").write_text("\n".join(lines))
    tp = TextProcessor()
    cache = FeatureCache(str(ds), tp.encode, use_pallas=False)
    cache.build()
    batcher = BucketBatcher(cache, batch_size=4, buckets=[Bucket(32, 128)])
    cfg = FastPitchTrainConfig(output_dir=str(tmp_path / "out"), batch_size=4,
                               target_bs=4, warmup_steps=2)
    tr = FastPitchTrainer(cache, cfg, TINY, mesh=make_mesh(n_data=2, n_model=1))
    tr.setup(batcher, resume=False)

    n = tr.extract_durations(batcher)
    assert n == 4
    assert cache.has_durations()
    d = cache.load_durations("d0")
    assert d is not None and d.sum() > 0

    # batches now carry durs; stages 2/4 train against them (no aligner/MAS)
    batcher.use_durs = True
    batch = next(batcher.epoch(shuffle=False))
    assert "durs" in batch
    for stage in (2, 4):
        tr.stage = stage
        tr._stage_objects()
        assert tr._step_fn is not None
        tr.reset_opt_state()
        losses, _ = tr.run_epoch(batcher, jax.random.PRNGKey(stage))
        assert all(np.isfinite(l) for l in losses)
