"""xVAPitch trainer end-to-end smoke: tiny synthetic dataset → GAN steps →
checkpoint → early-stop machinery → export."""

import pytest

pytestmark = pytest.mark.slow  # full-size/e2e tier: run via `make test-all`
import os

import numpy as np
import pytest

from xva_trainer_tpu.data import save_wav
from xva_trainer_tpu.data.dataset import Bucket
from xva_trainer_tpu.data.text.xva_processor import XvaTextProcessor
from xva_trainer_tpu.data.xva_dataset import (
    XvaBatcher,
    XvaFeatureCache,
    loss_sorted_resample,
)
from xva_trainer_tpu.models.xvapitch import XVAPitchConfig
from xva_trainer_tpu.parallel.mesh import make_mesh
from xva_trainer_tpu.train.xvapitch_trainer import (
    XVAPitchTrainer,
    XvaTrainConfig,
    xva_target_deltas,
)

TINY = XVAPitchConfig(
    n_vocab=524, big=False, upsample_initial_channel=32,
    resblock_kernel_sizes=(3,), spec_segment_size=8, mltts_rc=False,
    text_layers=2, posterior_layers=3, flow_wn_layers=2, num_flows=2,
    sdp_flows=2, pitch_layers=1,
)


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("v3ds")
    ds = tmp / "en_test"
    (ds / "wavs").mkdir(parents=True)
    rng = np.random.default_rng(0)
    lines = []
    for i in range(4):
        t = np.arange(int(22050 * 0.8)) / 22050
        y = (0.4 * np.sin(2 * np.pi * (140 + 40 * i) * t)).astype(np.float32)
        save_wav(str(ds / "wavs" / f"u{i}.wav"), y)
        lines.append(f"u{i}.wav|test line {i}")
    (ds / "metadata.csv").write_text("\n".join(lines))
    tp = XvaTextProcessor()
    cache = XvaFeatureCache(str(ds), tp, use_pallas=False)
    cache.build()
    return cache, str(tmp / "out")


def test_target_deltas():
    d = xva_target_deltas(8000)
    assert d[0] == 0.04 and 0 < d[1] < 0.001


def test_loss_sorted_resample():
    losses = {f"f{i}": float(i) for i in range(40)}
    picked = loss_sorted_resample(losses)
    assert len(picked) == 40  # 50% doubled
    # mid-loss items should dominate over extremes
    ranks = [int(p[1:]) for p in picked]
    assert 10 <= np.mean(ranks) <= 30


def test_v3_trainer_end_to_end(dataset):
    cache, out = dataset
    dvec = np.random.default_rng(1).standard_normal(512).astype(np.float32) * 0.1
    batcher = XvaBatcher([cache], batch_size=2, d_vector=dvec,
                         buckets=[Bucket(64, 128)])
    cfg = XvaTrainConfig(output_dir=out, batch_size=2, target_bs=4,
                         save_step=2, finetune_weight=3)
    assert cfg.gam == 2
    mesh = make_mesh(n_data=2, n_model=1)
    tr = XVAPitchTrainer(batcher, cfg, TINY, mesh=mesh)
    tr.setup(resume=False)
    result = tr.train(max_steps=4)
    assert result["training_iters"] >= 4
    assert tr.ckpt.latest_step() is not None
    assert os.path.exists(os.path.join(out, "graphs.json"))
    assert len(tr.loss_sampling) > 0  # per-sample losses collected

    path = tr.export("v3voice", base_emb=dvec)
    assert os.path.exists(path)
    import torch

    # export contract: a FLAT torch-named fp16 state dict (what xVASynth
    # load_state_dicts directly — reference xva_train.py:984-1022)
    d = torch.load(path, weights_only=True)
    assert "text_encoder.emb.weight" in d
    assert "waveform_decoder.conv_pre.weight" in d
    assert "disc.nets.0.convs.0.weight_v" in d
    assert all(hasattr(v, "dtype") for v in d.values())
    import json

    meta = json.load(open(path.replace(".pt", ".json")))
    assert meta["modelType"] == "xVAPitch" and meta["version"] == "3.0"
    assert len(meta["games"][0]["base_speaker_emb"]) == 512


def test_v3_resume(dataset):
    cache, out = dataset
    dvec = np.zeros(512, np.float32)
    batcher = XvaBatcher([cache], batch_size=2, d_vector=dvec,
                         buckets=[Bucket(64, 128)])
    cfg = XvaTrainConfig(output_dir=out, batch_size=2, target_bs=4,
                         save_step=2)
    tr = XVAPitchTrainer(batcher, cfg, TINY, mesh=make_mesh(n_data=2, n_model=1))
    tr.setup(resume=True)
    assert tr.training_iters > 0
