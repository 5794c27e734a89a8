"""Packed mmap cache (data/packed.py) + prefetch pipeline (data/prefetch.py)."""
import os
import time

import numpy as np
import pytest

from xva_trainer_tpu.data import BucketBatcher, FeatureCache, save_wav
from xva_trainer_tpu.data.dataset import Bucket
from xva_trainer_tpu.data.packed import PackedReader, pack_cache
from xva_trainer_tpu.data.prefetch import Prefetcher
from xva_trainer_tpu.data.text import TextProcessor


def _make_dataset(tmp_path, n=5):
    ds = tmp_path / "ds"
    (ds / "wavs").mkdir(parents=True)
    rng = np.random.default_rng(0)
    lines = []
    for i in range(n):
        t = np.arange(int(22050 * rng.uniform(0.6, 1.2))) / 22050
        y = (0.4 * np.sin(2 * np.pi * (150 + 30 * i) * t)).astype(np.float32)
        save_wav(str(ds / "wavs" / f"it{i}.wav"), y)
        lines.append(f"it{i}.wav|sample number {i}")
    (ds / "metadata.csv").write_text("\n".join(lines))
    return str(ds)


def test_packed_cache_matches_npz(tmp_path):
    ds = _make_dataset(tmp_path)
    cache = FeatureCache(ds, TextProcessor().encode, use_pallas=False)
    cache.build()  # build() packs at the end
    assert cache._packed, "build() should produce the packed cache"
    reader = PackedReader(cache.cache_dir)
    for it in cache.items:
        packed = reader.load(it.item_id)
        with np.load(os.path.join(cache.cache_dir, it.item_id + ".npz")) as z:
            raw = {k: z[k] for k in z.files}
        assert set(packed) == set(raw)
        for k in raw:
            assert packed[k].dtype == raw[k].dtype
            np.testing.assert_array_equal(packed[k], raw[k])
    # load_item prefers the pack (zero-copy read-only views)
    d = cache.load_item(cache.items[0])
    assert not d["mel"].flags.writeable


def test_load_item_prefers_fresher_npz(tmp_path):
    """A per-item npz rewritten after pack() must win over the stale
    packed entry (targeted re-extraction without a repack)."""
    ds = _make_dataset(tmp_path, n=3)
    cache = FeatureCache(ds, TextProcessor().encode, use_pallas=False)
    cache.build()
    it = cache.items[0]
    p = os.path.join(cache.cache_dir, it.item_id + ".npz")
    with np.load(p) as z:
        d = {k: z[k] for k in z.files}
    d["pitch"] = d["pitch"] + 123.0
    time.sleep(0.05)  # ensure the npz mtime exceeds the pack stamp
    np.savez(p, **d)
    got = cache.load_item(it)
    np.testing.assert_array_equal(got["pitch"], d["pitch"])
    cache.pack()  # repacking reconciles; the pack wins again
    got2 = cache.load_item(it)
    np.testing.assert_array_equal(got2["pitch"], d["pitch"])
    assert not got2["pitch"].flags.writeable  # served from the mmap again


def test_pack_is_incremental(tmp_path):
    ds = _make_dataset(tmp_path, n=3)
    cache = FeatureCache(ds, TextProcessor().encode, use_pallas=False)
    cache.build()
    idx = os.path.join(cache.cache_dir, "packed_index.json")
    m0 = os.path.getmtime(idx)
    time.sleep(0.05)
    pack_cache(cache.cache_dir)  # unchanged npz set → no rewrite
    assert os.path.getmtime(idx) == m0


def test_batcher_over_packed_cache(tmp_path):
    ds = _make_dataset(tmp_path)
    cache = FeatureCache(ds, TextProcessor().encode, use_pallas=False)
    cache.build()
    batcher = BucketBatcher(cache, batch_size=2, buckets=[Bucket(64, 256)])
    batches = list(batcher.epoch())
    assert batches and batches[0]["mel"].shape == (2, 256, 80)


def test_prefetcher_order_and_values():
    src = list(range(20))
    pf = Prefetcher(iter(src), transform=lambda x: x * 2, depth=2)
    assert list(pf) == [x * 2 for x in src]


def test_prefetcher_propagates_exceptions():
    def gen():
        yield 1
        raise ValueError("boom")

    pf = Prefetcher(gen())
    it = iter(pf)
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        next(it)


def test_prefetcher_close_stops_worker():
    produced = []

    def gen():
        for i in range(10**6):
            produced.append(i)
            yield i

    pf = Prefetcher(gen(), depth=2)
    it = iter(pf)
    for _ in range(3):
        next(it)
    pf.close()
    assert not pf._thread.is_alive()
    n = len(produced)
    time.sleep(0.1)
    assert len(produced) == n  # no production after close


def test_prefetcher_overlaps_producer_and_consumer():
    """Wall-clock of interleaved sleeps must be < serial sum (true overlap)."""

    def slow_gen():
        for i in range(6):
            time.sleep(0.05)  # "collate"
            yield i

    t0 = time.perf_counter()
    for _ in Prefetcher(slow_gen(), depth=3):
        time.sleep(0.05)  # "device step"
    wall = time.perf_counter() - t0
    assert wall < 0.55, wall  # serial would be ≥0.6


def test_pack_rebuilds_after_mismatch(tmp_path):
    """Interrupted pack_cache (index/bin disagree) must be detected, and the
    reader must refuse the stale pair instead of serving wrong bytes."""
    ds = _make_dataset(tmp_path, n=3)
    cache = FeatureCache(ds, TextProcessor().encode, use_pallas=False)
    cache.build()
    bin_path = os.path.join(cache.cache_dir, "packed.bin")
    # truncate the bin (simulates dying between the two os.replace calls)
    with open(bin_path, "r+b") as f:
        f.truncate(os.path.getsize(bin_path) // 2)
    reader = PackedReader(cache.cache_dir)
    assert not reader  # size mismatch → refuses the pair
    # pack_cache notices too and rebuilds instead of reporting up-to-date
    pack_cache(cache.cache_dir)
    reader = PackedReader(cache.cache_dir)
    assert reader
    assert reader.load(cache.items[0].item_id) is not None
    # deleted bin with surviving index must also trigger a rebuild
    os.remove(bin_path)
    pack_cache(cache.cache_dir)
    assert PackedReader(cache.cache_dir)


def test_fastpitch_init_without_prior(tmp_path):
    """force_stage=2 with pre-extracted durations uses a with_prior=False
    batcher; _init_params must synthesize the prior instead of KeyError."""
    from xva_trainer_tpu.train.fastpitch_trainer import (
        FastPitchTrainConfig, FastPitchTrainer)
    from xva_trainer_tpu.models.fastpitch import FastPitchConfig

    ds = _make_dataset(tmp_path, n=4)
    cache = FeatureCache(ds, TextProcessor().encode, use_pallas=False)
    cache.build()
    batcher = BucketBatcher(cache, batch_size=2, buckets=[Bucket(64, 256)],
                            with_prior=False)
    cfg = FastPitchTrainConfig(output_dir=str(tmp_path / "out"), batch_size=2,
                               force_stage=2)
    mcfg = FastPitchConfig(n_symbols=200, symbols_embedding_dim=32,
                           in_fft_n_layers=1, out_fft_n_layers=1,
                           in_fft_filter_size=64, out_fft_filter_size=64,
                           in_fft_d_head=16, out_fft_d_head=16,
                           predictor_filter_size=32)
    tr = FastPitchTrainer(cache, cfg, mcfg)
    batch = next(batcher.epoch(shuffle=False))
    assert "prior" not in batch
    params = tr._init_params(batcher)
    assert params is not None
