"""Data pipeline tests: wav io, YIN pitch, betabinomial prior, text, dataset cache."""
import os

import numpy as np
import pytest

from xva_trainer_tpu.data import (
    BetaBinomialInterpolator,
    BucketBatcher,
    FeatureCache,
    load_wav,
    save_wav,
    resample,
    trim_silence_db,
    yin_f0,
)
from xva_trainer_tpu.data.dataset import Bucket
from xva_trainer_tpu.data.text import TextProcessor, get_symbols, xva_symbols
from xva_trainer_tpu.data.text.cleaners import english_cleaners
from xva_trainer_tpu.data.text.numbers import normalize_numbers


def test_wav_roundtrip(tmp_path):
    y = (0.5 * np.sin(2 * np.pi * 440 * np.arange(22050) / 22050)).astype(np.float32)
    p = str(tmp_path / "a.wav")
    save_wav(p, y)
    y2, sr = load_wav(p)
    assert sr == 22050
    assert np.abs(y - y2).max() < 1e-3


def test_resample():
    t = np.arange(48000) / 48000
    y = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    y2 = resample(y, 48000, 22050)
    assert abs(len(y2) - 22050) <= 1


def test_trim_silence():
    y = np.concatenate([np.zeros(11025), 0.5 * np.sin(np.arange(22050) * 0.1), np.zeros(11025)]).astype(np.float32)
    t = trim_silence_db(y)
    assert len(t) < len(y)
    assert np.abs(t).max() > 0.4


def test_yin_pitch_pure_tone():
    sr = 22050
    for f in (110.0, 220.0, 440.0):
        y = np.sin(2 * np.pi * f * np.arange(sr) / sr).astype(np.float32)
        f0 = yin_f0(y, sr)
        voiced = f0[f0 > 0]
        assert len(voiced) > 0.8 * len(f0)
        err = np.abs(np.median(voiced) - f) / f
        assert err < 0.02, f"{f}Hz → {np.median(voiced)}"
    # silence is unvoiced
    f0 = yin_f0(np.zeros(22050, np.float32), sr)
    assert (f0 == 0).all()


def test_betabinomial_prior():
    pr = BetaBinomialInterpolator()(mel_len=120, text_len=30)
    assert pr.shape == (120, 30)
    # rows are distributions concentrated along the diagonal
    peak = pr.argmax(axis=1)
    assert peak[10] < peak[60] < peak[110]


def test_numbers():
    assert normalize_numbers("I have 21 cats") == "I have twenty one cats"
    assert "nineteen oh six" in normalize_numbers("in 1906 there")
    assert "two dollars, fifty cents" in normalize_numbers("$2.50")
    assert "first" in normalize_numbers("the 1st")


def test_cleaners_and_symbols():
    assert english_cleaners("Dr.  Smith has  2 cars!") == "doctor smith has two cars!"
    assert len(get_symbols("english_basic")) == 148
    assert len(xva_symbols()) == 524


def test_text_processor():
    tp = TextProcessor()
    ids = tp.encode("Hello world!")
    assert ids.dtype == np.int32 and len(ids) == len("hello world!")
    assert (ids > 0).all()
    # curly-brace arpabet
    ids2 = tp.encode("{HH AH0 L OW1}")
    assert len(ids2) == 4


def _make_dataset(tmp_path, n=6):
    ds = tmp_path / "ds"
    (ds / "wavs").mkdir(parents=True)
    rng = np.random.default_rng(0)
    lines = []
    for i in range(n):
        dur = rng.uniform(0.6, 1.4)
        t = np.arange(int(22050 * dur)) / 22050
        f = 160 + 40 * i
        y = (0.4 * np.sin(2 * np.pi * f * t) * (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)
        save_wav(str(ds / "wavs" / f"item{i}.wav"), y)
        lines.append(f"item{i}.wav|this is sample number {i}")
    (ds / "metadata.csv").write_text("\n".join(lines))
    return str(ds)


def test_feature_cache_and_batcher(tmp_path):
    ds = _make_dataset(tmp_path)
    tp = TextProcessor()
    cache = FeatureCache(ds, tp.encode, use_pallas=False)
    assert len(cache.items) == 6
    cache.build()
    d = cache.load_item(cache.items[0])
    assert d["mel"].shape[0] == 80
    assert d["mel"].shape[1] == d["pitch"].shape[0] == d["energy"].shape[0]
    stats = cache.pitch_stats()
    assert stats["std"] > 0

    batcher = BucketBatcher(cache, batch_size=3, buckets=[Bucket(64, 256)], seed=1)
    batches = list(batcher.epoch())
    assert len(batches) == 2
    b = batches[0]
    assert b["tokens"].shape == (3, 64)
    assert b["mel"].shape == (3, 256, 80)
    assert b["prior"].shape == (3, 256, 64)
    assert (b["mel_lens"] <= 256).all() and (b["mel_lens"] >= 1).all()
    # prior rows over valid region sum ~1 on average (zoom interpolation
    # distorts edge rows — same artifact as the reference's interpolator)
    i, ml, tl = 0, b["mel_lens"][0], b["in_lens"][0]
    rows = b["prior"][i, : ml, : tl].sum(axis=1)
    assert 0.8 < rows.mean() < 1.3
    assert np.all(rows > 0)


def test_corrupt_wav_self_healing(tmp_path):
    """Unreadable wavs are dropped from the dataset during cache build and
    recorded, instead of crashing (reference deletes them on load,
    xvapitch/dataset.py:335-338)."""
    import os

    ds = _make_dataset(tmp_path)
    bad = os.path.join(ds, "wavs", "item2.wav")
    with open(bad, "wb") as f:
        f.write(b"RIFFgarbage-not-a-wav")
    tp = TextProcessor()
    cache = FeatureCache(ds, tp.encode, use_pallas=False)
    assert len(cache.items) == 6
    cache.build()
    assert len(cache.items) == 5
    assert all(it.item_id != "item2" for it in cache.items)
    healed = open(os.path.join(ds, ".tpu_cache", "corrupt_wavs.txt")).read()
    assert "item2.wav" in healed


def test_english_cleaners_v2():
    from xva_trainer_tpu.data.text.cleaners_v2 import english_cleaners_v2
    from xva_trainer_tpu.data.text.processor import TextProcessor

    out = english_cleaners_v2("Meet at 5pm, room AK47.")
    assert "five p.m." in out
    assert "{ey1}" in out and "{k ey1}" in out  # A K spelled to ARPA braces
    assert "forty seven" in out
    out2 = english_cleaners_v2("24GB at 2.1GHz, panel 1920x1080")
    assert "gigabytes" in out2 and "gigahertz" in out2
    assert "nineteen twenty by ten eighty" in out2

    tp = TextProcessor()
    ids = tp.encode("FBI at 3pm")
    assert len(ids) > 5
    dec = tp.decode(ids)
    assert "@EH1" in dec and "@B" in dec  # acronym letters became phonemes
