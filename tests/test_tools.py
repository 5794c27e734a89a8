"""Tool suite tests: loudness normalization, silence ops, noise removal,
srt parsing/splitting, WER, clustering/search, diarization (websocket-free)."""
import asyncio
import os

import numpy as np
import pytest

from xva_trainer_tpu.data import load_wav, save_wav
from xva_trainer_tpu.ops.loudness import integrated_loudness, normalize_ebu_r128
from xva_trainer_tpu.tools import (
    AudioFormatTool,
    AudioNormalizeTool,
    ClusterSpeakersTool,
    CutPaddingTool,
    SilenceCutTool,
    SilenceSplitTool,
    SpeakerSearchTool,
    SrtSplitTool,
    TOOL_REGISTRY,
    wer,
)
from xva_trainer_tpu.tools.audio_tools import find_silences, parse_srt, format_srt


def run(coro):
    return asyncio.run(coro)


def _tone(f=220.0, sec=1.0, amp=0.1, sr=22050):
    t = np.arange(int(sr * sec)) / sr
    return (amp * np.sin(2 * np.pi * f * t)).astype(np.float32)


def test_registry_complete():
    assert len(TOOL_REGISTRY) == 16


def test_integrated_loudness_sine():
    # A full-scale 997 Hz sine is ~ -3.01 LUFS by BS.1770 definition
    y = _tone(997, 2.0, amp=1.0)
    lufs = integrated_loudness(y, 22050)
    assert abs(lufs - (-3.01)) < 0.6, lufs


def test_normalize_to_target():
    y = _tone(220, 2.0, amp=0.05)
    out = normalize_ebu_r128(y, 22050, target_lufs=-23.0)
    lufs = integrated_loudness(out, 22050)
    assert abs(lufs - (-23.0)) < 0.7, lufs


def test_format_and_normalize_tools(tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    save_wav(str(src / "a.wav"), _tone(300, 0.8, 0.02))
    out = tmp_path / "out"
    run(AudioFormatTool().runTask(
        {"inPath": str(src), "outputDirectory": str(out)}))
    y, sr = load_wav(str(out / "a.wav"))
    assert sr == 22050 and len(y) > 0
    out2 = tmp_path / "norm"
    run(AudioNormalizeTool().runTask(
        {"inPath": str(out), "outputDirectory": str(out2)}))
    y2, _ = load_wav(str(out2 / "a.wav"))
    assert np.abs(y2).max() > np.abs(y).max()  # was quiet, got louder
    assert os.path.exists(out2 / ".progress.txt")


def test_silence_ops(tmp_path):
    sr = 22050
    y = np.concatenate([_tone(440, 0.5), np.zeros(sr), _tone(220, 0.5)])
    sil = find_silences(y, sr, -40.0, 0.3)
    assert len(sil) == 1
    s, e = sil[0]
    assert abs(s / sr - 0.5) < 0.1 and abs(e / sr - 1.5) < 0.1

    src = tmp_path / "in"; src.mkdir()
    save_wav(str(src / "x.wav"), y)
    cut_out = tmp_path / "cut"
    run(SilenceCutTool().runTask({"inPath": str(src), "outputDirectory": str(cut_out)}))
    y_cut, _ = load_wav(str(cut_out / "x.wav"))
    assert len(y_cut) < len(y) - sr // 2  # ~1s of silence collapsed to ~300ms

    split_out = tmp_path / "split"
    run(SilenceSplitTool().runTask(
        {"inPath": str(src), "outputDirectory": str(split_out)}))
    parts = sorted(os.listdir(split_out))
    assert sum(p.endswith(".wav") for p in parts) == 2

    pad_out = tmp_path / "pad"
    y_padded = np.concatenate([np.zeros(sr // 2), _tone(440, 0.5), np.zeros(sr // 2)])
    save_wav(str(src / "p.wav"), y_padded)
    run(CutPaddingTool().runTask({"inPath": str(src / "p.wav"),
                                  "outputDirectory": str(pad_out)}))
    y_trim, _ = load_wav(str(pad_out / "p.wav"))
    assert len(y_trim) < len(y_padded) - sr // 2


def test_srt_roundtrip(tmp_path):
    entries = [
        {"start": 0.0, "end": 1.25, "text": "hello there"},
        {"start": 1.5, "end": 2.75, "text": "second line"},
    ]
    srt = format_srt(entries)
    parsed = parse_srt(srt)
    assert len(parsed) == 2
    assert parsed[0]["text"] == "hello there"
    assert abs(parsed[1]["end"] - 2.75) < 1e-3

    # split a wav by the srt
    y = np.concatenate([_tone(440, 1.5), _tone(220, 1.5)])
    wav_path = tmp_path / "long.wav"
    save_wav(str(wav_path), y)
    srt_path = tmp_path / "long.srt"
    srt_path.write_text(srt)
    out = tmp_path / "ds"
    run(SrtSplitTool().runTask({
        "inPath": str(wav_path), "srtPath": str(srt_path),
        "outputDirectory": str(out),
    }))
    meta = (out / "metadata.csv").read_text().splitlines()
    assert len(meta) == 2 and meta[0].endswith("hello there")
    assert len(os.listdir(out / "wavs")) == 2


def test_wer():
    assert wer("the cat sat", "the cat sat") == 0.0
    assert wer("the cat sat", "the dog sat") == pytest.approx(1 / 3)
    assert wer("a b", "a b c d") == 1.0


@pytest.mark.slow
def test_cluster_and_search(tmp_path):
    rng = np.random.default_rng(0)
    src = tmp_path / "voices"; src.mkdir()
    # two distinct "voices" × 3 files
    for vi, f0 in enumerate((120, 320)):
        for i in range(3):
            t = np.arange(22050) / 22050
            y = sum((0.4 / k) * np.sin(2 * np.pi * f0 * k * t) for k in (1, 2, 3))
            y = (y + 0.01 * rng.standard_normal(len(t))).astype(np.float32)
            save_wav(str(src / f"v{vi}_{i}.wav"), y)
    out = tmp_path / "clusters"
    run(ClusterSpeakersTool().runTask({
        "inPath": str(src), "outputDirectory": str(out),
        "toolSettings": {"numClusters": 2},
    }))
    subdirs = [d for d in os.listdir(out) if d.startswith("cluster_")]
    assert len(subdirs) == 2

    ranked = tmp_path / "ranked"
    run(SpeakerSearchTool().runTask({
        "queryPath": str(src / "v0_0.wav"), "corpusPath": str(src),
        "outputDirectory": str(ranked),
    }))
    names = sorted(n for n in os.listdir(ranked) if n.endswith(".wav"))
    assert len(names) == 6
    # same-voice files must rank first
    assert all("v0" in n for n in names[:3]), names


def test_transcribe_resume_is_extension_insensitive(tmp_path):
    """LJSpeech-style stem keys in metadata.csv must count as already
    transcribed (and empty-text lines must be filled in place, not
    duplicated) — tools/text_tools.py resume vs reference
    transcribe/model.py:118-133."""
    from xva_trainer_tpu.tools.text_tools import TranscribeTool

    wavs = tmp_path / "wavs"
    wavs.mkdir()
    for n in ("a", "b", "c"):
        save_wav(str(wavs / f"{n}.wav"), _tone())
    # a: stem key w/ text (must be skipped); b: empty text (must be filled
    # in place under the same key); c: absent (appended)
    (tmp_path / "metadata.csv").write_text("a|kept text\nb|")

    calls = []

    def fake_asr(wav16k):
        calls.append(len(wav16k))
        return "asr text"

    TranscribeTool.set_asr_backend(fake_asr)
    try:
        tool = TranscribeTool()
        run(tool.run({"inPath": str(wavs),
                      "outputDirectory": str(tmp_path),
                      "toolSettings": {}}))
    finally:
        TranscribeTool._asr_backend = None

    assert len(calls) == 2  # b and c only — a's transcript is kept
    rows = dict(
        line.split("|", 1)
        for line in (tmp_path / "metadata.csv").read_text().splitlines()
        if line.strip()
    )
    assert rows["a"] == "kept text"
    assert rows["b"] == "asr text"          # filled under the stem key
    assert rows["c.wav"] == "asr text"      # new record appended
    assert len(rows) == 3                   # no stem/.wav duplicates
