"""Native PCM .wem decode (VERDICT r1 missing #6; reference ships ww2ogg.exe
+ codebooks, python/wem2ogg/model.py:36-64 — PCM-codec Wwise containers need
neither)."""
import asyncio
import logging
import os
import struct

import numpy as np
import pytest

from xva_trainer_tpu.tools.audio_tools import Wem2OggTool, decode_wem_pcm


def _write_wem(path, y, sr=48000, tag=0xFFFE, bits=16, extra_chunk=True,
               channels=1):
    """Minimal Wwise-style RIFF: JUNK chunk + extensible fmt + data."""
    if channels > 1:
        y = np.repeat(y[:, None], channels, axis=1).reshape(-1)
    if bits == 16:
        data = (np.clip(y, -1, 1) * 32767).astype("<i2").tobytes()
    else:
        data = np.asarray(y, "<f4").tobytes()
    if tag == 0xFFFE:
        # 0xFFFE + cbSize + valid bits + channel mask + subformat tag
        sub = 0x0001 if bits == 16 else 0x0003
        fmt = struct.pack("<HHIIHHHHI", 0xFFFE, channels, sr,
                          sr * channels * bits // 8, channels * bits // 8,
                          bits, 22, bits, 0) + struct.pack("<H", sub) + b"\0" * 14
    else:
        fmt = struct.pack("<HHIIHH", tag, channels, sr,
                          sr * channels * bits // 8, channels * bits // 8, bits)
    chunks = b""
    if extra_chunk:
        chunks += b"JUNK" + struct.pack("<I", 4) + b"\0\0\0\0"
    chunks += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if len(fmt) & 1:
        chunks += b"\0"
    chunks += b"data" + struct.pack("<I", len(data)) + data
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks)


def test_decode_wem_pcm_extensible_16bit(tmp_path):
    t = np.arange(4800) / 48000
    y = (0.5 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    p = str(tmp_path / "a.wem")
    _write_wem(p, y)
    out = decode_wem_pcm(p)
    assert out is not None
    dec, sr = out
    assert sr == 48000
    assert np.abs(dec - y).max() < 1e-3


def test_decode_wem_float_stereo_downmix(tmp_path):
    y = np.linspace(-0.5, 0.5, 1000).astype(np.float32)
    p = str(tmp_path / "b.wem")
    _write_wem(p, y, bits=32, tag=0x0003, channels=2)
    dec, sr = decode_wem_pcm(p)
    assert np.abs(dec - y).max() < 1e-5


def test_decode_wem_vorbis_returns_none(tmp_path):
    # Wwise Vorbis uses tag 0xFFFF; must defer to the binary path
    y = np.zeros(100, np.float32)
    p = str(tmp_path / "c.wem")
    _write_wem(p, y, tag=0xFFFF)
    assert decode_wem_pcm(p) is None


def test_wem2ogg_tool_native_path(tmp_path, monkeypatch):
    monkeypatch.setenv("PATH", "/nonexistent")  # no ww2ogg/vgmstream
    src = tmp_path / "in"
    src.mkdir()
    t = np.arange(4800) / 48000
    y = (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32)
    _write_wem(str(src / "voice.wem"), y)
    out = tmp_path / "out"
    lg = logging.getLogger("t-wem")
    lg.addHandler(logging.NullHandler())
    lg.propagate = False
    tool = Wem2OggTool(logger=lg)
    asyncio.new_event_loop().run_until_complete(tool.run({
        "inPath": str(src), "outputDirectory": str(out), "toolSettings": {},
    }))
    assert os.path.exists(out / "voice.wav")
    from xva_trainer_tpu.data import load_wav

    dec, sr = load_wav(str(out / "voice.wav"), target_sr=48000)
    assert len(dec) == len(y)
