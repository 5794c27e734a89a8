"""Native .wem decode — PCM containers and the full Wwise-Vorbis rebuild
(reference ships ww2ogg.exe + codebooks, python/wem2ogg/model.py:36-64; here
tools/wwise_vorbis.py does the conversion with no external binary).

Vorbis fixtures are REAL Vorbis streams: libvorbisenc packets stripped into
each Wwise container variant by tests/wem_fixture.py (the exact inverse of
the converter), so a correct rebuild must reproduce the original packets
bit-for-bit."""
import asyncio
import logging
import os
import struct

import numpy as np
import pytest

from xva_trainer_tpu.native import vorbis as nvorbis
from xva_trainer_tpu.tools.audio_tools import Wem2OggTool, decode_wem_pcm
from xva_trainer_tpu.tools.wwise_vorbis import (
    BitReader,
    BitWriter,
    CodebookLibrary,
    OggPageWriter,
    WemParseError,
    copy_vorbis_codebook,
    wem_to_ogg,
    write_packed_library,
)

needs_libvorbis = pytest.mark.skipif(
    not nvorbis.available(), reason="system libvorbis not present")


@pytest.fixture(scope="module")
def vorbis_packets():
    """2s amplitude-modulated sine encoded to raw Vorbis packets."""
    sr = 22050
    t = np.arange(sr * 2) / sr
    pcm = (0.3 * np.sin(2 * np.pi * 440 * t)
           * (0.6 + 0.4 * np.sin(2 * np.pi * 2 * t))).astype(np.float32)
    out = nvorbis.encode_ogg_packets(pcm, sr)
    assert out is not None
    headers, audio = out
    return pcm, sr, headers, audio


def _page(headers, audio):
    w = OggPageWriter()
    w.add_packet(headers[0], granule=0)
    w.flush(0)
    w.add_packet(headers[1])
    w.add_packet(headers[2])
    w.flush(0)
    for i, (pkt, gran) in enumerate(audio):
        last = i == len(audio) - 1
        w.add_packet(pkt, granule=gran, eos=last)
        if not last:
            w.maybe_flush(gran)
    return w.to_bytes()


def _decode(tmp_path, name, blob):
    p = str(tmp_path / name)
    with open(p, "wb") as f:
        f.write(blob)
    out = nvorbis.decode_ogg(p)
    assert out is not None
    return out


def test_aotuv_library_rebuilds_cleanly():
    """Every codebook in the shipped aoTuV 6.03 library must re-inflate to a
    structurally valid spec Vorbis codebook (sync, lengths, lookup walk)."""
    lib = CodebookLibrary()
    assert lib.count == 598
    for i in range(lib.count):
        bw = BitWriter()
        lib.rebuild(i, bw)
        br = BitReader(bw.to_bytes())
        copy_vorbis_codebook(br, BitWriter())
        assert br.remaining() < 8, f"codebook {i} misparsed"


@needs_libvorbis
def test_wem_triad_byte_identical(tmp_path, vorbis_packets):
    from wem_fixture import build_wem

    pcm, sr, headers, audio = vorbis_packets
    wem = build_wem(headers, audio, 1, sr, "triad")
    assert wem_to_ogg(wem) == _page(headers, audio)


@needs_libvorbis
@pytest.mark.parametrize("variant", ["inline", "external"])
def test_wem_vorbis_roundtrip(tmp_path, vorbis_packets, variant):
    """Stripped wem → rebuilt ogg decodes SAMPLE-IDENTICALLY to the original
    packets (id/comment headers are regenerated, so compare PCM + setup)."""
    from wem_fixture import build_wem

    pcm, sr, headers, audio = vorbis_packets
    kw = {}
    if variant == "external":
        books = []
        wem = build_wem(headers, audio, 1, sr, variant, packed_books=books)
        pcb = str(tmp_path / "game.pcb")
        write_packed_library(books, pcb)
        kw["codebook_path"] = pcb
    else:
        wem = build_wem(headers, audio, 1, sr, variant)
    ogg = wem_to_ogg(wem, **kw)

    golden, grate = _decode(tmp_path, "golden.ogg", _page(headers, audio))
    dec, rate = _decode(tmp_path, f"{variant}.ogg", ogg)
    assert rate == grate == sr
    np.testing.assert_array_equal(dec, golden)
    n = min(len(dec), len(pcm))
    assert np.corrcoef(dec[:n], pcm[:n])[0, 1] > 0.99


@needs_libvorbis
def test_wem_vorbis_aotuv_end_to_end(tmp_path, vorbis_packets):
    """External-codebook wem whose ids point into the BUNDLED aoTuV library:
    exercises the production codebook file, not just a custom one. The
    encoder's books aren't in aoTuV, so splice our packed books into a
    library with the same 598-entry shape (ids beyond the real count)."""
    from wem_fixture import build_wem

    pcm, sr, headers, audio = vorbis_packets
    lib = CodebookLibrary()
    entries = [lib.get(i) for i in range(lib.count)]
    books = []
    wem = build_wem(headers, audio, 1, sr, "external", packed_books=books)
    # fixture ids start at 0 → rewrite them to start after the real entries
    base = len(entries)
    entries2 = entries + books
    pcb = str(tmp_path / "aotuv_plus.pcb")
    write_packed_library(entries2, pcb)
    # shift the 10-bit ids in the wem's setup packet
    from xva_trainer_tpu.tools.wwise_vorbis import parse_wem, _read_packet

    info = parse_wem(wem)
    payload, end, _ = _read_packet(
        wem, info.data_offset + info.setup_packet_offset, info.packet_header)
    br = BitReader(payload)
    bw = BitWriter()
    count = br.read(8) + 1
    bw.write(count - 1, 8)
    for _ in range(count):
        bw.write(br.read(10) + base, 10)
    while br.remaining() >= 32:
        bw.write(br.read(32), 32)
    r = br.remaining()
    bw.write(br.read(r), r)
    new_payload = bw.to_bytes()
    assert len(new_payload) == len(payload)
    start = info.data_offset + info.setup_packet_offset + 2
    wem2 = wem[:start] + new_payload + wem[start + len(payload):]
    ogg = wem_to_ogg(wem2, codebook_path=pcb)
    dec, rate = _decode(tmp_path, "aotuv.ogg", ogg)
    golden, _ = _decode(tmp_path, "golden2.ogg", _page(headers, audio))
    np.testing.assert_array_equal(dec, golden)


@needs_libvorbis
def test_wem2ogg_tool_vorbis(tmp_path, vorbis_packets):
    """Tool integration: Vorbis .wem in a folder → .ogg (+ .wav with toWav)."""
    from wem_fixture import build_wem

    pcm, sr, headers, audio = vorbis_packets
    src = tmp_path / "in"
    src.mkdir()
    books = []
    wem = build_wem(headers, audio, 1, sr, "external", packed_books=books)
    pcb = str(tmp_path / "game.pcb")
    write_packed_library(books, pcb)
    (src / "line.wem").write_bytes(wem)
    out = tmp_path / "out"
    lg = logging.getLogger("t-wemv")
    lg.addHandler(logging.NullHandler())
    lg.propagate = False
    tool = Wem2OggTool(logger=lg)
    asyncio.new_event_loop().run_until_complete(tool.run({
        "inPath": str(src), "outputDirectory": str(out),
        "toolSettings": {}, "toWav": True, "codebooksPath": pcb,
    }))
    assert os.path.exists(out / "line.ogg")
    assert os.path.exists(out / "line.wav")
    from xva_trainer_tpu.data import load_wav

    dec, rate = load_wav(str(out / "line.wav"), target_sr=sr)
    n = min(len(dec), len(pcm))
    assert np.corrcoef(dec[:n], pcm[:n])[0, 1] > 0.99


@needs_libvorbis
def test_wem_vorbis_corrupt_raises(tmp_path, vorbis_packets):
    from wem_fixture import build_wem

    pcm, sr, headers, audio = vorbis_packets
    books = []
    wem = bytearray(build_wem(headers, audio, 1, sr, "external",
                              packed_books=books))
    pcb = str(tmp_path / "game.pcb")
    write_packed_library(books, pcb)
    wem[len(wem) // 2:] = b""  # truncate mid-data
    with pytest.raises(WemParseError):
        wem_to_ogg(bytes(wem), codebook_path=pcb)


@needs_libvorbis
def test_decode_any_handles_ogg_and_vorbis_wem(tmp_path, vorbis_packets):
    from wem_fixture import build_wem
    from xva_trainer_tpu.tools.audio_tools import decode_any

    pcm, sr, headers, audio = vorbis_packets
    ogg_path = str(tmp_path / "x.ogg")
    with open(ogg_path, "wb") as f:
        f.write(_page(headers, audio))
    y, rate = decode_any(ogg_path, target_sr=sr)
    assert rate == sr and abs(len(y) - len(pcm)) <= 128

    wem = build_wem(headers, audio, 1, sr, "inline")
    wem_path = str(tmp_path / "x.wem")
    with open(wem_path, "wb") as f:
        f.write(wem)
    y2, rate2 = decode_any(wem_path, target_sr=sr)
    assert rate2 == sr
    np.testing.assert_array_equal(y, y2)


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


def test_write_packed_library_count_roundtrip(tmp_path):
    """The final u32 is dual-purpose (last table entry + table pointer):
    a written library must read back with EXACTLY the entry count written
    (regression: a duplicated terminator created a phantom empty codebook)."""
    books = [b"\x01\x02\x03", b"\x04\x05", b"\x06" * 7]
    p = str(tmp_path / "lib.pcb")
    write_packed_library(books, p)
    lib = CodebookLibrary(p)
    assert lib.count == len(books)
    for i, b in enumerate(books):
        assert lib.get(i) == b
    with pytest.raises(WemParseError):
        lib.get(len(books))


def _parse_ogg_pages(blob):
    import struct as _s

    pages = []
    pos = 0
    while pos < len(blob):
        assert blob[pos:pos + 4] == b"OggS"
        flags = blob[pos + 5]
        granule = _s.unpack_from("<q", blob, pos + 6)[0]
        nsegs = blob[pos + 26]
        lacing = blob[pos + 27: pos + 27 + nsegs]
        body = sum(lacing)
        pages.append({"flags": flags, "granule": granule,
                      "lacing": list(lacing)})
        pos += 27 + nsegs + body
    return pages


def test_ogg_page_split_granules():
    """A page flushed mid-packet must carry the granule of the last packet
    that COMPLETED on it (-1 only when none did — Ogg spec)."""
    w = OggPageWriter()
    for i in range(10):
        w.add_packet(bytes(200), granule=i)
    w.add_packet(bytes(80000), granule=99, eos=True)  # spans several pages
    pages = _parse_ogg_pages(w.to_bytes())
    # first page ends mid-big-packet but holds the 10 completed packets
    assert pages[0]["granule"] == 9
    assert pages[1]["flags"] & 0x01  # continuation
    # middle pages where nothing completes carry -1
    for p in pages[1:-1]:
        assert p["granule"] == -1
    assert pages[-1]["granule"] == 99
    assert pages[-1]["flags"] & 0x04  # EOS


def test_decode_any_falls_back_for_non_vorbis(tmp_path, monkeypatch):
    """Corrupt/non-Vorbis .ogg and non-Vorbis .wem must fall through to the
    ffmpeg fallback path (RuntimeError when absent), not raise parse errors."""
    from xva_trainer_tpu.tools.audio_tools import decode_any

    monkeypatch.setenv("PATH", "/nonexistent")  # no ffmpeg
    bad_ogg = str(tmp_path / "bad.ogg")
    with open(bad_ogg, "wb") as f:
        f.write(b"OggS" + b"\x00" * 64)  # not a valid vorbis stream
    with pytest.raises(RuntimeError, match="ffmpeg"):
        decode_any(bad_ogg)
    # ADPCM-ish wem: RIFF with an unknown codec tag
    bad_wem = str(tmp_path / "bad.wem")
    fmt = struct.pack("<HHIIHH", 0x0002, 1, 22050, 22050, 1, 4)
    body = (b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", 8) + bytes(8))
    with open(bad_wem, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body)
    with pytest.raises(RuntimeError, match="ffmpeg"):
        decode_any(bad_wem)
