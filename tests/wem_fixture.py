"""Wwise .wem fixture builder: the INVERSE of tools/wwise_vorbis.py.

Takes real Vorbis packets (from libvorbisenc via native/vorbis.py) and strips
them into the three Wwise container variants the converter supports:

- "external": fmt-0x42 embedded vorb, 2-byte packet headers, mod packets,
  codebooks replaced by 10-bit ids into a custom packed library;
- "inline":   vorb 0x32, 6-byte packet headers, codebooks kept in spec form;
- "triad":    vorb 0x28, 8-byte packet headers, the three Vorbis headers
  stored verbatim.

Because stripping is the exact inverse of the converter's re-inflation, a
wem built here must convert back to a bit-identical Ogg stream — the
strongest possible correctness check without real game data.
"""
import struct
from typing import List, Optional, Tuple

from xva_trainer_tpu.tools.wwise_vorbis import (
    BitReader,
    BitWriter,
    WemParseError,
    _scan_setup_blockflags,
    book_maptype1_quantvals,
    copy_vorbis_codebook,
    ilog,
)


def vorbis_codebook_to_packed(br: BitReader) -> bytes:
    """Convert one spec-form codebook to the packed library entry format."""
    if br.read(24) != 0x564342:
        raise WemParseError("codebook lost sync")
    bw = BitWriter()
    dimensions = br.read(16)
    entries = br.read(24)
    bw.write(dimensions, 4)
    bw.write(entries, 14)

    ordered = br.read(1)
    bw.write(ordered, 1)
    if ordered:
        bw.write(br.read(5), 5)
        current = 0
        while current < entries:
            n = ilog(entries - current)
            number = br.read(n)
            bw.write(number, n)
            current += number
    else:
        sparse = br.read(1)
        values = []
        for _ in range(entries):
            if sparse:
                present = br.read(1)
                values.append(br.read(5) if present else None)
            else:
                values.append(br.read(5))
        cll = max(1, max(ilog(v) for v in values if v is not None))
        bw.write(cll, 3)
        bw.write(sparse, 1)
        for v in values:
            if sparse:
                bw.write(int(v is not None), 1)
            if v is not None:
                bw.write(v, cll)

    lookup_type = br.read(4)
    bw.write(lookup_type, 1)
    if lookup_type == 1:
        bw.write(br.read(32), 32)
        bw.write(br.read(32), 32)
        value_length = br.read(4)
        bw.write(value_length, 4)
        bw.write(br.read(1), 1)
        for _ in range(book_maptype1_quantvals(entries, dimensions)):
            bw.write(br.read(value_length + 1), value_length + 1)
    elif lookup_type != 0:
        raise WemParseError(f"lookup type {lookup_type} has no packed form")
    return bw.to_bytes()


def strip_setup_header(setup: bytes, channels: int,
                       packed_books: Optional[List[bytes]]) -> bytes:
    """Strip a spec Vorbis setup header into the Wwise form.

    packed_books: when a list is given, codebooks are converted to packed
    form, appended to the list, and replaced by 10-bit ids ("external"
    mode); when None they are copied in spec form ("inline" mode).
    """
    br = BitReader(setup)
    if br.read(8) != 5 or br.read(48) != int.from_bytes(b"vorbis", "little"):
        raise WemParseError("not a setup header")
    bw = BitWriter()

    codebook_count = br.read(8) + 1
    bw.write(codebook_count - 1, 8)
    for _ in range(codebook_count):
        if packed_books is not None:
            bw.write(len(packed_books), 10)
            packed_books.append(vorbis_codebook_to_packed(br))
        else:
            copy_vorbis_codebook(br, bw)

    # time-domain placeholders: dropped entirely in the wem form
    time_count = br.read(6) + 1
    for _ in range(time_count):
        if br.read(16) != 0:
            raise WemParseError("nonzero time transform")

    floor_count = br.read(6) + 1
    bw.write(floor_count - 1, 6)
    for _ in range(floor_count):
        if br.read(16) != 1:
            raise WemParseError("only floor type 1 strippable")
        partitions = br.read(5)
        bw.write(partitions, 5)
        classes = []
        for _ in range(partitions):
            c = br.read(4)
            bw.write(c, 4)
            classes.append(c)
        dims = []
        for _ in range((max(classes) if classes else -1) + 1):
            d = br.read(3)
            bw.write(d, 3)
            dims.append(d + 1)
            sub = br.read(2)
            bw.write(sub, 2)
            if sub:
                bw.write(br.read(8), 8)
            for _ in range(1 << sub):
                bw.write(br.read(8), 8)
        bw.write(br.read(2), 2)
        rangebits = br.read(4)
        bw.write(rangebits, 4)
        for c in classes:
            for _ in range(dims[c]):
                bw.write(br.read(rangebits), rangebits)

    residue_count = br.read(6) + 1
    bw.write(residue_count - 1, 6)
    for _ in range(residue_count):
        bw.write(br.read(16), 2)
        bw.write(br.read(24), 24)
        bw.write(br.read(24), 24)
        bw.write(br.read(24), 24)
        classifications = br.read(6) + 1
        bw.write(classifications - 1, 6)
        bw.write(br.read(8), 8)
        cascade = []
        for _ in range(classifications):
            low = br.read(3)
            bw.write(low, 3)
            flag = br.read(1)
            bw.write(flag, 1)
            high = 0
            if flag:
                high = br.read(5)
                bw.write(high, 5)
            cascade.append(high * 8 + low)
        for c in cascade:
            for _ in range(bin(c).count("1")):
                bw.write(br.read(8), 8)

    mapping_count = br.read(6) + 1
    bw.write(mapping_count - 1, 6)
    for _ in range(mapping_count):
        if br.read(16) != 0:
            raise WemParseError("bad mapping type")
        flag = br.read(1)
        bw.write(flag, 1)
        submaps = 1
        if flag:
            submaps = br.read(4) + 1
            bw.write(submaps - 1, 4)
        sp = br.read(1)
        bw.write(sp, 1)
        if sp:
            steps = br.read(8) + 1
            bw.write(steps - 1, 8)
            cbits = ilog(channels - 1)
            for _ in range(2 * steps):
                bw.write(br.read(cbits), cbits)
        if br.read(2) != 0:
            raise WemParseError("nonzero reserved")
        bw.write(0, 2)  # the wem form keeps the reserved field
        if submaps > 1:
            for _ in range(channels):
                bw.write(br.read(4), 4)
        for _ in range(3 * submaps):
            bw.write(br.read(8), 8)

    mode_count = br.read(6) + 1
    bw.write(mode_count - 1, 6)
    for _ in range(mode_count):
        bw.write(br.read(1), 1)
        if br.read(32) != 0:
            raise WemParseError("nonzero window/transform type")
        bw.write(br.read(8), 8)
    if br.read(1) != 1:
        raise WemParseError("missing framing bit")
    return bw.to_bytes()


def strip_audio_packet(payload: bytes, blockflags: List[bool],
                       mode_bits: int) -> bytes:
    """Drop the packet-type bit and (for long blocks) the window flags."""
    br = BitReader(payload)
    if br.read(1) != 0:
        raise WemParseError("not an audio packet")
    mode = br.read(mode_bits)
    if blockflags[mode]:
        br.read(2)
    bw = BitWriter()
    bw.write(mode, mode_bits)
    while br.remaining() > 0:
        take = min(br.remaining(), 4096)
        bw.write(br.read(take), take)
    return bw.to_bytes()


def _riff(chunks: List[Tuple[bytes, bytes]]) -> bytes:
    body = bytearray(b"WAVE")
    for cid, payload in chunks:
        body += cid + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            body += b"\x00"
    return b"RIFF" + struct.pack("<I", len(body)) + bytes(body)


def build_wem(headers: List[bytes], audio: List[Tuple[bytes, int]],
              channels: int, sr: int, variant: str,
              packed_books: Optional[List[bytes]] = None,
              mod_signal: int = 0x00) -> bytes:
    """Assemble a .wem from raw Vorbis packets in the given variant."""
    id_hdr, comment_hdr, setup_hdr = headers
    bs0_pow = id_hdr[28] & 0x0F
    bs1_pow = id_hdr[28] >> 4
    sample_count = audio[-1][1] if audio else 0
    avg_bps = sr // 4  # nominal; only informational in the rebuilt stream

    blockflags = _scan_setup_blockflags(setup_hdr, channels)
    mode_bits = ilog(len(blockflags) - 1)

    data = bytearray()
    if variant == "triad":
        setup_off = 0
        for h in headers:
            data += struct.pack("<II", len(h), 0) + h
        audio_off = len(data)
        for pkt, gran in audio:
            data += struct.pack("<II", len(pkt), gran) + pkt
    elif variant == "inline":
        stripped = strip_setup_header(setup_hdr, channels, None)
        setup_off = 0
        data += struct.pack("<HI", len(stripped), 0) + stripped
        audio_off = len(data)
        for pkt, gran in audio:
            data += struct.pack("<HI", len(pkt), gran) + pkt
    elif variant == "external":
        assert packed_books is not None
        stripped = strip_setup_header(setup_hdr, channels, packed_books)
        setup_off = 0
        data += struct.pack("<H", len(stripped)) + stripped
        audio_off = len(data)
        mod = mod_signal not in (0x4A, 0x4B, 0x69, 0x70)
        for pkt, _ in audio:
            if mod:
                pkt = strip_audio_packet(pkt, blockflags, mode_bits)
            data += struct.pack("<H", len(pkt)) + pkt
    else:
        raise ValueError(variant)

    def vorb_payload(size: int) -> bytes:
        # mirrors the generation-dependent field offsets (ww2ogg wwriff.cpp):
        # 0x2A keeps offsets at 0x10/0x14 + blocksizes at 0x28/0x29; the
        # older layouts keep offsets at 0x18/0x1C (+ blocksizes 0x30/0x31)
        v = bytearray(size)
        struct.pack_into("<I", v, 0x00, sample_count)
        if size == 0x2A:
            struct.pack_into("<I", v, 0x04, mod_signal)
            struct.pack_into("<I", v, 0x10, setup_off)
            struct.pack_into("<I", v, 0x14, audio_off)
            struct.pack_into("<I", v, 0x24, 0xDEADBEEF)  # uid
            v[0x28] = bs0_pow
            v[0x29] = bs1_pow
        else:
            struct.pack_into("<I", v, 0x18, setup_off)
            struct.pack_into("<I", v, 0x1C, audio_off)
            if size >= 0x32:
                v[0x30] = bs0_pow
                v[0x31] = bs1_pow
        return bytes(v)

    fmt_base = struct.pack("<HHIIHH", 0xFFFF, channels, sr, avg_bps, 0, 0)
    if variant == "external":
        # modern layout: vorb embedded in the fmt extra data at fmt+0x18
        fmt = fmt_base + struct.pack("<H", 0x30) + b"\x00" * 6 \
            + vorb_payload(0x2A)
        assert len(fmt) == 0x42
        chunks = [(b"fmt ", fmt), (b"data", bytes(data))]
    else:
        fmt = fmt_base + struct.pack("<H", 0)
        vsize = 0x28 if variant == "triad" else 0x32
        chunks = [(b"fmt ", fmt), (b"vorb", vorb_payload(vsize)),
                  (b"data", bytes(data))]
    return _riff(chunks)
