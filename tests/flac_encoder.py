"""Minimal pure-Python FLAC *encoder* — test fixture for the native decoder.

Writes spec-compliant streams using VERBATIM or CONSTANT subframes plus an
optional FIXED order-1 + rice mode, with real CRC-8/CRC-16 frame checksums,
independent or mid/side stereo. Not for production (no compression worth the
name) — it exists so tests/test_flac.py can round-trip arbitrary PCM through
``native.decode_flac`` without shipping binary fixtures.
"""
from __future__ import annotations

import numpy as np


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def bits(self, value: int, k: int):
        for i in range(k - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.bytes.append(self.acc)
                self.acc = 0
                self.nbits = 0

    def sbits(self, value: int, k: int):
        self.bits(value & ((1 << k) - 1), k)

    def unary(self, q: int):
        self.bits(0, q) if q else None
        self.bits(1, 1)

    def align(self):
        if self.nbits:
            self.bits(0, 8 - self.nbits)

    def data(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.bytes)


def crc8(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b
        for _ in range(8):
            c = ((c << 1) ^ 0x07) & 0xFF if c & 0x80 else (c << 1) & 0xFF
    return c


def crc16(data: bytes) -> int:
    c = 0
    for b in data:
        c ^= b << 8
        for _ in range(8):
            c = ((c << 1) ^ 0x8005) & 0xFFFF if c & 0x8000 else (c << 1) & 0xFFFF
    return c


def _utf8_num(bw: BitWriter, n: int):
    if n < 0x80:
        bw.bits(n, 8)
    elif n < 0x800:
        bw.bits(0xC0 | (n >> 6), 8)
        bw.bits(0x80 | (n & 0x3F), 8)
    else:
        bw.bits(0xE0 | (n >> 12), 8)
        bw.bits(0x80 | ((n >> 6) & 0x3F), 8)
        bw.bits(0x80 | (n & 0x3F), 8)


def _rice_write(bw: BitWriter, v: int, param: int):
    z = (v << 1) if v >= 0 else (((-v) << 1) - 1)  # zigzag
    bw.unary(z >> param)
    bw.bits(z & ((1 << param) - 1), param)


def _subframe(bw: BitWriter, x: np.ndarray, bps: int, mode: str):
    bw.bits(0, 1)  # padding
    if mode == "constant":
        bw.bits(0, 6)
        bw.bits(0, 1)  # no wasted bits
        bw.sbits(int(x[0]), bps)
    elif mode == "fixed1":
        bw.bits(8 + 1, 6)  # FIXED order 1
        bw.bits(0, 1)
        bw.sbits(int(x[0]), bps)  # warmup
        res = np.diff(x.astype(np.int64))
        bw.bits(0, 2)   # rice method 0 (4-bit params)
        bw.bits(0, 4)   # partition order 0 → one partition
        param = 6
        bw.bits(param, 4)
        for v in res:
            _rice_write(bw, int(v), param)
    else:  # verbatim
        bw.bits(1, 6)
        bw.bits(0, 1)
        for v in x:
            bw.sbits(int(v), bps)


def encode_flac(pcm: np.ndarray, sr: int = 22050, bps: int = 16,
                block_size: int = 4096, subframe: str = "verbatim",
                stereo_mode: str = "independent") -> bytes:
    """pcm: int array (n,) mono or (n, 2) stereo in [-2^(bps-1), 2^(bps-1))."""
    pcm = np.asarray(pcm, np.int64)
    stereo = pcm.ndim == 2
    channels = 2 if stereo else 1
    n = len(pcm)

    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    si = BitWriter()
    si.bits(block_size, 16)  # min block
    si.bits(block_size, 16)  # max block
    si.bits(0, 24)           # min frame size (unknown)
    si.bits(0, 24)           # max frame size
    si.bits(sr, 20)
    si.bits(channels - 1, 3)
    si.bits(bps - 1, 5)
    si.bits(n, 36)
    for _ in range(16):
        si.bits(0, 8)        # md5 unset
    body = si.data()
    out += bytes([0x80 | 0x00]) + len(body).to_bytes(3, "big") + body

    for fi, start in enumerate(range(0, n, block_size)):
        blk = pcm[start: start + block_size]
        bs = len(blk)
        bw = BitWriter()
        bw.bits(0x3FFE, 14)
        bw.bits(0, 1)  # reserved
        bw.bits(0, 1)  # fixed blocksize strategy
        bw.bits(0b0111, 4)  # block size: 16-bit at end
        bw.bits(0, 4)       # sample rate: from STREAMINFO
        if stereo and stereo_mode == "mid_side":
            bw.bits(10, 4)  # mid/side
        else:
            bw.bits(channels - 1, 4)
        ss = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6, 32: 7}[bps]
        bw.bits(ss, 3)
        bw.bits(0, 1)
        _utf8_num(bw, fi)
        bw.bits(bs - 1, 16)
        # crc8 covers the header bytes up to (not incl.) the crc byte; header
        # so far is bit-aligned: 14+1+1+4+4+4+3+1 = 32 bits + utf8 + 16 = whole bytes
        bw.bits(crc8(bytes(bw.bytes)), 8)
        if stereo:
            if stereo_mode == "mid_side":
                left, right = blk[:, 0], blk[:, 1]
                mid = (left + right) >> 1
                side = left - right
                _subframe(bw, mid, bps, subframe)
                _subframe(bw, side, bps + 1, subframe)
            else:
                _subframe(bw, blk[:, 0], bps, subframe)
                _subframe(bw, blk[:, 1], bps, subframe)
        else:
            _subframe(bw, blk, bps, subframe)
        bw.align()
        bw.bits(crc16(bytes(bw.bytes)), 16)
        out += bw.data()
    return bytes(out)
