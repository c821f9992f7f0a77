"""Test fixture: minimal FLAC *encoder* in pure Python.

Emits spec-conformant FLAC streams using CONSTANT / VERBATIM / FIXED(0-2)
subframes with 4-bit Rice residual coding, independent or left/side stereo.
Exists ONLY so tests can roundtrip-validate the native C++ decoder
(dsjax/cpp/src/flac.cpp) without any external flac binary.
"""

from __future__ import annotations

import struct
from typing import List, Optional

import numpy as np


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, bits: int):
        value &= (1 << bits) - 1
        self.acc = (self.acc << bits) | value
        self.nbits += bits
        while self.nbits >= 8:
            self.nbits -= 8
            self.bytes.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def write_unary(self, q: int):
        for _ in range(q):
            self.write(0, 1)
        self.write(1, 1)

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


def _utf8_number(n: int) -> bytes:
    if n < 0x80:
        return bytes([n])
    out = []
    bits = n.bit_length()
    n_bytes = 2
    while bits > 5 * n_bytes + (7 - n_bytes) - 1 and n_bytes < 7:
        n_bytes += 1
    # simple 2-byte form is enough for tests (frame numbers < 2048)
    assert n < 2048
    return bytes([0xC0 | (n >> 6), 0x80 | (n & 0x3F)])


def _write_subframe(bw: BitWriter, x: np.ndarray, bps: int, mode: str):
    bw.write(0, 1)  # padding
    if mode == "constant":
        bw.write(0, 6)
        bw.write(0, 1)  # no wasted bits
        bw.write(int(x[0]), bps)
        return
    if mode == "verbatim":
        bw.write(1, 6)
        bw.write(0, 1)
        for v in x:
            bw.write(int(v), bps)
        return
    # fixed order 0/1/2 with one rice partition
    order = int(mode[-1])
    bw.write(8 + order, 6)
    bw.write(0, 1)
    for i in range(order):
        bw.write(int(x[i]), bps)
    if order == 0:
        resid = x.astype(np.int64)
    elif order == 1:
        resid = x[1:].astype(np.int64) - x[:-1].astype(np.int64)
    else:
        resid = (x[2:].astype(np.int64) - 2 * x[1:-1].astype(np.int64)
                 + x[:-2].astype(np.int64))
    # residual: method 0 (RICE 4-bit), partition order 0
    bw.write(0, 2)
    bw.write(0, 4)
    mean = max(1.0, float(np.mean(np.abs(resid))) if len(resid) else 1.0)
    param = min(14, max(0, int(np.ceil(np.log2(mean + 1)))))
    bw.write(param, 4)
    for r in resid:
        u = (int(r) << 1) ^ (int(r) >> 63)  # zigzag
        q, rem = u >> param, u & ((1 << param) - 1)
        assert q < 1000, "rice parameter too small for test data"
        bw.write_unary(q)
        if param:
            bw.write(rem, param)


def encode_flac(x: np.ndarray, sample_rate: int, bps: int = 16,
                block_size: int = 4096, modes: Optional[List[str]] = None,
                stereo_mode: str = "independent") -> bytes:
    """x: (n,) or (n, channels) int samples. Returns FLAC bytes."""
    if x.ndim == 1:
        x = x[:, None]
    n, channels = x.shape
    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    si = bytearray()
    si += struct.pack(">HH", block_size, block_size)
    si += b"\x00\x00\x00" * 2  # min/max frame size unknown
    si += bytes([
        (sample_rate >> 12) & 0xFF, (sample_rate >> 4) & 0xFF,
        ((sample_rate & 0xF) << 4) | ((channels - 1) << 1) | ((bps - 1) >> 4),
        (((bps - 1) & 0xF) << 4) | ((n >> 32) & 0xF),
        (n >> 24) & 0xFF, (n >> 16) & 0xFF, (n >> 8) & 0xFF, n & 0xFF])
    si += b"\x00" * 16  # md5
    out += bytes([0x80]) + len(si).to_bytes(3, "big") + si

    modes = modes or ["fixed2"]
    frame_no = 0
    pos = 0
    while pos < n:
        bs = min(block_size, n - pos)
        block = x[pos:pos + bs]
        hdr = BitWriter()
        hdr.write(0x3FFE, 14)
        hdr.write(0, 1)  # reserved
        hdr.write(0, 1)  # fixed blocksize stream
        hdr.write(7, 4)  # blocksize: 16-bit at end of header
        hdr.write(0, 4)  # sample rate: from STREAMINFO
        if channels == 2 and stereo_mode == "left_side":
            hdr.write(8, 4)
        else:
            hdr.write(channels - 1, 4)
        ss_code = {8: 1, 16: 4, 24: 6}[bps]
        hdr.write(ss_code, 3)
        hdr.write(0, 1)
        hdr.align()
        hdr_bytes = bytearray(hdr.bytes)
        hdr_bytes += _utf8_number(frame_no)
        hdr_bytes += struct.pack(">H", bs - 1)
        hdr_bytes.append(_crc8(bytes(hdr_bytes)))

        body = BitWriter()
        if channels == 2 and stereo_mode == "left_side":
            left = block[:, 0].astype(np.int64)
            side = block[:, 0].astype(np.int64) - block[:, 1].astype(np.int64)
            _write_subframe(body, left, bps, modes[frame_no % len(modes)])
            _write_subframe(body, side, bps + 1, modes[frame_no % len(modes)])
        else:
            for c in range(channels):
                _write_subframe(body, block[:, c].astype(np.int64), bps,
                                modes[frame_no % len(modes)])
        body.align()
        frame = bytes(hdr_bytes) + bytes(body.bytes)
        frame += struct.pack(">H", _crc16(frame))
        out += frame
        frame_no += 1
        pos += bs
    return bytes(out)
