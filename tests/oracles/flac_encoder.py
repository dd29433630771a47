"""Minimal FLAC encoder — TEST ORACLE ONLY.

Freshly written from the FLAC format spec so native/flacdec.cpp has a
self-contained round-trip partner (the image has no flac binary/library
except SDL_mixer's decoder, which can't encode).  Produces spec-valid
streams with correct CRC-8/CRC-16: constant, verbatim, and fixed-predictor
subframes with Rice-coded residuals, all four channel modes, fixed or
arbitrary block sizes.  Decoding these with any conformant decoder must
reproduce the input integers exactly (lossless).
"""

from __future__ import annotations

import numpy as np


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, bits: int) -> None:
        if bits == 0:
            return
        value &= (1 << bits) - 1
        self.acc = (self.acc << bits) | value
        self.nacc += bits
        while self.nacc >= 8:
            self.nacc -= 8
            self.buf.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def write_signed(self, value: int, bits: int) -> None:
        self.write(value & ((1 << bits) - 1), bits)

    def write_unary(self, q: int) -> None:
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self.nacc:
            self.write(0, 8 - self.nacc)

    def bytes(self) -> bytes:
        assert self.nacc == 0
        return bytes(self.buf)


def _crc8(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


_FIXED_COEF = {0: [], 1: [1], 2: [2, -1], 3: [3, -3, 1], 4: [4, -6, 4, -1]}


def _write_subframe(w: _BitWriter, x: np.ndarray, bps: int, kind: str) -> None:
    w.write(0, 1)  # padding
    if kind == "constant":
        assert (x == x[0]).all()
        w.write(0, 6)
        w.write(0, 1)  # no wasted bits
        w.write_signed(int(x[0]), bps)
        return
    if kind == "verbatim":
        w.write(1, 6)
        w.write(0, 1)
        for v in x:
            w.write_signed(int(v), bps)
        return
    order = int(kind.split("-")[1])  # "fixed-N"
    w.write(8 + order, 6)
    w.write(0, 1)
    for v in x[:order]:
        w.write_signed(int(v), bps)
    coef = _FIXED_COEF[order]
    res = x[order:].astype(np.int64).copy()
    for j, c in enumerate(coef):
        res -= c * x[order - 1 - j:len(x) - 1 - j].astype(np.int64)
    # one Rice partition (partition order 0), parameter fit to the residual
    zz = (np.abs(res * 2) - (res < 0)).astype(np.uint64)
    mean = float(zz.mean()) if len(zz) else 0.0
    param = 0
    while (1 << (param + 1)) < mean + 1 and param < 14:
        param += 1
    w.write(0, 2)   # method 0 (4-bit params)
    w.write(0, 4)   # partition order 0
    w.write(param, 4)
    for v in zz:
        v = int(v)
        w.write_unary(v >> param)
        w.write(v, param)


def encode_flac(pcm: np.ndarray, sample_rate: int, bps: int = 16,
                block_size: int = 4096, channel_mode: str = "auto",
                subframe: str = "fixed-2") -> bytes:
    """pcm: int array [n] or [n, ch] of bps-bit signed samples."""
    pcm = np.asarray(pcm)
    if pcm.ndim == 1:
        pcm = pcm[:, None]
    n, nch = pcm.shape
    out = bytearray(b"fLaC")
    # STREAMINFO (last metadata block)
    si = _BitWriter()
    si.write(block_size, 16)
    si.write(block_size, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(sample_rate, 20)
    si.write(nch - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    body = si.bytes() + b"\x00" * 16  # md5 unset
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    for frame_idx, start in enumerate(range(0, n, block_size)):
        blk = pcm[start:start + block_size]
        bs = len(blk)
        w = _BitWriter()
        w.write(0b11111111111110, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocksize strategy
        bs_codes = {192: 1, 576: 2, 1152: 3, 2304: 4, 4608: 5, 256: 8, 512: 9,
                    1024: 10, 2048: 11, 4096: 12, 8192: 13, 16384: 14, 32768: 15}
        bs_code = bs_codes.get(bs, 7)
        w.write(bs_code, 4)
        w.write(0, 4)  # sample rate: from STREAMINFO
        mode = channel_mode
        if mode == "auto":
            mode = "independent" if nch != 2 else "mid-side"
        ch_code = {"independent": nch - 1, "left-side": 8, "right-side": 9,
                   "mid-side": 10}[mode]
        w.write(ch_code, 4)
        ss_codes = {8: 1, 12: 2, 16: 4, 20: 5, 24: 6}
        w.write(ss_codes[bps], 3)
        w.write(0, 1)
        # UTF-8 frame number (fits one byte for tests)
        assert frame_idx < 128
        w.write(frame_idx, 8)
        if bs_code == 7:
            w.write(bs - 1, 16)
        w.align()
        hdr = w.bytes()
        w = _BitWriter()
        for b_ in hdr:
            w.write(b_, 8)
        w.write(_crc8(hdr), 8)

        if mode == "independent":
            chans = [(blk[:, c].astype(np.int64), bps) for c in range(nch)]
        elif mode == "left-side":
            chans = [(blk[:, 0].astype(np.int64), bps),
                     (blk[:, 0].astype(np.int64) - blk[:, 1].astype(np.int64), bps + 1)]
        elif mode == "right-side":
            chans = [(blk[:, 0].astype(np.int64) - blk[:, 1].astype(np.int64), bps + 1),
                     (blk[:, 1].astype(np.int64), bps)]
        else:  # mid-side
            l, r = blk[:, 0].astype(np.int64), blk[:, 1].astype(np.int64)
            chans = [((l + r) >> 1, bps), (l - r, bps + 1)]
        for x, cbps in chans:
            kind = subframe
            if kind.startswith("fixed") and len(x) <= int(kind.split("-")[1]):
                kind = "verbatim"
            if kind == "constant" and not (x == x[0]).all():
                kind = "verbatim"
            _write_subframe(w, x, cbps, kind)
        w.align()
        frame = w.bytes()
        w2 = _BitWriter()
        for b_ in frame:
            w2.write(b_, 8)
        w2.write(_crc16(frame), 16)
        out += w2.bytes()
    return bytes(out)
