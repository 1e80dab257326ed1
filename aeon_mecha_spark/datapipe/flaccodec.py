"""Minimal pure-Python/numpy FLAC decoder + verbatim writer.

Completes the vendored audio story beside WAV/PCM: FLAC is the
dominant LOSSLESS compressed audio format in training corpora, and its
decode is pure bit-level arithmetic — a bit reader, four subframe
types, Rice residuals and four channel decorrelation modes — no
psychoacoustics, so an exact vendored decoder is feasible the same way
the PNG/JPEG ones were.

Supported (the mainstream encode surface): CONSTANT / VERBATIM /
FIXED(0-4) / LPC(1-32) subframes, 4- and 5-bit partitioned Rice with
the raw-escape, independent / left-side / right-side / mid-side
channels, 8/16/24-bit samples, UTF-8 frame numbers, wasted bits,
frame-header CRC-8 and frame CRC-16 VERIFIED. Out of scope (raise
``NotImplementedError`` naming the feature): 32-bit samples and
variable blocking strategy oddities beyond the spec basics.

Validation strategy (the S11 lesson — never validate a decoder only
against its own encoder): the test suite drives it three ways — a
HAND-ASSEMBLED constant-subframe file computed bit-by-bit from the
spec, a hand-derived FIXED-order-2 Rice stream, and round-trips of the
verbatim writer (whose encode path is raw bit packing, too simple to
hide a matching decode bug).
"""

from __future__ import annotations

import struct

import numpy as np

_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

_CRC8_POLY = 0x07
_CRC16_POLY = 0x8005


def _crc8(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ _CRC8_POLY) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ _CRC16_POLY) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _Bits:
    """MSB-first bit reader over a bytes buffer."""

    def __init__(self, buf: bytes, pos_bytes: int = 0):
        self.buf = buf
        self.pos = pos_bytes * 8  # absolute bit position

    def read(self, n: int) -> int:
        v = 0
        pos, buf = self.pos, self.buf
        for _ in range(n):
            byte = buf[pos >> 3]
            v = (v << 1) | ((byte >> (7 - (pos & 7))) & 1)
            pos += 1
        self.pos = pos
        return v

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def read_unary(self) -> int:
        q, pos, buf = 0, self.pos, self.buf
        while not (buf[pos >> 3] >> (7 - (pos & 7))) & 1:
            q += 1
            pos += 1
        self.pos = pos + 1
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        return self.pos >> 3


def _read_utf8_number(bits: _Bits) -> int:
    first = bits.read(8)
    if first < 0x80:
        return first
    n_follow = 0
    mask = 0x40
    while first & mask:
        n_follow += 1
        mask >>= 1
    v = first & (mask - 1)
    for _ in range(n_follow):
        v = (v << 6) | (bits.read(8) & 0x3F)
    return v


def _decode_residual(bits: _Bits, blocksize: int, order: int) -> list[int]:
    method = bits.read(2)
    if method > 1:
        raise NotImplementedError(f"FLAC residual coding method {method}")
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    po = bits.read(4)
    out: list[int] = []
    n_parts = 1 << po
    for part in range(n_parts):
        n = (blocksize >> po) - (order if part == 0 else 0)
        param = bits.read(plen)
        if param == escape:
            raw = bits.read(5)
            for _ in range(n):
                out.append(bits.read_signed(raw) if raw else 0)
        else:
            for _ in range(n):
                q = bits.read_unary()
                r = bits.read(param) if param else 0
                v = (q << param) | r
                out.append((v >> 1) ^ -(v & 1))
    return out


def _decode_subframe(bits: _Bits, blocksize: int, bps: int) -> np.ndarray:
    if bits.read(1):
        raise ValueError("FLAC subframe padding bit set")
    stype = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = 1 + bits.read_unary()
    eff = bps - wasted
    if stype == 0:  # CONSTANT
        v = bits.read_signed(eff)
        out = np.full(blocksize, v, dtype=np.int64)
    elif stype == 1:  # VERBATIM
        out = np.array([bits.read_signed(eff) for _ in range(blocksize)], dtype=np.int64)
    elif 8 <= stype <= 12:  # FIXED order 0-4
        order = stype - 8
        warm = [bits.read_signed(eff) for _ in range(order)]
        resid = _decode_residual(bits, blocksize, order)
        coefs = _FIXED_COEFFS[order]
        samples = list(warm)
        for r in resid:
            pred = sum(c * samples[-i - 1] for i, c in enumerate(coefs))
            samples.append(pred + r)
        out = np.array(samples, dtype=np.int64)
    elif stype >= 32:  # LPC order 1-32
        order = stype - 31
        warm = [bits.read_signed(eff) for _ in range(order)]
        precision = bits.read(4) + 1
        if precision == 16:
            raise ValueError("FLAC invalid LPC precision escape")
        shift = bits.read_signed(5)
        coefs = [bits.read_signed(precision) for _ in range(order)]
        resid = _decode_residual(bits, blocksize, order)
        samples = list(warm)
        for r in resid:
            acc = sum(c * samples[-i - 1] for i, c in enumerate(coefs))
            samples.append((acc >> shift) + r)
        out = np.array(samples, dtype=np.int64)
    else:
        raise NotImplementedError(f"FLAC subframe type {stype}")
    return out << wasted


_BLOCKSIZE_TABLE = {
    1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
    8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
    13: 8192, 14: 16384, 15: 32768,
}

_SAMPLE_SIZE_TABLE = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24}


def decode_flac(payload: bytes) -> tuple[np.ndarray, int, int]:
    """Decode a FLAC file → (int32 samples shaped (n, channels), rate,
    bits_per_sample) — integer samples; divide by 2^(bits−1) for the
    [-1, 1] float convention ``decode_wav`` uses."""
    if payload[:4] != b"fLaC":
        raise ValueError("not a FLAC payload (bad magic)")
    pos = 4
    streaminfo = None
    while pos + 4 <= len(payload):
        hdr = payload[pos]
        last, btype = hdr >> 7, hdr & 0x7F
        (size,) = struct.unpack(">I", b"\x00" + payload[pos + 1 : pos + 4])
        if btype == 0:
            streaminfo = payload[pos + 4 : pos + 4 + size]
        pos += 4 + size
        if last:
            break
    if streaminfo is None or len(streaminfo) < 34:
        raise ValueError("FLAC missing STREAMINFO")
    si = _Bits(streaminfo)
    si.read(16)  # min blocksize
    si.read(16)  # max blocksize
    si.read(24)
    si.read(24)
    rate = si.read(20)
    n_channels = si.read(3) + 1
    bps_si = si.read(5) + 1
    total = si.read(36)
    if bps_si > 24:
        raise NotImplementedError(f"FLAC {bps_si}-bit samples unsupported (8-24)")

    chans: list[list[np.ndarray]] = [[] for _ in range(n_channels)]
    got = 0
    while pos < len(payload) and (total == 0 or got < total):
        frame_start = pos
        bits = _Bits(payload, pos)
        sync = bits.read(14)
        if sync != 0x3FFE:
            raise ValueError("FLAC frame sync lost")
        bits.read(1)  # reserved
        bits.read(1)  # blocking strategy
        bs_code = bits.read(4)
        sr_code = bits.read(4)
        ch_code = bits.read(4)
        ss_code = bits.read(3)
        bits.read(1)  # reserved
        _read_utf8_number(bits)
        if bs_code == 6:
            blocksize = bits.read(8) + 1
        elif bs_code == 7:
            blocksize = bits.read(16) + 1
        else:
            blocksize = _BLOCKSIZE_TABLE[bs_code]
        if sr_code == 12:
            bits.read(8)
        elif sr_code in (13, 14):
            bits.read(16)
        if ss_code in (3, 7):
            raise NotImplementedError(
                f"FLAC frame sample-size code {ss_code} is reserved by the "
                "spec; refusing to guess bits-per-sample"
            )
        bps = _SAMPLE_SIZE_TABLE[ss_code] if ss_code else bps_si
        header_end = bits.byte_pos()
        if _crc8(payload[frame_start:header_end]) != bits.read(8):
            raise ValueError("FLAC frame header CRC-8 mismatch")

        if ch_code < 8:
            n_ch = ch_code + 1
            subs = [_decode_subframe(bits, blocksize, bps) for _ in range(n_ch)]
        elif ch_code == 8:  # left-side
            left = _decode_subframe(bits, blocksize, bps)
            side = _decode_subframe(bits, blocksize, bps + 1)
            subs = [left, left - side]
        elif ch_code == 9:  # right-side
            side = _decode_subframe(bits, blocksize, bps + 1)
            right = _decode_subframe(bits, blocksize, bps)
            subs = [right + side, right]
        elif ch_code == 10:  # mid-side
            mid = _decode_subframe(bits, blocksize, bps)
            side = _decode_subframe(bits, blocksize, bps + 1)
            # exact per spec: left = (2*mid + (side&1) + side) >> 1
            left = ((mid << 1) + (side & 1) + side) >> 1
            subs = [left, left - side]
        else:
            raise NotImplementedError(f"FLAC channel assignment {ch_code}")
        if len(subs) != n_channels:
            raise ValueError("FLAC frame channel count mismatch")
        bits.align()
        body_end = bits.byte_pos()
        (crc16,) = struct.unpack_from(">H", payload, body_end)
        if _crc16(payload[frame_start:body_end]) != crc16:
            raise ValueError("FLAC frame CRC-16 mismatch")
        pos = body_end + 2
        for c, s in enumerate(subs):
            chans[c].append(s)
        got += blocksize

    data = np.stack([np.concatenate(c) for c in chans], axis=1)
    if total:
        data = data[:total]
    return data.astype(np.int32), rate, bps_si


class _BitWriter:
    def __init__(self) -> None:
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        value &= (1 << n) - 1 if n else 0
        self.acc = (self.acc << n) | value
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.bytes.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)


def encode_flac_verbatim(samples: np.ndarray, rate: int, bits: int = 16) -> bytes:
    """Spec-correct FLAC writer using one VERBATIM frame per 4096
    samples — no prediction (raw bit packing), which makes it a
    trustworthy round-trip fixture source for the decoder."""
    samples = np.asarray(samples)
    if samples.ndim == 1:
        samples = samples[:, None]
    n, n_channels = samples.shape
    lo, hi = -(1 << (bits - 1)), (1 << (bits - 1)) - 1
    if samples.min() < lo or samples.max() > hi:
        raise ValueError(f"samples out of {bits}-bit range")

    bsz = 4096
    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(min(bsz, n) if n else bsz, 16)
    si.write(min(bsz, max(n, 1)), 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(n_channels - 1, 3)
    si.write(bits - 1, 5)
    si.write(n, 36)
    si.bytes.extend(b"\x00" * 16)  # md5 unset
    out += bytes([0x80]) + struct.pack(">I", len(si.bytes))[1:] + bytes(si.bytes)

    for fi, start in enumerate(range(0, n, bsz)):
        block = samples[start : start + bsz]
        blen = block.shape[0]
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed blocksize strategy
        w.write(7, 4)  # blocksize: 16-bit value-1 follows
        w.write(0, 4)  # sample rate: from STREAMINFO
        w.write(n_channels - 1, 4)
        w.write({8: 1, 12: 2, 16: 4, 20: 5, 24: 6}[bits], 3)
        w.write(0, 1)
        # UTF-8 frame number (frames are tiny in fixtures: <= 2^31)
        fn = fi
        if fn < 0x80:
            w.write(fn, 8)
        elif fn < 0x800:
            w.write(0xC0 | (fn >> 6), 8)
            w.write(0x80 | (fn & 0x3F), 8)
        else:
            w.write(0xE0 | (fn >> 12), 8)
            w.write(0x80 | ((fn >> 6) & 0x3F), 8)
            w.write(0x80 | (fn & 0x3F), 8)
        w.write(blen - 1, 16)
        w.align()
        hdr = bytes(w.bytes)
        hdr += bytes([_crc8(hdr)])
        body = _BitWriter()
        for c in range(n_channels):
            body.write(0, 1)
            body.write(1, 6)  # VERBATIM
            body.write(0, 1)
            for v in block[:, c]:
                body.write(int(v), bits)
        body.align()
        frame = hdr + bytes(body.bytes)
        frame += struct.pack(">H", _crc16(frame))
        out += frame
    return bytes(out)
