"""Vendored pure numpy baseline JPEG codec (S17/F22 closer).

The reference's frame server pages video frames to the browser as
base64 **JPEG** (/root/reference/aeon/dj_pipeline/webapps/video.py:47-55,
via cv2.imencode('.jpg', …)); this container has no cv2/PIL, so the
distributed ``decode_images`` stage needs its own decoder the same way
round 9 vendored a PNG codec. Everything here derives from the public
ITU-T T.81 spec (baseline sequential DCT, Annex F) and its Annex K
example tables — no third-party code.

Scope (mirrors what the reference actually produces):

- ``decode_jpeg``: baseline sequential (SOF0; SOF1 accepted — identical
  entropy coding for 8-bit), grayscale or YCbCr with any 1/2 sampling
  factors (4:4:4, 4:2:2, 4:2:0), 8- or 16-bit quant tables, restart
  markers, byte stuffing. Progressive (SOF2), arithmetic coding
  (SOF9+), hierarchical, and 12-bit precision raise a clear
  ``NotImplementedError``.
- ``encode_jpeg``: the fixture generator — standard Annex K quant
  tables scaled by libjpeg's quality formula, standard Annex K Huffman
  tables, 4:4:4 or 4:2:0, optional restart intervals. Emits a plain
  JFIF stream any decoder can read.

Numerics: the T.81 spec bounds IDCT error but does not mandate an
implementation; this codec uses the exact orthonormal float64 DCT-II
matrix both ways, so encode→decode round-trips are within normal JPEG
quantization error and the DC-only analytic identity (flat block value
= dequantized_DC/8 + 128) holds bit-exactly — the spec-level unit check
that validates the decoder independently of the encoder.

Per-row Python work happens only inside Arrow-batched ``mapInPandas``
tasks (multimodal.decode_images), never on a data-sized driver path.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# spec constants (ITU-T T.81 Annex K examples — the de-facto standard tables)

ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)

QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

# (bits per code length 1..16, symbol values) per Annex K
DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
AC_LUMA = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
AC_CHROMA = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# orthonormal 8x8 DCT-II matrix: forward F = M @ B @ M.T equals the
# T.81 DCT definition; inverse B = M.T @ F @ M
_M = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        a = np.sqrt(0.125) if _u == 0 else np.sqrt(0.25)
        _M[_u, _x] = a * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


# ---------------------------------------------------------------------------
# Huffman tables

def _canonical_codes(bits: list[int], values: list[int]):
    """(length, code) pairs in canonical order per T.81 Annex C."""
    out, code = [], 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out.append((length, code, values[k]))
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], values: list[int]) -> dict:
    return {(ln, code): val for ln, code, val in _canonical_codes(bits, values)}


def _encode_table(bits: list[int], values: list[int]) -> dict:
    return {val: (code, ln) for ln, code, val in _canonical_codes(bits, values)}


# ---------------------------------------------------------------------------
# bit IO

class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing (F.1.2.3)
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1 bits
        return bytes(self.buf)


class _BitReader:
    """MSB-first reader over a destuffed entropy segment."""

    def __init__(self, data: bytes) -> None:
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def bit(self) -> int:
        if self.pos >= self.bits.size:
            raise ValueError("JPEG entropy segment exhausted mid-symbol")
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def huff(self, table: dict) -> int:
        code, length = 0, 0
        while length <= 16:
            code = (code << 1) | self.bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map received magnitude bits to signed value."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _magnitude(v: int) -> tuple[int, int]:
    """Inverse of EXTEND: (size, bits) for a signed coefficient."""
    size = int(abs(v)).bit_length()
    bits = v if v >= 0 else v + (1 << size) - 1
    return size, bits


# ---------------------------------------------------------------------------
# decoder

def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JPEG → (H, W, C) uint8 (C = 1 grayscale, 3 RGB).

    Parses DQT/SOF0/DHT/DRI/SOS per T.81 Annex B, Huffman-decodes the
    interleaved MCU stream (restart markers reset DC predictors),
    dequantizes, applies the exact float64 IDCT, upsamples chroma by
    replication, and converts YCbCr→RGB per the JFIF matrix.
    Progressive/arithmetic/12-bit streams raise ``NotImplementedError``.
    """
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    scan = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"JPEG marker expected at offset {pos}")
        marker = payload[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:  # SOI / RSTn: no length
            pos += 2
            continue
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        data = payload[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT — possibly several tables per segment
            i = 0
            while i < len(data):
                pq, tq = data[i] >> 4, data[i] & 0xF
                i += 1
                if pq == 0:
                    tbl = np.frombuffer(data, dtype=np.uint8, count=64, offset=i)
                    i += 64
                else:
                    tbl = np.frombuffer(data, dtype=">u2", count=64, offset=i)
                    i += 128
                qtables[tq] = tbl.astype(np.int64)
        elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 ext. sequential
            precision, h_img, w_img, ncomp = struct.unpack_from(">BHHB", data, 0)
            if precision != 8:
                raise NotImplementedError(f"JPEG {precision}-bit precision unsupported")
            if h_img == 0 or w_img == 0 or h_img * w_img > (1 << 26):
                # corrupt-header allocation guard: a flipped SOF byte must
                # not make an executor allocate gigabyte planes
                raise ValueError(f"implausible JPEG dimensions {w_img}x{h_img}")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = struct.unpack_from(">BBB", data, 6 + 3 * c)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF, "tq": tq})
            frame = {"h": h_img, "w": w_img, "comps": comps}
        elif marker == 0xC2:
            raise NotImplementedError("progressive JPEG (SOF2) unsupported")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG frame type SOF{marker - 0xC0} unsupported (baseline only)"
            )
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(data):
                tc, th = data[i] >> 4, data[i] & 0xF
                bits = list(data[i + 1 : i + 17])
                n = sum(bits)
                values = list(data[i + 17 : i + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = _decode_table(bits, values)
                i += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", data, 0)
        elif marker == 0xDA:  # SOS — baseline: single scan, then ECS
            ns = data[0]
            sel = {}
            for c in range(ns):
                cs, tt = struct.unpack_from(">BB", data, 1 + 2 * c)
                sel[cs] = (tt >> 4, tt & 0xF)
            scan = (sel, pos)
            break
        # APPn / COM / others: skipped
    if frame is None or scan is None:
        raise ValueError("JPEG missing SOF/SOS")
    sel, ecs_start = scan

    # split entropy-coded data into restart segments, destuffed
    segments: list[bytes] = []
    cur = bytearray()
    i = ecs_start
    while i < len(payload):
        b = payload[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        nxt = payload[i + 1] if i + 1 < len(payload) else 0xD9
        if nxt == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:
            segments.append(bytes(cur))
            cur = bytearray()
            i += 2
        else:  # EOI or next marker
            break
    segments.append(bytes(cur))

    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    planes = {
        c["id"]: np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"])) for c in comps
    }
    pred = {c["id"]: 0 for c in comps}
    seg_iter = iter(segments)
    reader = _BitReader(next(seg_iter))
    mcu_in_seg = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_in_seg == restart_interval:
                reader = _BitReader(next(seg_iter))
                pred = {c["id"]: 0 for c in comps}
                mcu_in_seg = 0
            for c in comps:
                dc_tbl = huff_dc[sel[c["id"]][0]]
                ac_tbl = huff_ac[sel[c["id"]][1]] if len(comps) > 0 else None
                q = qtables[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        size = reader.huff(dc_tbl)
                        diff = _extend(reader.receive(size), size)
                        pred[c["id"]] += diff
                        zz[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            rs = reader.huff(ac_tbl)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:  # ZRL
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC run past block end")
                            zz[k] = _extend(reader.receive(s), s)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[ZIGZAG] = zz * q[np.arange(64)]
                        block = _M.T @ coef.reshape(8, 8) @ _M + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu_in_seg += 1

    h_img, w_img = frame["h"], frame["w"]
    out_planes = []
    for c in comps:
        p = planes[c["id"]]
        if c["h"] < hmax:
            p = np.repeat(p, hmax // c["h"], axis=1)
        if c["v"] < vmax:
            p = np.repeat(p, vmax // c["v"], axis=0)
        out_planes.append(p[:h_img, :w_img])
    if len(out_planes) == 1:
        gray = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return gray[:, :, None]
    if len(out_planes) != 3:
        raise NotImplementedError(f"{len(out_planes)}-component JPEG unsupported")
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# encoder (fixture generator)

def _quality_scale(tbl: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg's public quality→scaling formula (jcparam.c semantics,
    re-derived from its documented behavior: scale = 5000/q below 50,
    200−2q above; entries clipped to [1, 255] for 8-bit baseline)."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((tbl * scale + 50) // 100, 1, 255).astype(np.int64)


def _fdct_quant(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """All 8x8 blocks of a padded plane → quantized zigzag coefficients
    with shape (blocks_y, blocks_x, 64)."""
    h, w = plane.shape
    by, bx = h // 8, w // 8
    blocks = plane.reshape(by, 8, bx, 8).transpose(0, 2, 1, 3) - 128.0
    coef = np.einsum("ux,abxy,vy->abuv", _M, blocks, _M)
    zz = coef.reshape(by, bx, 64)[:, :, ZIGZAG]
    qz = q[np.arange(64)][ZIGZAG][None, None, :]
    # round-half-away-from-zero, the symmetric convention every codec's
    # integer descale uses (np.round would banker's-round .5 cases)
    return np.sign(zz).astype(np.int64) * np.floor(
        np.abs(zz) / qz + 0.5
    ).astype(np.int64)


def _pad_edge(plane: np.ndarray, mult_y: int, mult_x: int) -> np.ndarray:
    h, w = plane.shape
    return np.pad(
        plane,
        ((0, (-h) % mult_y), (0, (-w) % mult_x)),
        mode="edge",
    )


def encode_jpeg(
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "4:4:4",
    restart_interval: int = 0,
) -> bytes:
    """Minimal baseline JFIF writer: 8-bit grayscale or RGB, Annex K
    quant (quality-scaled) + Huffman tables, 4:4:4 or 4:2:0. The
    fixture generator for :func:`decode_jpeg` — and a spec-independent
    inverse (its own DCT/quant path, so a shared bug cannot cancel)."""
    img = np.ascontiguousarray(img)
    if img.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8")
    if img.ndim == 2:
        img = img[:, :, None]
    h_img, w_img, nch = img.shape
    if nch not in (1, 3):
        raise ValueError("encode_jpeg expects 1 or 3 channels")
    if subsampling not in ("4:4:4", "4:2:2", "4:2:0"):
        raise ValueError("subsampling must be '4:4:4', '4:2:2' or '4:2:0'")
    ql = _quality_scale(QUANT_LUMA, quality)
    qc = _quality_scale(QUANT_CHROMA, quality)

    if nch == 1:
        comps = [{"id": 1, "h": 1, "v": 1, "tq": 0, "plane": img[:, :, 0].astype(np.float64)}]
        qts = {0: ql}
    else:
        f = img.astype(np.float64)
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsampling == "4:2:0":
            cbp = _pad_edge(cb, 2, 2)
            crp = _pad_edge(cr, 2, 2)
            cb = 0.25 * (cbp[0::2, 0::2] + cbp[1::2, 0::2] + cbp[0::2, 1::2] + cbp[1::2, 1::2])
            cr = 0.25 * (crp[0::2, 0::2] + crp[1::2, 0::2] + crp[0::2, 1::2] + crp[1::2, 1::2])
            hs, vs = 2, 2
        elif subsampling == "4:2:2":  # horizontal-only chroma halving
            cbp = _pad_edge(cb, 1, 2)
            crp = _pad_edge(cr, 1, 2)
            cb = 0.5 * (cbp[:, 0::2] + cbp[:, 1::2])
            cr = 0.5 * (crp[:, 0::2] + crp[:, 1::2])
            hs, vs = 2, 1
        else:
            hs, vs = 1, 1
        comps = [
            {"id": 1, "h": hs, "v": vs, "tq": 0, "plane": y},
            {"id": 2, "h": 1, "v": 1, "tq": 1, "plane": cb},
            {"id": 3, "h": 1, "v": 1, "tq": 1, "plane": cr},
        ]
        qts = {0: ql, 1: qc}

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w_img // (8 * hmax))
    mcuy = -(-h_img // (8 * vmax))
    # pad each plane to exactly the MCU grid it must cover
    for c in comps:
        target_h = mcuy * 8 * c["v"]
        target_w = mcux * 8 * c["h"]
        p = c["plane"]
        p = np.pad(
            p,
            ((0, target_h - p.shape[0]), (0, target_w - p.shape[1])),
            mode="edge",
        )
        c["zz"] = _fdct_quant(p, qts[c["tq"]])

    enc_dc = {0: _encode_table(*DC_LUMA), 1: _encode_table(*DC_CHROMA)}
    enc_ac = {0: _encode_table(*AC_LUMA), 1: _encode_table(*AC_CHROMA)}
    for c in comps:
        c["td"] = 0 if c["id"] == 1 else 1

    def encode_block(w: _BitWriter, zz: np.ndarray, pred: int, td: int) -> int:
        dc = int(zz[0])
        size, bits = _magnitude(dc - pred)
        code, ln = enc_dc[td][size]
        w.write(code, ln)
        if size:
            w.write(bits, size)
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = enc_ac[td][0xF0]  # ZRL
                w.write(code, ln)
                run -= 16
            s, bits = _magnitude(v)
            code, ln = enc_ac[td][(run << 4) | s]
            w.write(code, ln)
            w.write(bits, s)
            run = 0
        if run:
            code, ln = enc_ac[td][0x00]  # EOB
            w.write(code, ln)
        return dc

    chunks: list[bytes] = []
    writer = _BitWriter()
    pred = {c["id"]: 0 for c in comps}
    mcu_in_seg = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_in_seg == restart_interval:
                chunks.append(writer.flush())
                chunks.append(bytes([0xFF, 0xD0 + rst]))
                rst = (rst + 1) % 8
                writer = _BitWriter()
                pred = {c["id"]: 0 for c in comps}
                mcu_in_seg = 0
            for c in comps:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = c["zz"][my * c["v"] + by, mx * c["h"] + bx]
                        pred[c["id"]] = encode_block(writer, zz, pred[c["id"]], c["td"])
            mcu_in_seg += 1
    chunks.append(writer.flush())
    entropy = b"".join(chunks)

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = [b"\xff\xd8"]  # SOI
    out.append(seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"))
    for tq, tbl in qts.items():
        out.append(seg(0xDB, bytes([tq]) + bytes(int(v) for v in tbl[np.arange(64)][ZIGZAG])))
    sof = struct.pack(">BHHB", 8, h_img, w_img, len(comps))
    for c in comps:
        sof += struct.pack(">BBB", c["id"], (c["h"] << 4) | c["v"], c["tq"])
    out.append(seg(0xC0, sof))
    dht = b""
    tables = [(0, 0, DC_LUMA), (1, 0, AC_LUMA)]
    if len(comps) > 1:
        tables += [(0, 1, DC_CHROMA), (1, 1, AC_CHROMA)]
    for tc, th, (bits, values) in tables:
        dht += bytes([(tc << 4) | th]) + bytes(bits) + bytes(values)
    out.append(seg(0xC4, dht))
    if restart_interval:
        out.append(seg(0xDD, struct.pack(">H", restart_interval)))
    sos = bytes([len(comps)])
    for c in comps:
        sos += struct.pack(">BB", c["id"], (c["td"] << 4) | c["td"])
    sos += b"\x00\x3f\x00"  # Ss, Se, Ah/Al (baseline fixed)
    out.append(seg(0xDA, sos))
    out.append(entropy)
    out.append(b"\xff\xd9")  # EOI
    return b"".join(out)
