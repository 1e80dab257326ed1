"""FLAC decoder tests — three independent validation axes (the S11
lesson: never validate a decoder only against its own encoder):

1. hand-assembled spec-level streams (constant / fixed / LPC subframes,
   Rice residuals derived bit-by-bit on paper, stereo decorrelation),
2. known-answer CRC check values from the CRC catalogue,
3. verbatim-writer round-trips (raw bit packing on the encode side).
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from aeon_mecha_spark.datapipe import flaccodec as fc
from aeon_mecha_spark.datapipe.flaccodec import _BitWriter, _crc8, _crc16


def test_crc_known_answers():
    # CRC-8 poly 0x07 init 0 ("CRC-8/SMBUS") and CRC-16 poly 0x8005
    # init 0 unreflected ("CRC-16/BUYPASS") catalogue check values
    assert _crc8(b"123456789") == 0xF4
    assert _crc16(b"123456789") == 0xFEE8


def _streaminfo(n, rate, channels, bits, blocksize):
    w = _BitWriter()
    w.write(blocksize, 16)
    w.write(blocksize, 16)
    w.write(0, 24)
    w.write(0, 24)
    w.write(rate, 20)
    w.write(channels - 1, 3)
    w.write(bits - 1, 5)
    w.write(n, 36)
    w.bytes.extend(b"\x00" * 16)
    return b"fLaC" + bytes([0x80]) + struct.pack(">I", len(w.bytes))[1:] + bytes(
        w.bytes
    )


def _frame_header(w, blocksize, channels_code, bits_code):
    w.write(0x3FFE, 14)
    w.write(0, 1)
    w.write(0, 1)
    w.write(7, 4)  # blocksize: 16-bit value-1 follows
    w.write(0, 4)  # rate from STREAMINFO
    w.write(channels_code, 4)
    w.write(bits_code, 3)
    w.write(0, 1)
    w.write(0, 8)  # frame number 0 (UTF-8 single byte)
    w.write(blocksize - 1, 16)


def _finish_frame(header_and_body: _BitWriter) -> bytes:
    header_and_body.align()
    raw = bytes(header_and_body.bytes)
    return raw + struct.pack(">H", _crc16(raw))


def _with_crc8(hdr_writer: _BitWriter) -> _BitWriter:
    hdr_writer.align()
    crc = _crc8(bytes(hdr_writer.bytes))
    hdr_writer.write(crc, 8)
    return hdr_writer


def test_constant_subframe_hand_assembled():
    # 4-sample mono 8-bit constant value -3; every bit placed per spec
    w = _BitWriter()
    _frame_header(w, 4, 0, 1)  # 1 channel, bits code 1 = 8-bit
    _with_crc8(w)
    w.write(0, 1)  # subframe padding bit
    w.write(0, 6)  # CONSTANT
    w.write(0, 1)  # no wasted bits
    w.write(-3 & 0xFF, 8)
    payload = _streaminfo(4, 8000, 1, 8, 4) + _finish_frame(w)
    dec, rate, bits = fc.decode_flac(payload)
    assert rate == 8000 and bits == 8
    assert dec[:, 0].tolist() == [-3, -3, -3, -3]


def test_fixed_order2_rice_hand_derived():
    # samples [10, 12, 13, 13, 11]: warmup 10, 12; order-2 predictor
    # 2*prev - prev2 gives residuals [-1, -1, -2]; rice param 1 zigzags
    # them to 1, 1, 3 -> codes '11' '11' '011'
    w = _BitWriter()
    _frame_header(w, 5, 0, 1)
    _with_crc8(w)
    w.write(0, 1)
    w.write(10, 6)  # FIXED order 2 (8 + 2)
    w.write(0, 1)
    w.write(10, 8)  # warmup
    w.write(12, 8)
    w.write(0, 2)  # residual method: 4-bit rice
    w.write(0, 4)  # partition order 0
    w.write(1, 4)  # rice parameter 1
    for code, nbits in ((0b11, 2), (0b11, 2), (0b011, 3)):
        w.write(code, nbits)
    payload = _streaminfo(5, 8000, 1, 8, 5) + _finish_frame(w)
    dec, _, _ = fc.decode_flac(payload)
    assert dec[:, 0].tolist() == [10, 12, 13, 13, 11]


def test_lpc_order1_hand_derived():
    # samples [5, 7, 6]: LPC order 1, coef [1], shift 0 -> pred = prev;
    # residuals [2, -1] zigzag to 4, 1; rice param 3 -> '1'+'100', '1'+'001'
    w = _BitWriter()
    _frame_header(w, 3, 0, 1)
    _with_crc8(w)
    w.write(0, 1)
    w.write(32, 6)  # LPC order 1 (31 + 1)
    w.write(0, 1)
    w.write(5, 8)  # warmup
    w.write(3, 4)  # precision - 1 -> 4-bit coefficients
    w.write(0, 5)  # shift 0
    w.write(1, 4)  # coefficient +1
    w.write(0, 2)
    w.write(0, 4)
    w.write(3, 4)  # rice parameter 3
    w.write(0b1100, 4)  # 2 -> zigzag 4: q=0 ('1') + r=100
    w.write(0b1001, 4)  # -1 -> zigzag 1: q=0 ('1') + r=001
    payload = _streaminfo(3, 8000, 1, 8, 3) + _finish_frame(w)
    dec, _, _ = fc.decode_flac(payload)
    assert dec[:, 0].tolist() == [5, 7, 6]


@pytest.mark.parametrize(
    "ch_code,subs,expect",
    [
        # left-side: left=5, side=left-right=2 -> right=3
        (8, [(5, 8), (2, 9)], [5, 3]),
        # right-side: side=2, right=3 -> left=5
        (9, [(2, 9), (3, 8)], [5, 3]),
        # mid-side: mid=(5+3)>>1=4, side=2 -> left=5, right=3
        (10, [(4, 8), (2, 9)], [5, 3]),
    ],
)
def test_stereo_decorrelation_hand_assembled(ch_code, subs, expect):
    w = _BitWriter()
    _frame_header(w, 2, ch_code, 1)
    _with_crc8(w)
    for value, width in subs:
        w.write(0, 1)
        w.write(0, 6)  # CONSTANT
        w.write(0, 1)
        w.write(value & ((1 << width) - 1), width)
    payload = _streaminfo(2, 8000, 2, 8, 2) + _finish_frame(w)
    dec, _, _ = fc.decode_flac(payload)
    assert dec.tolist() == [expect, expect]


def test_crc_corruption_detected():
    s = np.arange(64).reshape(-1, 1)
    payload = bytearray(fc.encode_flac_verbatim(s, 8000, bits=16))
    payload[-10] ^= 0x01  # flip a bit in the last frame body
    with pytest.raises(ValueError, match="CRC"):
        fc.decode_flac(bytes(payload))


def test_verbatim_roundtrip_shapes_and_bits():
    rng = np.random.default_rng(7)
    for ch in (1, 2):
        for bits in (8, 16, 24):
            s = rng.integers(
                -(1 << (bits - 1)), (1 << (bits - 1)) - 1, (5000, ch)
            ).astype(np.int64)
            dec, rate, b = fc.decode_flac(
                fc.encode_flac_verbatim(s, 44100, bits=bits)
            )
            assert (rate, b) == (44100, bits)
            assert np.array_equal(dec, s)


def test_guards_name_the_feature():
    with pytest.raises(ValueError, match="magic"):
        fc.decode_flac(b"RIFF" + b"\x00" * 40)
    s = np.zeros((16, 1), dtype=np.int64)
    payload = bytearray(fc.encode_flac_verbatim(s, 8000, bits=16))
    # patch STREAMINFO bits-per-sample to 32 (bits-1=31: low 3 bits of
    # byte 12 within streaminfo + high 2 of byte 13)
    # streaminfo payload starts at offset 8; bps field spans bits 103-107
    # simpler: re-encode via writer with bits=32 is refused by range
    # check, so patch: byte at offset 8+12 holds rate[4:]..ch..bps high
    b20 = payload[8 + 12]
    payload[8 + 12] = (b20 & 0b11111000) | 0b111  # bps_hi -> 11111 with next bit
    payload[8 + 13] = (payload[8 + 13] & 0x3F) | 0xC0
    with pytest.raises((NotImplementedError, ValueError)):
        fc.decode_flac(bytes(payload))


def test_extract_features_flac_path(spark):
    from aeon_mecha_spark.datapipe import multimodal

    t = np.arange(4000)
    wave = (np.sin(2 * np.pi * 440 * t / 8000) * 20000).astype(np.int64)
    payload = fc.encode_flac_verbatim(wave.reshape(-1, 1), 8000, bits=16)
    media = spark.createDataFrame(
        [(300, "audio", 0, 0, 500, bytearray(payload))],
        schema=multimodal.MEDIA_SCHEMA,
    )
    out = multimodal.extract_features(media, dim=12).collect()
    assert len(out) == 1
    feat = out[0]["feature"]
    assert len(feat) == 12
    # duration rides in the last slot: 4000 / 8000 = 0.5 s
    assert abs(feat[-1] - 0.5) < 1e-6
