"""Minimal pure-stdlib AVI (RIFF) demuxer + writer for MJPEG video.

Completes the vendored-codec family (pngcodec/jpegcodec/WAV): the
reference's video pipeline serves JPEG frames out of camera files
(aeon/dj_pipeline/webapps/video.py:47-55 pages via cv2.VideoCapture);
raw MJPEG byte streams already decode natively (multimodal.
split_mjpeg_frames + jpegcodec), and this module extends that to the
most common CONTAINER those frames arrive in — AVI, whose RIFF chunk
layout is simple enough to parse exactly with ``struct``:

    RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf …) …)
                LIST('movi' 00dc 00dc …) [idx1])

Scope (same honesty contract as the other vendored codecs): MJPEG
('MJPG'/'mjpg' fourcc, or raw JPEG bytes in the chunks) video stream 0
only; other codecs raise ``NotImplementedError`` NAMING the fourcc —
never silent wrong bytes. MP4/ISO-BMFF remains env-gated (its sample
tables are a different project). The writer emits spec-correct
fixed-rate MJPEG AVI for round-trip tests and demo fixtures.
"""

from __future__ import annotations

import struct

_VIDEO_CHUNK_SUFFIXES = (b"dc", b"db")


def _walk_chunks(buf: bytes, start: int, end: int):
    """Yield (fourcc, data_start, data_size) for each RIFF chunk in
    [start, end); chunk data is padded to even length per the spec."""
    i = start
    while i + 8 <= end:
        fourcc = buf[i : i + 4]
        (size,) = struct.unpack_from("<I", buf, i + 4)
        data_start = i + 8
        if data_start + size > end:
            break  # truncated tail: stop cleanly
        yield fourcc, data_start, size
        i = data_start + size + (size & 1)


def is_avi(payload: bytes) -> bool:
    return payload[:4] == b"RIFF" and payload[8:12] == b"AVI "


def probe_avi(payload: bytes) -> dict:
    """Parse the header lists: returns ``{codec, width, height,
    n_streams, usec_per_frame}`` without touching frame data."""
    if not is_avi(payload):
        raise ValueError("not a RIFF/AVI payload")
    info = {"codec": None, "width": None, "height": None,
            "n_streams": 0, "usec_per_frame": None}
    for fourcc, ds, size in _walk_chunks(payload, 12, len(payload)):
        if fourcc != b"LIST" or payload[ds : ds + 4] != b"hdrl":
            continue
        for f2, ds2, sz2 in _walk_chunks(payload, ds + 4, ds + size):
            if f2 == b"avih" and sz2 >= 40:
                info["usec_per_frame"], = struct.unpack_from("<I", payload, ds2)
                info["n_streams"], = struct.unpack_from("<I", payload, ds2 + 24)
                w, h = struct.unpack_from("<II", payload, ds2 + 32)
                info["width"], info["height"] = int(w), int(h)
            elif f2 == b"LIST" and payload[ds2 : ds2 + 4] == b"strl":
                for f3, ds3, sz3 in _walk_chunks(payload, ds2 + 4, ds2 + sz2):
                    if f3 == b"strh" and sz3 >= 8:
                        if payload[ds3 : ds3 + 4] == b"vids" and info["codec"] is None:
                            info["codec"] = payload[ds3 + 4 : ds3 + 8].decode(
                                "ascii", "replace"
                            )
    return info


def split_avi_frames(payload: bytes, max_frames: int | None = None) -> list[bytes]:
    """Extract the video frames of stream 0 from an AVI container:
    the ``00dc``/``00db`` chunks inside the ``movi`` list (recursing
    into ``rec `` grouping lists). MJPEG only — a non-MJPEG video
    fourcc raises ``NotImplementedError`` naming it. Some writers omit
    the JPEG EOI or prepend padding; each frame is validated to start
    with SOI after stripping leading zero padding."""
    if not is_avi(payload):
        raise ValueError("not a RIFF/AVI payload")
    codec = (probe_avi(payload)["codec"] or "").lower()
    if codec not in ("mjpg", "jpeg", "dmb1", ""):
        raise NotImplementedError(
            f"AVI video codec {codec!r} requires libraries not present in "
            "this environment (vendored decode covers MJPEG)"
        )

    frames: list[bytes] = []

    def collect(start: int, end: int) -> None:
        for fourcc, ds, size in _walk_chunks(payload, start, end):
            if max_frames and len(frames) >= max_frames:
                return
            if fourcc == b"LIST" and payload[ds : ds + 4] in (b"rec ", b"movi"):
                collect(ds + 4, ds + size)
            elif fourcc[:2] == b"00" and fourcc[2:4] in _VIDEO_CHUNK_SUFFIXES:
                data = payload[ds : ds + size].lstrip(b"\x00")
                if not data:
                    # Zero-size 00dc/00db chunks are spec-valid dropped/
                    # duplicate-frame placeholders — skip, don't abort.
                    continue
                if data[:2] != b"\xff\xd8":
                    raise NotImplementedError(
                        "AVI stream-0 chunk is not a JPEG frame (fourcc "
                        f"{codec!r}); only MJPEG AVIs decode natively"
                    )
                frames.append(data)

    for fourcc, ds, size in _walk_chunks(payload, 12, len(payload)):
        if fourcc == b"LIST" and payload[ds : ds + 4] == b"movi":
            collect(ds + 4, ds + size)
    return frames


def build_avi_mjpeg(frames: list[bytes], width: int, height: int, fps: int = 10) -> bytes:
    """Assemble a spec-correct fixed-rate MJPEG AVI from JPEG payloads
    (avih + strl(strh vids/MJPG + strf BITMAPINFOHEADER) + movi + idx1)
    — the deterministic fixture writer for round-trip tests."""

    def chunk(fourcc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) & 1 else b""
        return fourcc + struct.pack("<I", len(data)) + data + pad

    def lst(list_type: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", list_type + body)

    usec = 1_000_000 // max(1, fps)
    max_bytes = max((len(f) for f in frames), default=0)
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        usec, max_bytes * fps, 0, 0x10,  # usec/frame, bytes/sec, pad, HASINDEX
        len(frames), 0, 1, max_bytes,    # total frames, initial, streams, buf
        width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames),
                      max_bytes, 0xFFFFFFFF, 0, 0)
        + struct.pack("<HH", width, height)  # rcFrame right/bottom
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24,
        struct.unpack("<I", b"MJPG")[0], width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"".join(chunk(b"00dc", f) for f in frames)
    movi = lst(b"movi", movi_body)
    # idx1: one entry per frame (offset relative to movi list-type tag)
    off, entries = 4, []
    for f in frames:
        entries.append(b"00dc" + struct.pack("<III", 0x10, off, len(f)))
        off += 8 + len(f) + (len(f) & 1)
    idx1 = chunk(b"idx1", b"".join(entries))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body
