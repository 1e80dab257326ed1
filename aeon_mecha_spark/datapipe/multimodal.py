"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata structs —
the reference keeps heavy arrays out of rows too (probe binaries stay on
disk behind a file catalog, SURVEY §1.2). The Spark-side contract:

- a *media table*: (id, modality, meta struct, payload binary), payloads
  ≤ a few MB per row (bigger assets stay in object storage; the payload
  column then holds the key and ``with_payloads_loaded`` is the fetch);
- decode / feature-extraction as ``mapInPandas`` stages — Arrow-batched,
  one task per file split, schema declared up front;
- the actual codec calls (PIL/ffmpeg/torchaudio) are STUBBED here — the
  container has no media libraries. The stub raises NotImplementedError
  unless ``fake=True``, which produces deterministic fake features so the
  distributed plumbing (schemas, batching, partitioning) is testable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, modality string, width int, height int, "
    "duration_ms int, payload binary"
)

FEATURE_SCHEMA = "media_id bigint, modality string, n_bytes bigint, feature array<float>"


def _fake_feature(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder+encoder: hash-seeded
    pseudo-features. Keeps tests meaningful (stable, payload-sensitive)
    without media libs."""
    seed = int.from_bytes(hashlib.md5(payload).digest()[:8], "big") % (2**32)
    rng = np.random.default_rng(seed)
    return rng.standard_normal(dim).astype("float32")


def extract_features(media: DataFrame, dim: int = 16, fake: bool = False) -> DataFrame:
    """Decode + embed each payload via mapInPandas (one Arrow batch at a
    time — bounded executor memory regardless of table size).

    Real implementation decodes payload → pixels/samples → model features;
    STUB: raises unless ``fake=True`` (no PIL/ffmpeg in this container).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decoding requires image/audio libraries not present "
                    "in this environment; pass fake=True for the test path"
                )
            feats = [
                _fake_feature(p if isinstance(p, bytes) else bytes(p), dim)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": pdf["payload"].map(len).astype("int64"),
                    "feature": [f.tolist() for f in feats],
                }
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms)
    to extract — pure Catalyst (sequence+explode); the decode itself is
    the stubbed mapInPandas stage. Mirrors the reference's frame-server
    paging (video.py:13-62) as a set-oriented plan."""
    return media.filter(F.col("modality") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col("duration_ms") - 1, F.lit(0)), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )


def encode_frames_base64(media: DataFrame) -> DataFrame:
    """Frame-server payload encoding (F22, video.py:48-50): base64 the
    binary payload for JSON transport — pure Catalyst ``base64``; the
    JPEG re-encode itself is part of the stubbed decode stage."""
    return media.select(
        "media_id", "modality", F.base64(F.col("payload")).alias("payload_b64")
    )


def resize_plan(media: DataFrame, max_side: int = 256) -> DataFrame:
    """Image resize *plan*: target dimensions preserving aspect ratio —
    metadata math in Catalyst; pixel work is the stubbed decode stage."""
    scale = F.least(
        F.lit(float(max_side)) / F.col("width"), F.lit(float(max_side)) / F.col("height"), F.lit(1.0)
    )
    return media.filter(F.col("modality") == "image").select(
        "media_id",
        "width",
        "height",
        F.round(F.col("width") * scale, 0).cast("int").alias("target_width"),
        F.round(F.col("height") * scale, 0).cast("int").alias("target_height"),
    )
