"""REST registry sync (S12), paren-strip (F11), base64 frames (F22)."""

from __future__ import annotations

import base64

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from aeon_mecha_spark.pipeline.orchestrator import Table
from aeon_mecha_spark.sources.rest_source import sync_registry


def test_sync_registry_paginated_idempotent(spark, tmp_path):
    pages = [
        [{"subject": "m1", "sex": "F"}, {"subject": "m2", "sex": "M"}],
        [{"subject": "m3", "sex": "U"}],
        [],
    ]
    calls = []

    def fetch(page):
        calls.append(page)
        return pages[page] if page < len(pages) else []

    t = Table("subjects", pk=["subject"], root=str(tmp_path))
    n = sync_registry(spark, t, fetch, schema="subject string, sex string")
    assert n == 3
    assert calls == [0, 1, 2]  # stops on empty page
    # re-sync with one new animal: only the delta inserts
    pages[2] = [{"subject": "m4", "sex": "F"}]
    pages.append([])
    n2 = sync_registry(spark, t, fetch, schema="subject string, sex string")
    assert n2 == 1
    assert t.read(spark).count() == 4


def test_strip_parens(spark):
    from aeon_mecha_spark.sources.metadata import strip_parens

    df = spark.createDataFrame([Row(c="weight(g)"), Row(c="angle(deg)x(2)"), Row(c="plain")])
    out = [r.s for r in df.select(strip_parens(F.col("c")).alias("s")).collect()]
    assert out == ["weight", "anglex", "plain"]


def test_encode_frames_base64(spark):
    from aeon_mecha_spark.datapipe import multimodal as MM

    media = spark.createDataFrame(
        [Row(media_id=1, modality="image", width=1, height=1, duration_ms=0, payload=b"\x00\xffJPEG")],
        schema=MM.MEDIA_SCHEMA,
    )
    row = MM.encode_frames_base64(media).collect()[0]
    assert base64.b64decode(row.payload_b64) == b"\x00\xffJPEG"
