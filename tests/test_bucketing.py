"""Bucketed co-located join: the join between two tables bucketed on the
same key must plan with NO shuffle (Exchange) on either side."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import Row

from aeon_mecha_spark.pipeline import bucketing as B


def plan_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_exchange(spark):
    a = spark.createDataFrame([Row(k=i, v=float(i)) for i in range(1000)])
    b = spark.createDataFrame([Row(k=i, w=f"x{i}") for i in range(1000)])
    B.write_bucketed(a, "bkt_a", ["k"], num_buckets=8, sort_cols=["k"])
    B.write_bucketed(b, "bkt_b", ["k"], num_buckets=8, sort_cols=["k"])
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = B.read_table(spark, "bkt_a").join(B.read_table(spark, "bkt_b"), "k")
            p = plan_str(j)
            assert "SortMergeJoin" in p
            assert "Exchange" not in p  # co-located: no shuffle either side
            assert j.count() == 1000
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        B.drop_table(spark, "bkt_a")
        B.drop_table(spark, "bkt_b")
