"""Round-trip tests for the format-dispatching reader: the same rows
written as parquet / ORC / JSON-lines / CSV / TSV must load back
identically through catalog.read_any."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from aeon_mecha_spark import catalog

SCHEMA = "k bigint, name string, val double"
ROWS = [(1, "alpha", 1.5), (2, "beta", -2.25), (3, "gamma", 0.0)]


def _want(spark):
    return sorted(map(tuple, spark.createDataFrame(ROWS, SCHEMA).collect()))


@pytest.mark.parametrize("ext", ["parquet", "orc", "json", "csv", "tsv"])
def test_round_trip_every_format(spark, tmp_path, ext):
    df = spark.createDataFrame(ROWS, SCHEMA)
    path = str(tmp_path / f"t.{ext}")
    if ext == "tsv":
        df.coalesce(1).write.option("header", "true").option("sep", "\t").csv(path)
    elif ext in ("csv",):
        df.coalesce(1).write.option("header", "true").csv(path)
    elif ext == "json":
        df.coalesce(1).write.json(path)
    else:
        getattr(df.coalesce(1).write, ext)(path)
    # schema passed explicitly: the production path (no inference)
    got = catalog.read_any(spark, path, schema=SCHEMA)
    assert sorted(map(tuple, got.select("k", "name", "val").collect())) == _want(spark)


def test_unknown_extension_requires_fmt(spark, tmp_path):
    with pytest.raises(ValueError, match="unrecognized extension"):
        catalog.read_any(spark, str(tmp_path / "t.xyz"))


def test_explicit_fmt_overrides_extension(spark, tmp_path):
    df = spark.createDataFrame(ROWS, SCHEMA)
    path = str(tmp_path / "data.out")
    df.coalesce(1).write.json(path)
    got = catalog.read_any(spark, path, fmt="json", schema=SCHEMA)
    assert sorted(map(tuple, got.select("k", "name", "val").collect())) == _want(spark)
