"""Table catalog: named Parquet tables + temp-view registration.

Mirrors the reference's two catalogs — the DataJoint relational schema
(aeon/dj_pipeline/*.py table classes) and the raw-stream reader registry
(streams.py StreamType/DeviceType) — as a flat name→path map over Parquet.
At 100 TB this is where a metastore (HMS/Glue/Unity) would plug in; the
API stays the same.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# The driver-provided TPC-H-ish benchmark tables (TESTDATA.md).
TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one catalog table. Plain ``spark.read.parquet`` so Catalyst
    keeps predicate pushdown / column pruning / partition pruning."""
    return spark.read.parquet(table_path(sf_dir, name))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every testdata table as a temp view (for the SQL API)."""
    dfs = load_all(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs


# extension -> (spark format, default reader options)
_FORMATS: dict[str, tuple[str, dict]] = {
    ".parquet": ("parquet", {}),
    ".orc": ("orc", {}),
    ".json": ("json", {}),
    ".jsonl": ("json", {}),
    ".ndjson": ("json", {}),
    ".csv": ("csv", {"header": "true", "inferSchema": "true"}),
    ".tsv": ("csv", {"header": "true", "inferSchema": "true", "sep": "\t"}),
}


def read_any(
    spark: SparkSession,
    path: str,
    fmt: str | None = None,
    schema=None,
    **options,
) -> DataFrame:
    """Format-dispatching scan: parquet / ORC / JSON(-lines) / CSV / TSV
    by file extension (or explicit ``fmt``), all via Spark's native
    (JVM, vectorized, pushdown-capable) sources — a corpus delivered in
    any of the common lake formats loads through one entry point with
    the same downstream plan.

    Pass ``schema`` for production scans (inference reads the data
    twice and, for CSV/JSON, samples types that may drift per shard);
    extra ``options`` go straight to the DataFrameReader.
    """
    if fmt is None:
        ext = os.path.splitext(path.rstrip("/"))[1].lower()
        if ext not in _FORMATS:
            raise ValueError(
                f"read_any: unrecognized extension {ext!r}; pass fmt= explicitly "
                f"(known: {sorted(_FORMATS)})"
            )
        fmt, defaults = _FORMATS[ext]
    else:
        # map aliases ('tsv', 'jsonl', 'ndjson') to the real Spark
        # format + its defaults; unknown names pass through verbatim so
        # any registered data source still works
        fmt, defaults = _FORMATS.get("." + fmt.lower(), (fmt, {}))
        defaults = dict(defaults)
    opts = {**defaults, **options}
    reader = spark.read.format(fmt).options(**opts)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)
