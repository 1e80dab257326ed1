"""Zarr compressed-intermediate source (S11; /root/reference/aeon/
dj_pipeline/utils/ephys_utils.py:24-72; docs/specs/SPEC_READ_COMPRESSED.md).

Reference semantics: every raw ``.bin`` may have a compressed ``.zarr``
twin; readers resolve the pair at read time preferring compressed
(prefer='zarr'), falling back per a preference matrix
(SPEC_READ_COMPRESSED.md:178-192).

Spark shape: twin resolution is a *catalog* operation over the file
listing (pure DataFrame — implemented here, tested); the decode stage is
``mapInPandas`` over resolved paths using the zarr library, which is NOT
in this container — gated behind an import-try with a clear error.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - environment-dependent
    import zarr  # noqa: F401

    HAS_ZARR = True
except Exception:  # pragma: no cover
    HAS_ZARR = False


def resolve_twins(listing: DataFrame, path_col: str = "file_path", prefer: str = "zarr") -> DataFrame:
    """Group ``X.bin`` / ``X.zarr`` twins by stem and pick per preference
    (SPEC_READ_COMPRESSED.md resolver matrix):

    prefer='zarr'  → zarr if present else bin;
    prefer='bin'   → bin if present else zarr;
    prefer='strict-zarr' → zarr only (rows without a zarr twin drop out).
    """
    p = F.col(path_col)
    stem = F.regexp_replace(p, r"\.(bin|zarr)$", "")
    ext = F.regexp_extract(p, r"\.(bin|zarr)$", 1)
    t = listing.select(p.alias("file_path"), stem.alias("stem"), ext.alias("ext"))
    g = t.groupBy("stem").agg(
        F.max(F.when(F.col("ext") == "zarr", F.col("file_path"))).alias("zarr_path"),
        F.max(F.when(F.col("ext") == "bin", F.col("file_path"))).alias("bin_path"),
    )
    if prefer == "zarr":
        resolved = F.coalesce(F.col("zarr_path"), F.col("bin_path"))
    elif prefer == "bin":
        resolved = F.coalesce(F.col("bin_path"), F.col("zarr_path"))
    elif prefer == "strict-zarr":
        resolved = F.col("zarr_path")
    else:
        raise ValueError(f"unknown preference {prefer!r}")
    out = g.withColumn("resolved_path", resolved).withColumn(
        "resolved_format", F.when(F.col("resolved_path").endswith(".zarr"), "zarr").otherwise("bin")
    )
    return out.filter(F.col("resolved_path").isNotNull())


def read_zarr_array(spark, resolved: DataFrame, columns: list[str]):  # pragma: no cover
    """Decode resolved zarr stores via mapInPandas. Requires the zarr
    library (absent in this container)."""
    if not HAS_ZARR:
        raise NotImplementedError(
            "zarr library not available in this environment; twin resolution "
            "(resolve_twins) is fully functional, decode requires `zarr`"
        )
    raise NotImplementedError("zarr decode to be implemented where zarr is installed")
