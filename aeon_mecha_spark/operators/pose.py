"""SLEAP pose-stream operators (S7; /root/reference/aeon/dj_pipeline/
tracking.py:190-275; FIXTURES.md §5).

Pose rows: (experiment, device, time, identity, identity_likelihood,
part, x, y, part_likelihood). Reference invariants enforced here as
*validation relations* (empty ⇒ valid), instead of raise-on-iterate:

- duplicate (identity, part, time) rows are an error (tracking.py:234-241);
- exactly one ``anchor_``-prefixed part per model (tracking.py:208-216).

``include_model=False`` column pruning (tracking.py:190-196) is just a
``select`` — Catalyst prunes the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

POSE_COLUMNS = [
    "experiment_name", "device_name", "time", "identity",
    "identity_likelihood", "part", "x", "y", "part_likelihood",
]


def duplicate_timestamps(pose: DataFrame) -> DataFrame:
    """Validation relation: (identity, part, time) appearing more than
    once — must be empty (tracking.py:234-241)."""
    return (
        pose.groupBy("identity", "part", "time")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
    )


def anchor_parts(pose: DataFrame) -> DataFrame:
    """Distinct anchor parts; exactly one expected (tracking.py:208-216)."""
    return pose.filter(F.col("part").startswith("anchor_")).select("part").dropDuplicates()


def validate_pose(pose: DataFrame) -> None:
    """Raise on invariant violations — the ingest-time guard."""
    dups = duplicate_timestamps(pose).limit(1).collect()
    if dups:
        d = dups[0]
        raise ValueError(
            f"duplicate pose timestamps for identity={d['identity']!r} part={d['part']!r}"
        )
    anchors = anchor_parts(pose).collect()
    if len(anchors) != 1:
        raise ValueError(f"expected exactly one anchor part, found {[r.part for r in anchors]}")


def anchor_positions(pose: DataFrame) -> DataFrame:
    """Per-identity anchor trajectory — the position stream that feeds
    the geometry operators (tracking.py:290+)."""
    return pose.filter(F.col("part").startswith("anchor_")).select(
        "experiment_name", "device_name", "identity", "time", "x", "y", "part_likelihood"
    )


def identity_summary(pose: DataFrame) -> DataFrame:
    """Per-identity sample counts + likelihood stats (A8 distinct +
    dashboard aggs over pose)."""
    return pose.groupBy("identity").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("part").alias("n_parts"),
        F.round(
            F.sum(F.col("part_likelihood").cast("decimal(27,6)")).cast("double")
            / F.count("part_likelihood"),
            4,
        ).alias("mean_likelihood"),
    )
