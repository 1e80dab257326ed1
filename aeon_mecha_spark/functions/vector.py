"""Vector math over ``array<float>`` columns — all JVM-side Catalyst
expressions (``aggregate``/``zip_with``), no Python UDFs in the hot path.

Used by the similarity-search and embedding-dedup operators (datapipe/).
At 100 TB the dot product runs inside whole-stage codegen per row pair;
the expensive part is pair generation, which the callers control
(broadcast for small query sets, LSH bucketing for big-big).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢbᵢ via zip_with + aggregate. Left-to-right summation order —
    bit-identical to DuckDB's list_dot_product for oracle checks."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
