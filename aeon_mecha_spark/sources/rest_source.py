"""External REST registry source (S12) — the PyRAT animal-registry sync
(/root/reference/aeon/dj_pipeline/subject.py:60-121,468+) re-expressed as
a driver-side paginated ingestion job writing a Parquet dimension table.

The HTTP client is injected (``fetch_page``), so the pipeline shape —
pagination loop, normalization, idempotent upsert into a ``Table`` — is
fully testable without a network; production plugs a real client in.
Registry sync is inherently driver-side work (a few thousand rows); the
*output* is a broadcastable dim table for the cluster.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from aeon_mecha_spark.pipeline.orchestrator import Table

# fetch_page(page_index) -> list[dict] (empty list = done)
FetchPage = Callable[[int], list[dict]]


def sync_registry(
    spark: SparkSession,
    table: Table,
    fetch_page: FetchPage,
    schema: str,
    max_pages: int = 10_000,
) -> int:
    """Paginate the external registry to exhaustion, then idempotently
    upsert into ``table`` (PK anti-join — re-sync never duplicates).
    Returns rows inserted."""
    rows: list[dict] = []
    for page in range(max_pages):
        batch = fetch_page(page)
        if not batch:
            break
        rows.extend(batch)
    if not rows:
        return 0
    df: DataFrame = spark.createDataFrame(rows, schema=schema)
    return table.insert(df)
