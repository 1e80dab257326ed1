"""Time functions: HARP clock, epoch-dir parsing, chunk arithmetic.

The reference's whole data layout hangs off three time conventions
(SURVEY.md §1.2, §2.8):

- HARP timestamps: seconds since 1904-01-01 UTC (io_api.to_datetime,
  used at /root/reference/aeon/dj_pipeline/utils/ephys_utils.py:637-642).
- Epoch directory names in two formats: ``2026-04-15T09-03-01`` and
  ``2026-04-15T090301Z`` (/root/reference/aeon/dj_pipeline/utils/
  time_utils.py:6-17).
- 1-hour chunk windows: chunk_end = min(next hour boundary, epoch_end)
  (/root/reference/aeon/dj_pipeline/acquisition.py:500-511).

All are pure Catalyst expressions — no UDFs, fully codegen'd.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Seconds between 1904-01-01 and 1970-01-01 (17 leap years in 66).
HARP_EPOCH_OFFSET_S = -2_082_844_800  # unix epoch of 1904-01-01T00:00:00Z


def harp_to_timestamp(seconds: Column) -> Column:
    """HARP seconds-since-1904 → timestamp (µs precision, tz-naive/UTC).
    Parity: io_api.to_datetime (ephys_utils.py:637-642)."""
    micros = ((seconds + F.lit(float(HARP_EPOCH_OFFSET_S))) * 1_000_000.0)
    return F.timestamp_micros(F.round(micros, 0).cast("long"))


def timestamp_to_harp(ts: Column) -> Column:
    """timestamp → HARP seconds-since-1904 (double)."""
    return (F.unix_micros(ts) / 1_000_000.0) - F.lit(float(HARP_EPOCH_OFFSET_S))


def parse_epoch_dir(name: Column) -> Column:
    """Parse both epoch-dir formats (time_utils.py:6-17):
    ``%Y-%m-%dT%H-%M-%S`` and ``%Y-%m-%dT%H%M%SZ`` → timestamp."""
    return F.coalesce(
        F.try_to_timestamp(name, F.lit("yyyy-MM-dd'T'HH-mm-ss")),
        F.try_to_timestamp(name, F.lit("yyyy-MM-dd'T'HHmmss'Z'")),
    )


def round_us(ts: Column) -> Column:
    """Round to microseconds — MySQL datetime(6) parity
    (dj_pipeline/__init__.py:100-105). Spark timestamps are natively µs,
    so this is the identity; kept for API parity and for callers that
    carry ns-as-long columns."""
    return ts


def chunk_start(ts: Column, epoch_start: Column | None = None) -> Column:
    """Hour-floor, clamped up to epoch_start for an epoch's first chunk
    (acquisition.py:500-506)."""
    floored = F.date_trunc("hour", ts)
    if epoch_start is None:
        return floored
    return F.greatest(floored, epoch_start)


def chunk_end(ts: Column, epoch_end: Column | None = None) -> Column:
    """Next hour boundary after ts, capped at epoch_end
    (acquisition.py:503-511)."""
    nxt = F.date_trunc("hour", ts + F.expr("INTERVAL 1 HOUR"))
    if epoch_end is None:
        return nxt
    return F.least(nxt, F.coalesce(epoch_end, F.lit("2200-01-01").cast("timestamp")))


def duration_hours(start: Column, end: Column) -> Column:
    """Span in fractional hours (acquisition.py:289; ephys.py:757)."""
    return (F.unix_micros(end) - F.unix_micros(start)) / 3.6e9


def interval_overlaps(a_start: Column, a_end: Column, b_start: Column, b_end: Column, closed: bool = True) -> Column:
    """Interval-overlap predicate (spike_sorting.py:1340-1341; inclusive
    both ends matches onix_imu.py:89-134 chunk-selection semantics)."""
    if closed:
        return (a_start <= b_end) & (a_end >= b_start)
    return (a_start < b_end) & (a_end > b_start)
