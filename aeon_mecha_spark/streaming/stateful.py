"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's QC counters (cumulative dropped frames, qc.py:99) are
per-chunk batch computations; run continuously they need state that
survives micro-batches: the last hardware counter seen per device and
the running drop total. ``transformWithState``-style logic expressed with
``applyInPandasWithState`` — per-key pandas batches in, explicit state
handle, timeout-free.

State per key is O(1) (two longs), so a million devices cost megabytes —
the canonical shape for custom stateful operators at scale.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "device string, batch_rows bigint, last_counter bigint, total_drops bigint"
)
STATE_SCHEMA = "last_counter bigint, total_drops bigint"


def _qc_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (device,) = key
    if state.exists:
        last_counter, total_drops = state.get
    else:
        last_counter, total_drops = None, 0
    n = 0
    for pdf in pdfs:
        pdf = pdf.sort_values("hw_counter")
        for c in pdf["hw_counter"]:
            c = int(c)
            if last_counter is not None and c > last_counter + 1:
                total_drops += c - last_counter - 1
            if last_counter is None or c > last_counter:
                last_counter = c
            n += 1
    state.update((last_counter, total_drops))
    yield pd.DataFrame(
        [
            {
                "device": device,
                "batch_rows": n,
                "last_counter": last_counter,
                "total_drops": total_drops,
            }
        ]
    )


def streaming_drop_counter(frames: DataFrame) -> DataFrame:
    """Continuous dropped-frame counter: input stream of (device,
    hw_counter, ...) → one row per (device, micro-batch) with the running
    totals. State = (last_counter, total_drops) per device."""
    return frames.groupBy("device").applyInPandasWithState(
        _qc_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
