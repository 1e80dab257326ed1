"""Custom stateful streaming operators via ``applyInPandasWithState``.

The reference's QC counters (cumulative dropped frames, qc.py:99) are
per-chunk batch computations; run continuously they need state that
survives micro-batches: the last hardware counter seen per device and
the running drop total.

State per key is O(1) (two longs), so a million devices cost megabytes —
the canonical shape for custom stateful operators at scale.

Semantics:
- rows within a micro-batch are globally sorted per device before
  counting (Arrow may split one group into several pandas chunks in
  arbitrary order);
- NULL counters are ignored (not poison);
- a batch whose maximum counter is below the stored last_counter is
  treated as a hardware reset (device reboot / wraparound): the counter
  sequence re-seeds and counting continues — drops across the reset
  boundary are not inferable and are not invented;
- late counters ≤ last_counter within a non-reset batch are ignored
  (already counted or duplicates).
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

    chunks = [pdf["hw_counter"] for pdf in pdfs]
    s = pd.concat(chunks).dropna().astype("int64").sort_values() if chunks else pd.Series([], dtype="int64")
    n = int(len(s))
    if n:
        if last_counter is not None and int(s.iloc[-1]) < last_counter:
            last_counter = None  # hardware reset: re-seed the sequence
        prev = last_counter
        live = s[s > last_counter] if last_counter is not None else s
        if len(live):
            d = live.diff()
            total_drops += int((d[d > 1] - 1).sum())
            if prev is not None and int(live.iloc[0]) > prev + 1:
                total_drops += int(live.iloc[0]) - prev - 1  # seam gap
            last_counter = int(live.iloc[-1])
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
