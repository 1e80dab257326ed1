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


# ---------------------------------------------------------------------------
# Streaming HyperLogLog with batch parity
# ---------------------------------------------------------------------------

HLL_OUTPUT_SCHEMA = "key string, n_registers bigint, v_zeros bigint, estimate bigint"
HLL_STATE_SCHEMA = "regs array<long>"


def _hll_estimate(regs: list[int]) -> tuple[int, int, int]:
    """The EXACT integral estimate of datapipe/sketch.py::hll_distinct,
    re-derived from a register vector in Python ints — streaming and
    batch agree bit-for-bit because both run the same integer formula
    with the same literal tables."""
    from aeon_mecha_spark.datapipe.sketch import HLL_ALPHA_PPM, HLL_M, hll_lc_counts

    n_set = sum(1 for r in regs if r > 0)
    zeros = HLL_M - n_set
    maxm = max(regs)
    snum = sum(1 << (maxm - r) for r in regs)  # zeros contribute 2^maxM
    raw = (HLL_ALPHA_PPM * HLL_M * HLL_M * (1 << maxm)) // (snum * 1_000_000)
    if raw < 5 * HLL_M // 2 and zeros > 0:
        return n_set, zeros, hll_lc_counts()[zeros - 1]
    return n_set, zeros, raw


def _hll_fn(key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState):
    import hashlib

    from aeon_mecha_spark.datapipe.sketch import HLL_M

    regs = list(state.get[0]) if state.exists else [0] * HLL_M
    for pdf in pdfs:
        for v in pdf["value"].dropna():
            # identical to functions/hashing.py::md5_long(col, seed=0)
            h = int(hashlib.md5(f"0:{v}".encode()).hexdigest()[:15], 16)
            j = h % HLL_M
            w = h // HLL_M
            r = 55 - w.bit_length() if w else 55
            if r > regs[j]:
                regs[j] = r
    state.update((regs,))
    n_set, zeros, est = _hll_estimate(regs)
    yield pd.DataFrame(
        [{"key": key[0], "n_registers": n_set, "v_zeros": zeros, "estimate": est}]
    )


def streaming_hll_distinct(stream: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Continuously-maintained HyperLogLog distinct count per key with
    BATCH PARITY: state is the 64-register vector, updates are the same
    seeded-MD5 bucketing as ``datapipe/sketch.py::hll_distinct``, and
    the estimate is the same all-integer formula — so after any number
    of micro-batches the streaming answer equals the batch operator run
    over the union of the batches (pinned in tests). The 512-byte state
    per key is the whole point: exact streaming distinct needs
    unbounded sets; ``approx_count_distinct`` gives no cross-engine
    determinism.

    Emits one row per (key, micro-batch) (append mode — each
    micro-batch appends its refreshed estimate; the latest row per key
    is the current count).
    """
    from pyspark.sql import functions as F

    src = stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.col(value_col).cast("string").alias("value"),
    )
    return src.groupBy("key").applyInPandasWithState(
        _hll_fn,
        outputStructType=HLL_OUTPUT_SCHEMA,
        stateStructType=HLL_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
