"""Mergeable sketches for the 100 TB path.

Exact `count(DISTINCT x)` forces a full shuffle of every distinct value;
a KMV (K-minimum-values) sketch shrinks that to k hashes per group and
stays mergeable across partitions — the pattern every large-scale
distinct-count rollup needs. Unlike Spark's built-in HyperLogLog
(`approx_count_distinct`), KMV over the engine's portable MD5 hash
family (functions/hashing.py) is *deterministic and cross-engine
reproducible*: the same input yields the same estimate in Spark, DuckDB,
or Python, so the sketch itself is oracle-checkable.

Estimator: with h(x) uniform on [0, 1) and h_(k) the k-th smallest
distinct hash, E[h_(k)] ≈ k / (D + 1)  ⇒  D̂ = (k - 1) / h_(k)
(the unbiased form; Bar-Yossef et al. 2002). Groups with fewer than k
distinct hashes report the exact count.

All arithmetic after hashing is int64→double conversion, division by a
power of two (exact), and IEEE division — identically rounded in every
engine, so estimates are bit-stable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from aeon_mecha_spark.functions.hashing import md5_long

_HASH_DOMAIN = float(2**60)  # md5_long range; power of two => exact double


def kmv_distinct(
    df: DataFrame,
    col: str | Column,
    keys: list[str],
    k: int = 64,
) -> DataFrame:
    """Per-group distinct-count estimate via a k-minimum-values sketch.

    Plan shape: project → dropDuplicates on (keys, hash) — partial
    map-side — → one window pass keeping the k smallest hashes per group
    → tiny aggregate. Shuffle volume is O(distinct hashes), further
    cut to O(k · groups) by the WindowGroupLimit pushdown.

    Returns (keys…, n_hashes, est_distinct): ``n_hashes`` < k means the
    group was below sketch capacity and ``est_distinct`` is exact.
    """
    c = F.col(col) if isinstance(col, str) else col
    hashed = df.select(*keys, md5_long(c.cast("string")).alias("_h")).dropDuplicates(
        [*keys, "_h"]
    )
    w = W.partitionBy(*keys).orderBy("_h")
    topk = hashed.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k)
    return topk.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_hashes"),
        F.when(F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double"))
        .otherwise(
            F.lit(float(k - 1)) / (F.max("_h").cast("double") / F.lit(_HASH_DOMAIN))
        )
        .alias("est_distinct"),
    )


def kmv_agg(col: str | Column, k: int = 64) -> Column:
    """KMV sketch state as a plain aggregate Column — the k smallest
    distinct hashes, sorted. Because it is just an aggregate expression,
    it drops into any groupBy — in particular a ContinuousAggregate's
    ``agg_factory``, which makes stored rollups carry re-aggregatable
    distinct counts: refresh recomputes open buckets' sketches, and
    ``kmv_merge`` rolls stored partials to any coarser grouping without
    rescanning facts."""
    c = F.col(col) if isinstance(col, str) else col
    return F.slice(F.array_sort(F.collect_set(md5_long(c.cast("string")))), 1, k)


def kmv_partial(
    df: DataFrame,
    col: str | Column,
    keys: list[str],
    k: int = 64,
) -> DataFrame:
    """Materializable KMV sketch state per group: the k smallest distinct
    hashes as a sorted array column ``kmv``.

    This is the re-aggregatable form: store one partial per fine bucket
    (e.g. per hour) in a rollup table, then ``kmv_merge`` to any coarser
    grouping without rescanning the facts — distinct counts become
    composable with ContinuousAggregate the way sums already are.
    State is exactly ≤ k int64s per group after the slice; the transient
    per-group ``collect_set`` is fine when per-bucket distinct
    cardinality is bounded (hour-bucket streams); for unbounded groups
    use ``kmv_distinct``'s WindowGroupLimit path.
    """
    return df.groupBy(*keys).agg(kmv_agg(col, k).alias("kmv"))


def kmv_merge(partials: DataFrame, keys: list[str], k: int = 64) -> DataFrame:
    """Merge sketch partials to a coarser grouping. Lossless: the k
    smallest of a union == the k smallest of the per-part k-smallest,
    so a merged sketch is bit-identical to sketching the raw union."""
    merged = F.slice(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("kmv")))), 1, k
    )
    return partials.groupBy(*keys).agg(merged.alias("kmv"))


def kmv_estimate(sketches: DataFrame, k: int = 64) -> DataFrame:
    """Distinct-count estimate from stored sketch state (same estimator
    and IEEE-only arithmetic as ``kmv_distinct``)."""
    n = F.size("kmv")
    est = F.when(n < k, n.cast("double")).otherwise(
        F.lit(float(k - 1))
        / (F.element_at("kmv", k).cast("double") / F.lit(_HASH_DOMAIN))
    )
    return sketches.withColumn("n_hashes", n.cast("long")).withColumn(
        "est_distinct", est
    ).drop("kmv")


def _cm_buckets(c: Column, depth: int, width: int) -> Column:
    """The (row, bucket) address array for one value — the single
    definition of the CM hash scheme, shared by sketch build and probe
    so they can never drift apart."""
    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                (md5_long(c.cast("string"), seed=i) % width).alias("bucket"),
            )
            for i in range(depth)
        ]
    )


def cm_partial(
    df: DataFrame,
    col: str | Column,
    keys: list[str] | None = None,
    depth: int = 2,
    width: int = 256,
) -> DataFrame:
    """Count-min sketch state per group: a ``(depth × width)`` grid of
    bucket counts as a long table ``(keys…, row, bucket, n)``.

    The frequency analogue of the KMV distinct sketch: exact per-term
    counts over 100 TB force a vocabulary-sized shuffle, while a CM
    sketch bounds state at depth·width counters per group and stays
    MERGEABLE — partials from any partitioning, time bucket, or corpus
    shard merge by plain addition, so stored rollups can carry term
    frequencies the way they carry sums. Estimates over-count only
    (collision bias ≤ ε·N with ε = e/width at the usual depth=⌈ln 1/δ⌉).

    Each depth row is an independent seeded hash from the portable MD5
    family, so the sketch content (not just the estimate) is
    deterministic and oracle-checkable in DuckDB with the same substr
    arithmetic. Plan: one map pass hashing each value ``depth`` times,
    a depth-way explode (a small constant row multiplier, not a data
    explosion), then one groupBy — map-side combinable.
    """
    keys = list(keys or [])
    c = F.col(col) if isinstance(col, str) else col
    exploded = df.select(*keys, F.explode(_cm_buckets(c, depth, width)).alias("rb")).select(
        *keys, F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket")
    )
    return exploded.groupBy(*keys, "row", "bucket").agg(
        F.count(F.lit(1)).alias("n")
    )


def cm_merge(partials: DataFrame, keys: list[str] | None = None) -> DataFrame:
    """Merge CM sketch partials to a coarser grouping: counts add.
    Lossless relative to sketching the concatenated input — the merged
    grid is identical, hence so is every estimate."""
    keys = list(keys or [])
    return partials.groupBy(*keys, "row", "bucket").agg(
        F.sum("n").alias("n")
    )


def cm_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str = "item",
    keys: list[str] | None = None,
    depth: int = 2,
    width: int = 256,
) -> DataFrame:
    """Point-frequency estimates from CM state: for each item, the MIN
    over depth rows of its bucket's count (missing buckets count 0).

    ``items`` is small (the candidates being probed — audit terms,
    suspected heavy hitters), so it broadcasts; the sketch is already
    tiny. Never under-estimates; over-estimates by colliding mass.
    Returns ``(keys…, item, est_count)``.
    """
    keys = list(keys or [])
    it = items.select(
        *keys,
        F.col(item_col).alias("item"),
        F.explode(_cm_buckets(F.col(item_col), depth, width)).alias("rb"),
    ).select(
        *keys, "item", F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket")
    )
    joined = it.join(sketch, [*keys, "row", "bucket"], "left").withColumn(
        "n", F.coalesce(F.col("n"), F.lit(0))
    )
    return joined.groupBy(*keys, "item").agg(F.min("n").cast("long").alias("est_count"))


def quantile_summary(
    df: DataFrame,
    value_col: str,
    keys: list[str],
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75),
) -> DataFrame:
    """Exact linear-interpolation quantiles per group (the reference's
    median-based ``timestamp_stats`` generalized — stats.py:36-38).

    Spark's ``percentile`` matches DuckDB's ``quantile_cont`` bit-for-bit
    (same h = p·(n−1) rank + linear interpolation in IEEE doubles). Exact
    quantiles sort each group; for 100 TB rollups swap in
    ``F.percentile_approx`` (mergeable GK sketch) at the same call site —
    same schema, bounded error, no sort.
    """
    aggs = [
        # round, not int(): int(0.57 * 100) == 56 under binary floats
        F.percentile(value_col, F.lit(q)).alias(f"q{round(q * 100):02d}")
        for q in quantiles
    ]
    return df.groupBy(*keys).agg(*aggs)


_BLOOM_BITS_PER_WORD = 32  # mask < 2^32 keeps shifts sign-safe in every engine


def _bloom_positions(c: Column, num_bits: int, num_hashes: int) -> Column:
    """Bit addresses for one value — one seeded portable MD5 per hash
    function, shared by build and probe so they can never drift."""
    return F.array(*[md5_long(c.cast("string"), seed=i) % num_bits for i in range(num_hashes)])


def bloom_partial(
    df: DataFrame,
    col: str | Column,
    num_bits: int = 8192,
    num_hashes: int = 4,
) -> DataFrame:
    """Bloom-filter membership state as a long table ``(word_idx, bits)``
    — word ``i`` holds bit positions [32i, 32i+32) as an OR-ed mask.

    The membership analogue of the KMV/CM sketches: an exact
    blocklist/seen-set join at 100 TB shuffles every key, while a Bloom
    filter bounds state at ``num_bits`` bits TOTAL, broadcasts to every
    executor, and never reports a false NEGATIVE — the property batch
    dedup-against-history needs (a false positive re-drops a seen-ish
    row; a false negative would leak a duplicate). Plan: one map pass
    hashing each value ``num_hashes`` times, a constant-factor explode,
    one bit_or groupBy — map-side combinable. Deterministic: built on
    the portable MD5 family, so the exact word values (not just the
    verdicts) are oracle-checkable in DuckDB.
    """
    c = F.col(col) if isinstance(col, str) else col
    pos = df.select(F.explode(_bloom_positions(c, num_bits, num_hashes)).alias("_p"))
    word = (F.col("_p") / _BLOOM_BITS_PER_WORD).cast("long")
    # call_function: the Python F.shiftleft only takes a literal shift
    # count; the SQL builtin accepts a column
    mask = F.call_function(
        "shiftleft", F.lit(1).cast("long"), (F.col("_p") % _BLOOM_BITS_PER_WORD).cast("int")
    )
    return (
        pos.select(word.alias("word_idx"), mask.alias("_m"))
        .groupBy("word_idx")
        .agg(F.bit_or("_m").alias("bits"))
    )


def bloom_merge(partials: DataFrame) -> DataFrame:
    """Merge Bloom partials built with the SAME (num_bits, num_hashes):
    bitwise OR per word. Lossless — the merged filter is bit-identical
    to building one filter over the concatenated input, so shards /
    days / corpus batches fold together without rescanning anything."""
    return partials.groupBy("word_idx").agg(F.bit_or("bits").alias("bits"))


def bloom_contains(
    df: DataFrame,
    col: str | Column,
    bloom: DataFrame,
    id_cols: list[str],
    num_bits: int = 8192,
    num_hashes: int = 4,
) -> DataFrame:
    """Probe a Bloom filter: ``(id_cols…, maybe_member)`` with
    ``maybe_member`` = 1 iff every hash position's bit is set (possible
    member / false positive), 0 = definitely absent.

    The filter is tiny (≤ num_bits/32 rows) so Spark broadcasts the
    probe join — the 100 TB side never shuffles. Probe rows explode to
    ``num_hashes`` positions and fold back with bool_and; a position
    whose word is absent from the state is an unset bit.
    """
    c = F.col(col) if isinstance(col, str) else col
    probe = df.select(*id_cols, F.explode(_bloom_positions(c, num_bits, num_hashes)).alias("_p"))
    probe = probe.select(
        *id_cols,
        (F.col("_p") / _BLOOM_BITS_PER_WORD).cast("long").alias("word_idx"),
        F.call_function(
            "shiftleft", F.lit(1).cast("long"), (F.col("_p") % _BLOOM_BITS_PER_WORD).cast("int")
        ).alias("_m"),
    )
    hit = F.coalesce(F.col("bits").bitwiseAND(F.col("_m")) == F.col("_m"), F.lit(False))
    return (
        probe.join(F.broadcast(bloom), "word_idx", "left")
        .select(*id_cols, hit.alias("_hit"))
        .groupBy(*id_cols)
        .agg(F.when(F.bool_and("_hit"), 1).otherwise(0).cast("int").alias("maybe_member"))
    )


def kmv_jaccard(
    sketches: DataFrame,
    key: str,
    k: int = 64,
) -> DataFrame:
    """Pairwise set-similarity estimates between groups, computed ONLY
    from their stored KMV sketch state — no rescan of the raw data.

    For each ordered group pair (a < b): ``L`` = the k smallest hashes
    of the union (which is itself a valid KMV of the union, so this
    composes losslessly with :func:`kmv_merge` partials), and
    ``n_common`` = |L ∩ A ∩ B|. Then ``est_jaccard`` = n_common / |L|
    (the standard KMV join estimator) and ``est_union`` = the usual
    (k-1)/max(L) cardinality estimate (exact below sketch capacity).

    Scale: group sketches are ≤ k int64s each, so P groups are P·k
    longs; the pairwise comparison runs over sketch state alone —
    estimating every pairwise overlap among thousands of corpus shards
    touches KBs per shard instead of re-shuffling the raw keys.
    Input: one row per group ``(key, kmv)`` from :func:`kmv_partial` /
    :func:`kmv_merge`. Output: ``(key_a, key_b, n_l, n_common,
    est_jaccard, est_union)``.
    """
    a = sketches.select(F.col(key).alias("key_a"), F.col("kmv").alias("_ka"))
    b = sketches.select(F.col(key).alias("key_b"), F.col("kmv").alias("_kb"))
    pairs = a.join(b, F.col("key_a") < F.col("key_b"))
    merged = F.slice(
        F.array_sort(F.array_distinct(F.concat(F.col("_ka"), F.col("_kb")))), 1, k
    )
    with_l = pairs.withColumn("_l", merged)
    n_l = F.size("_l")
    n_common = F.size(F.array_intersect(F.array_intersect(F.col("_l"), F.col("_ka")), F.col("_kb")))
    est_union = F.when(n_l < k, n_l.cast("double")).otherwise(
        F.lit(float(k - 1)) / (F.element_at("_l", k).cast("double") / F.lit(_HASH_DOMAIN))
    )
    return with_l.select(
        "key_a",
        "key_b",
        n_l.cast("long").alias("n_l"),
        n_common.cast("long").alias("n_common"),
        (n_common.cast("double") / n_l.cast("double")).alias("est_jaccard"),
        est_union.alias("est_union"),
    )


# ---------------------------------------------------------------------------
# Equi-width histogram sketch: the mergeable QUANTILE member of the
# sketch family (KMV = distinct, CM = frequency, Bloom = membership).
# One pass, O(bins) state per group, partials merge by vector add —
# the rollup-table pattern that answers "p99 latency per hour, any
# coarser grouping later" at 100 TB without re-scanning facts.
# Deterministic (integer bin counts + one fixed-form float estimate),
# so unlike GK/KLL it is cross-engine hash-verifiable.
# ---------------------------------------------------------------------------


def hist_partial(
    df: DataFrame,
    col: str | Column,
    keys: list[str],
    lo: float,
    hi: float,
    bins: int = 1024,
) -> DataFrame:
    """Materializable equi-width histogram state per group: one row per
    non-empty ``(keys…, bin)`` with its count.

    ``bin = clamp(floor(((v - lo) / (hi - lo)) * bins), 0, bins - 1)``
    — NULLs are dropped, out-of-range values clamp into the edge bins
    (their mass is counted but their position saturates; pick [lo, hi)
    from domain knowledge or a prior min/max scan). The float
    expression is written in exactly this operation order so an
    external SQL engine can reproduce bins bit-for-bit.

    Map-side partial aggregation means the shuffle carries at most
    ``bins`` rows per (group, input partition) — independent of row
    count.
    """
    c = F.col(col) if isinstance(col, str) else col
    span = float(hi) - float(lo)
    raw = F.floor(((c.cast("double") - F.lit(float(lo))) / F.lit(span)) * F.lit(int(bins)))
    b = F.least(F.greatest(raw, F.lit(0)), F.lit(int(bins) - 1)).cast("long")
    return (
        df.filter(c.isNotNull())
        .select(*keys, b.alias("bin"))
        .groupBy(*keys, "bin")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def hist_merge(partials: DataFrame, keys: list[str]) -> DataFrame:
    """Merge histogram partials (any union of :func:`hist_partial`
    outputs over the same ``[lo, hi) × bins`` grid): counts add."""
    return partials.groupBy(*keys, "bin").agg(F.sum("cnt").cast("long").alias("cnt"))


def hist_quantiles(
    sketch: DataFrame,
    keys: list[str],
    lo: float,
    hi: float,
    bins: int = 1024,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Quantile estimates from histogram state: per group, the value at
    rank ``ceil(q·n)`` located by cumulative bin counts, linearly
    interpolated inside its bin and rounded to 6 dp.

    Rank arithmetic is exact integers (q in micro-units, ceil via
    ``(n·qm + 999999) div 1e6``); only the final position estimate is
    float, in a fixed operation order, so results are
    shuffle-plan-independent and SQL-reproducible. Error is bounded by
    one bin width — (hi−lo)/bins — by construction.

    One window pass per group ordered by bin (≤ ``bins`` rows per
    group) then a tiny aggregate: state size, not data size.
    """
    span = float(hi) - float(lo)
    wcum = W.partitionBy(*keys).orderBy("bin")
    wall = W.partitionBy(*keys)
    s = sketch.withColumn("_cum", F.sum("cnt").over(wcum)).withColumn(
        "_n", F.sum("cnt").over(wall)
    )
    aggs = []
    for q in quantiles:
        qm = round(q * 1_000_000)
        t = ((F.col("_n") * F.lit(qm)) + F.lit(999_999)) / F.lit(1_000_000)
        t = F.floor(t).cast("long")
        before = F.col("_cum") - F.col("cnt")
        frac = (t - before).cast("double") / F.col("cnt").cast("double")
        est = F.round(
            F.lit(float(lo))
            + F.lit(span) * ((F.col("bin").cast("double") + frac) / F.lit(int(bins))),
            6,
        )
        crossing = (F.col("_cum") >= t) & (before < t)
        # p50/p90/p99 for whole-percent quantiles; exact micro-units
        # otherwise (p999000 for q=0.999) so nothing ever collides
        label = f"p{qm // 10000:02d}" if qm % 10000 == 0 else f"p{qm}"
        aggs.append(F.max(F.when(crossing, est)).alias(label))
    return s.groupBy(*keys).agg(
        F.max("_n").cast("long").alias("n"), *aggs
    )


# ---------------------------------------------------------------------------
# HyperLogLog — exactly-integral variant
# ---------------------------------------------------------------------------

HLL_M = 64
HLL_ALPHA_PPM = 709341  # round(1e6 * 0.7213 / (1 + 1.079/64))


def hll_rank_case(w_expr: str, width: int = 54) -> str:
    """SQL CASE computing the HLL rank (position of the first 1-bit from
    the left of a ``width``-bit value, 1-based; all-zero → width+1) by
    integer threshold comparisons — float log2 misrounds near powers of
    two (log2(2^53−1) rounds to exactly 53.0), so the ladder is the
    only engine-exact form. The SAME generated string is embedded in
    the Spark plan (via expr) and the SQL oracle."""
    whens = " ".join(
        f"WHEN {w_expr} >= {1 << (width - i)} THEN {i}" for i in range(1, width + 1)
    )
    return f"(CASE {whens} ELSE {width + 1} END)"


def hll_lc_counts(m: int = HLL_M) -> list[int]:
    """Linear-counting table ``round(m·ln(m/V))`` for V=1..m — integer
    count estimates precomputed in Python, literal in both engines (no
    runtime log, no division)."""
    import math

    return [round(m * math.log(m / v)) for v in range(1, m + 1)]


def hll_distinct(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    seed: int = 0,
) -> DataFrame:
    """HyperLogLog distinct-count per key (m=64 registers) with ZERO
    floating point: the register rank comes from an integer threshold
    ladder (never log2), the harmonic mean is cleared of fractions by
    factoring ``Σ2^(−Mⱼ) = Σ2^(maxM−Mⱼ) / 2^maxM`` (integers), the bias
    constant α and the small-range linear-counting correction
    ``m·ln(m/V)`` are literal tables — the estimate is bit-identical on
    any engine and partitioning, so the sketch itself is hash-gateable
    (KMV's cousin with O(m) state instead of O(k) values).

    Standard HLL flow: bucket = low 6 hash bits, rank = leading-run
    position in the remaining 54; small-range correction applies when
    raw < 5m/2 and empty registers exist.

    Plan: one groupBy to (keys, bucket) registers (max — map-side
    combinable), one per-key aggregate folding the ≤64 registers.
    Output: ``(keys…, n_registers, v_zeros, estimate)``.
    """
    return hll_estimate_registers(hll_partial(df, keys, value_col, seed=seed), keys)


def hll_partial(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    seed: int = 0,
) -> DataFrame:
    """HLL register state at the given key grain, LONG FORM
    ``(keys…, _j, _m)`` — the re-aggregatable sketch: merging registers
    upward is ``max`` per (coarser keys, _j), and
    ``hll_estimate_registers`` of the merged state equals the sketch
    built directly at the coarse grain (max is associative), which the
    q201 gate proves by hash-equality against the direct oracle."""
    h = md5_long(F.col(value_col).cast("string"), seed=seed)
    bucket = (h % HLL_M).alias("_j")
    rank = F.expr(hll_rank_case("(_h div 64)"))
    return (
        df.filter(F.col(value_col).isNotNull())
        .select(*keys, h.alias("_h"), bucket)
        .withColumn("_r", rank)
        .groupBy(*keys, "_j")
        .agg(F.max("_r").cast("long").alias("_m"))
    )


def hll_merge(regs: DataFrame, keys: list[str]) -> DataFrame:
    """Merge register states up to a coarser key grain (lossless)."""
    return regs.groupBy(*keys, "_j").agg(F.max("_m").cast("long").alias("_m"))


def hll_estimate_registers(regs: DataFrame, keys: list[str]) -> DataFrame:
    """The exact integral HLL estimate from a long-form register table
    (see ``hll_distinct`` for the arithmetic)."""
    wk = W.partitionBy(*keys)
    regs2 = regs.withColumn("_maxm", F.max("_m").over(wk)).withColumn(
        "_contrib",
        F.expr("CAST(shiftleft(CAST(1 AS BIGINT), CAST(_maxm - _m AS INT)) AS DECIMAL(38,0))"),
    )
    per_key = regs2.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("n_registers"),
        F.max("_m").cast("long").alias("_maxm"),
        F.sum("_contrib").cast("decimal(38,0)").alias("_snum_set"),
    )
    zeros = (F.lit(HLL_M) - F.col("n_registers")).cast("long")
    scored = (
        per_key.withColumn("v_zeros", zeros)
        .withColumn(
            "_snum",
            F.expr(
                "_snum_set + CAST(64 - n_registers AS DECIMAL(38,0)) "
                "* CAST(shiftleft(CAST(1 AS BIGINT), CAST(_maxm AS INT)) AS DECIMAL(38,0))"
            ),
        )
    )
    lc_arr = F.array(*[F.lit(v) for v in hll_lc_counts()])
    raw = (
        "CAST((CAST(709341 AS DECIMAL(38,0)) * 4096 * "
        "CAST(shiftleft(CAST(1 AS BIGINT), CAST(_maxm AS INT)) AS DECIMAL(38,0))) "
        "div (_snum * 1000000) AS BIGINT)"
    )
    est = F.when(
        (F.expr(raw) < F.lit(5 * HLL_M // 2)) & (F.col("v_zeros") > 0),
        F.element_at(lc_arr, F.col("v_zeros").cast("int")).cast("long"),
    ).otherwise(F.expr(raw))
    return scored.select(*keys, "n_registers", "v_zeros", est.alias("estimate"))
