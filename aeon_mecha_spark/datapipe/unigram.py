"""Unigram-LM (SentencePiece-shape) tokenizer: learn + encode.

The second half of the tokenizer surface next to BPE (Kudo 2018,
"Subword Regularization"; Kudo & Richardson 2018, SentencePiece): a
vocabulary of variable-length pieces with log-probabilities, applied by
Viterbi decoding — segment each word into the piece sequence of maximal
total log-probability. Llama/T5-class pipelines tokenize with exactly
this model, so corpus accounting under it belongs in the engine beside
``apply_bpe_merges``.

Deterministic re-expression (the repo's exactness conventions):

- **Hard-EM (Viterbi-EM), fixed rounds, fixed vocab.** The paper's
  trainer runs full EM with vocabulary pruning; the noise-free
  deterministic limit used here seeds the vocabulary once (all corpus
  characters + the top-``vocab_size`` multi-character substrings by
  weighted occurrence count, ties by piece string) and re-estimates
  piece probabilities for ``rounds`` rounds from Viterbi counts — the
  same fixed-round convention as ``bpe_learn`` / ``kmeans_train``.
- **Integer micro-nats everywhere.** Piece log-probs quantize with the
  established DSIR rule ``floor(ln((2c+1)/(2T+V))·10⁶ + ½)`` (one
  double ``ln`` per piece, identical expression shape in the DuckDB
  oracle); the Viterbi DP then runs in exact BIGINT arithmetic, so the
  chosen segmentation — argmax with ties broken toward the smallest
  backpointer (the longest final piece) — is bit-identical in any
  engine.
- **Bounded DP window.** Words are lowercase whitespace tokens,
  chunked into ``window``-character blocks (SentencePiece's
  max-sentence-length split, applied at the word level); pieces are at
  most ``max_piece_len`` characters. The DP over one chunk is a fixed
  ``window × max_piece_len`` table, unrolled into Catalyst columns —
  no recursion, no Python in the row path.
- **OOV.** Single-character spans missing from the vocabulary score
  ``UNK_LP_MICRO`` (SentencePiece's unk piece), so every position is
  reachable and encoding with a fixed vocabulary never fails.

Plan shape (100 TB): ``unigram_learn`` aggregates the corpus ONCE into
the distinct-chunk frequency table (one shuffle, ~10⁷ rows regardless
of corpus size), persists it, and aggregates its span grain once more
into a persisted round-invariant ``(chunk, span-ordinal)`` table (r14);
each round is then pure map-side DP over that table (literal lp array
indexed by piece ordinal), one piece-grain count aggregate, and a
vocabulary-sized collect (the k-means/IRLS trained-model
materialization class). ``unigram_encode`` with a FIXED vocabulary runs
the DP per distinct chunk and joins scores back onto the chunk
occurrences (AQE picks the join strategy — broadcast when the DP table
is actually small).

Reference anchor: the reference has no tokenizer (its pipeline is
ephys/behavior); this extends the SURVEY §2.10 extension surface the
same way bpe.py does (class X1/X4 registries).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# log-prob assigned to out-of-vocabulary single characters (micro-nats)
UNK_LP_MICRO = -20_000_000
# defaults shared by the q284/q285 gates and their SQL oracles
WINDOW = 12
MAX_PIECE_LEN = 4


def _chunks(docs: DataFrame, text_col: str, window: int) -> DataFrame:
    """Lowercase whitespace words, split into ``window``-char blocks:
    one output row per (doc row, word, block). Columns: ``chunk``."""
    words = docs.select(
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("_w")
    ).filter(F.col("_w") != "")
    return words.select(
        F.explode(
            F.expr(
                f"transform(sequence(0, (length(_w) - 1) div {window}), "
                f"k -> substring(_w, k * {window} + 1, {window}))"
            )
        ).alias("chunk")
    )


def _span_key(j, i, window: int):
    return j * (window + 1) + i


def _spans_array(word: str, max_piece_len: int) -> Column:
    """All candidate spans of one chunk as ``struct(j, i, piece)`` —
    ``j`` 0-based start, ``i`` 1-based end, ``i-j ≤ max_piece_len``."""
    return F.expr(
        f"flatten(transform(sequence(1, length({word})), i -> "
        f"transform(sequence(greatest(i - {max_piece_len}, 0) + 1, i), s -> "
        f"struct(s - 1 AS j, i AS i, substring({word}, s, i - s + 1) AS piece))))"
    )


def _viterbi_cols(
    df: DataFrame, window: int, max_piece_len: int, want_pieces: bool
) -> DataFrame:
    """Viterbi over ``(chunk, _n, _m)`` where ``_m`` maps span key
    ``j·(window+1)+i`` → piece log-prob (micro-nats, BIGINT).

    The forward pass and the backpointer walk are each ONE
    higher-order ``aggregate`` fold — constant-size expression trees
    evaluated iteratively per row at runtime (an unrolled
    column-per-position chain feeds the optimizer's alias substitution
    an exponential tree; the fold sidesteps that and costs O(n·L) per
    chunk regardless of plan depth).

    Adds ``score`` (total log-prob of the best segmentation),
    ``n_pieces``, and — when ``want_pieces`` — ``pieces`` (array, in
    order). Ties: maximal score, then smallest backpointer ``j`` (the
    longest final piece) at every position — the exact rule the SQL
    oracle replays with chained materialized CTEs, so segmentations
    match bit-for-bit."""
    kw = window + 1

    def cand(k: int) -> str:
        # extend the best path at j = i-k by piece chunk[j..i)
        return (
            f"IF(i - {k} >= 0, element_at(acc, i - {k} + 1).b "
            f"+ element_at(_m, (i - {k}) * {kw} + i), CAST(NULL AS BIGINT))"
        )

    ks = list(range(1, max_piece_len + 1))
    best = (
        f"greatest({', '.join(cand(k) for k in ks)})"
        if len(ks) > 1
        else cand(ks[0])
    )
    # ascending j = descending k; first hit wins → smallest j on ties
    bp_branches = " ".join(
        f"WHEN {cand(k)} = ({best}) THEN i - {k}" for k in reversed(ks)
    )
    fwd = (
        f"aggregate(sequence(1, _n), "
        f"array(named_struct('b', CAST(0 AS BIGINT), 'p', 0)), "
        f"(acc, i) -> array_append(acc, named_struct("
        f"'b', {best}, 'p', CASE {bp_branches} END)))"
    )
    cur = df.withColumn("_fwd", F.expr(fwd))
    cur = cur.withColumn("score", F.expr("element_at(_fwd, _n + 1).b"))
    back = (
        f"aggregate(sequence(1, {window}), "
        f"named_struct('pos', _n, 'pcs', CAST(array() AS array<string>)), "
        f"(acc, t) -> IF(acc.pos > 0, named_struct("
        f"'pos', element_at(_fwd, acc.pos + 1).p, "
        f"'pcs', array_append(acc.pcs, substring(chunk, "
        f"element_at(_fwd, acc.pos + 1).p + 1, "
        f"acc.pos - element_at(_fwd, acc.pos + 1).p))), acc), "
        f"acc -> reverse(acc.pcs))"
    )
    if want_pieces:
        cur = cur.withColumn("pieces", F.expr(back))
        cur = cur.withColumn("n_pieces", F.size("pieces").cast("long"))
    else:
        cur = cur.withColumn("n_pieces", F.expr(f"size({back})").cast("long"))
    return cur.drop("_fwd")


def _with_span_map(
    chunks: DataFrame,
    vocab: list[tuple[str, int]],
    spark,
    window: int,
    max_piece_len: int,
) -> DataFrame:
    """Attach ``_n`` and the span→log-prob map ``_m`` to a distinct
    ``(chunk, …)`` table: explode spans, broadcast-join the (tiny)
    vocabulary, coalesce missing single-char spans to ``UNK_LP_MICRO``,
    re-aggregate per chunk. Multi-char spans not in the vocabulary are
    dropped (unreachable edges)."""
    vdf = spark.createDataFrame(vocab, "piece string, lp long")
    carried = [c for c in chunks.columns if c != "chunk"]
    spans = chunks.select(
        "*", F.explode(_spans_array("chunk", max_piece_len)).alias("sp")
    ).select("*", "sp.j", "sp.i", "sp.piece")
    joined = spans.join(F.broadcast(vdf), "piece", "left").withColumn(
        "_lp",
        F.coalesce(
            F.col("lp"),
            F.when(F.col("i") - F.col("j") == 1, F.lit(UNK_LP_MICRO)),
        ),
    )
    key = (F.col("j") * (window + 1) + F.col("i")).cast("int")
    return (
        joined.filter(F.col("_lp").isNotNull())
        .groupBy("chunk", *carried)
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct(key.alias("k"), F.col("_lp").alias("v")))
            ).alias("_m")
        )
        .withColumn("_n", F.length("chunk").cast("int"))
    )


def _lp_expr(c, t, v: int) -> Column:
    """The DSIR micro-nat quantization (one double ln, half-up)."""
    return F.expr(
        f"CAST(floor(ln((2 * {c} + 1) / CAST(2 * {t} + {v} AS DOUBLE)) "
        f"* 1000000.0 + 0.5) AS BIGINT)"
    )


def unigram_seed(
    chunks: DataFrame, vocab_size: int, max_piece_len: int
) -> DataFrame:
    """Seed vocabulary: every corpus character, plus the top
    ``vocab_size`` multi-character substrings (length ≤
    ``max_piece_len``) by weighted occurrence count, ties by piece
    string. Input is the distinct-chunk table ``(chunk, wcount)``.
    Output ``(piece, cnt)``."""
    occ = chunks.select(
        F.explode(_spans_array("chunk", max_piece_len)).alias("sp"),
        "wcount",
    ).select(F.col("sp.piece").alias("piece"), "wcount")
    counts = occ.groupBy("piece").agg(F.sum("wcount").cast("long").alias("cnt"))
    chars = counts.filter(F.length("piece") == 1)
    # global top-K as TakeOrdered (per-partition heads), never a
    # single-partition row_number window
    multi = (
        counts.filter(F.length("piece") > 1)
        .orderBy(F.col("cnt").desc(), F.col("piece"))
        .limit(int(vocab_size))
    )
    return chars.unionByName(multi)


def unigram_learn(
    docs: DataFrame,
    vocab_size: int = 120,
    rounds: int = 2,
    text_col: str = "text",
    window: int = WINDOW,
    max_piece_len: int = MAX_PIECE_LEN,
) -> DataFrame:
    """Train the unigram LM: seed, then ``rounds`` rounds of hard EM
    (Viterbi E-step over the distinct-chunk table, weighted piece
    counts, smoothed micro-nat M-step). Returns ``(piece, cnt,
    lp_micro)`` — ``cnt`` the final round's Viterbi usage count.

    Driver loop is vocabulary-sized only (ONE ≤|V|-row collect per
    round, the bpe_learn/k-means convention); corpus-sized work stays
    distributed and the chunk table persists across rounds.

    r14 plan shape (was: a full span explode + vocab broadcast join +
    map re-aggregation per round): the span grain is ROUND-INVARIANT
    once the vocabulary is seeded (pieces are fixed across EM rounds;
    only their log-probs move), so it is exploded, membership-filtered
    and aggregated to ``(chunk, wcount, _n, _sp)`` ONCE and persisted —
    each round rebuilds the span→lp map map-side from a literal lp
    array indexed by the span's piece ordinal (O(1) ``element_at``, no
    join, no per-round shuffle for the map). The M-step quantization
    stays a tiny LOCAL-frame action (r13 shape) — an in-plan
    zero-fill+window fold was tried and measured 1.09x SLOWER cold
    (interleaved A/B): the extra join/window query stages under AQE
    cost more than the local job they replace."""
    spark = docs.sparkSession
    chunks = (
        _chunks(docs, text_col, window)
        .groupBy("chunk")
        .agg(F.count(F.lit(1)).cast("long").alias("wcount"))
        .persist()
    )

    def _quantize(cnts: list[tuple[str, int]], t_total: int, v_size: int):
        """lp for every (piece, cnt) — the SAME Spark ``_lp_expr``
        (JVM ln), applied to a tiny LOCAL DataFrame; bit-identical by
        construction (identical expression tree, same engine)."""
        local = spark.createDataFrame(cnts, "piece string, cnt long")
        rows = local.select(
            "piece", "cnt", _lp_expr("cnt", int(t_total), v_size).alias("lp")
        ).collect()
        # Python sort == Spark binary-string sort here (UTF-8 byte order
        # preserves code-point order); skipping the Spark orderBy saves
        # a range-partitioning sample job per quantize call
        rows.sort(key=lambda r: r["piece"])
        return rows

    spans_g = None
    try:
        seed = unigram_seed(chunks, vocab_size, max_piece_len)
        seed_rows = seed.collect()
        cnts = sorted((r["piece"], int(r["cnt"])) for r in seed_rows)
        v_size = len(cnts)
        rows = _quantize(cnts, sum(c for _, c in cnts), v_size)
        pieces_all = [r["piece"] for r in rows]
        lps = [int(r["lp"]) for r in rows]
        # round-invariant span grain: piece strings resolve to their
        # ordinal in the FIXED sorted vocabulary once; single-char OOV
        # spans keep ordinal 0 (= UNK at encode time), multi-char OOV
        # spans are unreachable edges and drop here, exactly as the old
        # per-round `_with_span_map` filter did
        key = (F.col("sp.j") * (window + 1) + F.col("sp.i")).cast("int")
        spans_g = (
            chunks.select(
                "chunk",
                "wcount",
                F.explode(_spans_array("chunk", max_piece_len)).alias("sp"),
            )
            .withColumn(
                "_pid", F.array_position(F.lit(pieces_all), F.col("sp.piece"))
            )
            .filter((F.col("_pid") > 0) | (F.col("sp.i") - F.col("sp.j") == 1))
            .groupBy("chunk", "wcount")
            .agg(
                F.collect_list(
                    F.struct(key.alias("k"), F.col("_pid").cast("int").alias("pid"))
                ).alias("_sp")
            )
            .withColumn("_n", F.length("chunk").cast("int"))
            .persist()
        )
        for _ in range(int(rounds)):
            # span→lp map rebuilt MAP-SIDE from the literal per-ordinal
            # lp array (constant-folded once per plan); pid 0 = UNK
            lps_sql = f"array({', '.join(f'{lp}L' for lp in lps)})"
            withm = spans_g.withColumn(
                "_m",
                F.expr(
                    f"map_from_entries(transform(_sp, s -> struct(s.k, "
                    f"IF(s.pid > 0, element_at({lps_sql}, s.pid), "
                    f"{UNK_LP_MICRO}L))))"
                ),
            )
            seg = _viterbi_cols(withm, window, max_piece_len, want_pieces=True)
            used = (
                seg.select(F.explode("pieces").alias("piece"), "wcount")
                .groupBy("piece")
                .agg(F.sum("wcount").cast("long").alias("cnt"))
            )
            # ONE distributed action per round; the fixed-vocabulary
            # zero-fill is a dict lookup on ≤|V| rows, the quantization
            # a local-frame job (see the docstring's A/B note)
            cnt_map = {r["piece"]: int(r["cnt"]) for r in used.collect()}
            cnts = [(p, cnt_map.get(p, 0)) for p in pieces_all]
            rows = _quantize(cnts, sum(c for _, c in cnts), v_size)
            lps = [int(r["lp"]) for r in rows]
        return spark.createDataFrame(
            [(r["piece"], int(r["cnt"]), int(r["lp"])) for r in rows],
            "piece string, cnt long, lp_micro long",
        )
    finally:
        chunks.unpersist()
        if spans_g is not None:
            spans_g.unpersist()


def unigram_encode(
    docs: DataFrame,
    vocab: list[tuple[str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = WINDOW,
    max_piece_len: int = MAX_PIECE_LEN,
) -> DataFrame:
    """Corpus accounting under a FIXED unigram vocabulary (the
    q109/q110 literal-model pattern): per document, the number of
    word-chunks, Viterbi token count, and exact total negative
    log-likelihood in integer micro-nats. Output ``(doc_id, n_chunks,
    n_tokens, nll_micro)`` — empty/whitespace documents carry zeros.

    Plan (r13): words/chunks explode into the (doc, chunk, occ) grain;
    the span map + Viterbi fold run once per DISTINCT chunk (a
    vocabulary-bounded table — DP cost is corpus-size-independent) and
    the scores broadcast-join back; the per-document aggregate is the
    only corpus-sized shuffle."""
    spark = docs.sparkSession
    words = docs.select(
        F.col(id_col),
        F.explode(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
        ).alias("_w"),
    ).filter(F.col("_w") != "")
    chunks = words.select(
        id_col,
        F.explode(
            F.expr(
                f"transform(sequence(0, (length(_w) - 1) div {window}), "
                f"k -> substring(_w, k * {window} + 1, {window}))"
            )
        ).alias("chunk"),
    )
    # r13 optimization (guide §8: decide on the small proxy, attach
    # back): score/n_pieces are pure functions of the CHUNK STRING, so
    # the span explode + DP fold runs once per DISTINCT CHUNK (31 rows
    # at sf0.1 vs 116k chunk occurrences = 3700x less DP work) and the
    # score table joins back onto the occurrence grain. NOTE the
    # distinct-chunk grain is NOT vocabulary-bounded — it is one row per
    # distinct word-block, ~10^7 rows at the 100 TB design point — so no
    # explicit broadcast hint (r14, ADVICE): AQE broadcasts when the
    # materialized side is actually small and falls back to a shuffle
    # join when it is not, instead of a forced driver collect of a
    # possibly multi-GB relation. r14 shape: the join lands on the RAW
    # chunk occurrences and the per-document aggregate runs directly on
    # the join output — the old intermediate (doc, chunk, occ) groupBy
    # was a whole extra corpus-sized exchange buying only a ~1x dedup
    # of the join probe side (occurrence sums are identical either
    # way). Every distinct chunk appears in dp BY CONSTRUCTION (same
    # corpus), so the inner join drops no rows. Identical values by
    # construction: the same deterministic DP on the same strings.
    dp = _viterbi_cols(
        _with_span_map(
            chunks.select("chunk").distinct(), vocab, spark, window, max_piece_len
        ),
        window,
        max_piece_len,
        want_pieces=False,
    ).select("chunk", "score", "n_pieces")
    seg = chunks.join(dp, "chunk")
    per_doc = seg.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.sum("n_pieces").cast("long").alias("n_tokens"),
        (-F.sum("score")).cast("long").alias("nll_micro"),
    )
    return (
        docs.select(id_col)
        .distinct()
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_chunks", F.lit(0)).cast("long").alias("n_chunks"),
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("nll_micro", F.lit(0)).cast("long").alias("nll_micro"),
        )
    )


def py_viterbi(word: str, vocab: dict[str, int], max_piece_len: int = MAX_PIECE_LEN):
    """Pure-Python mirror of the DP (tests): returns (pieces, score)."""
    n = len(word)
    best = [0] + [None] * n
    bp = [None] * (n + 1)
    for i in range(1, n + 1):
        for j in range(max(0, i - max_piece_len), i):
            piece = word[j:i]
            lp = vocab.get(piece)
            if lp is None and i - j == 1:
                lp = UNK_LP_MICRO
            if lp is None or best[j] is None:
                continue
            s = best[j] + lp
            if best[i] is None or s > best[i]:
                best[i], bp[i] = s, j
    pieces, pos = [], n
    while pos > 0:
        pieces.append(word[bp[pos]:pos])
        pos = bp[pos]
    return list(reversed(pieces)), best[n]
