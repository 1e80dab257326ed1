"""Deduplication operators for the training-data pipeline layer.

Exact, fingerprint, MinHash+LSH, n-gram Jaccard, and embedding-cosine
near-dup — all pure DataFrame plans built on the engine-portable MD5 hash
family (functions/hashing.py), so each has a DuckDB oracle.

Scale design (100 TB of documents):
- exact/fingerprint dedup: one hash-groupBy (map-side partial) — the
  canonical shuffle-minimal plan;
- MinHash: explode shingles → groupBy(doc) min-hash per seed. The
  explode is the expensive step; shingling is a Catalyst expression
  (no Python), and the per-doc signature reduce is map-side combinable;
- LSH banding: signatures → (band_id, band_hash) keys → self-join on
  the band key. Only bucket collisions are compared — the pair space
  never materializes. Skewed buckets (boilerplate docs) are handled by
  AQE skew-join splitting;
- verification: candidate pairs get exact n-gram Jaccard, computed with
  array intersection on the two docs' shingle arrays.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from aeon_mecha_spark.functions.hashing import md5_long
from aeon_mecha_spark.functions.text import normalize_text, tokens, word_shingles
from aeon_mecha_spark.util import spread, track_cached


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Hash-groupBy exact dedup: per content hash keep canonical (min id)
    + duplicate count. Returns (content_hash, canonical_id, n_docs)."""
    return (
        spread(docs).select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("n_docs"))
    )


def fingerprint_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Fuzzy-exact dedup on the normalized text (lowercase, punctuation
    stripped, whitespace collapsed)."""
    return (
        spread(docs).select(F.md5(normalize_text(F.col(text_col))).alias("fingerprint"), F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("n_docs"))
    )


def shingle_table(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3) -> DataFrame:
    """(id, shingle) long table — distinct k-word shingles per doc."""
    docs = spread(docs)
    return docs.select(
        F.col(id_col), F.explode(F.array_distinct(word_shingles(F.col(text_col), k))).alias("shingle")
    )


def minhash_signatures(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3, num_hashes: int = 8
) -> DataFrame:
    """MinHash signature per doc: sig[i] = min over shingles of h_i.
    One explode + one groupBy with map-side partial mins — the shuffle
    carries only (doc × num_hashes) partials, not the shingle stream.

    Hash-family economy: one 128-bit MD5 yields TWO independent 60-bit
    hashes (hex chars 1-15 and 16-30), so ``num_hashes`` functions cost
    ``ceil(num_hashes/2)`` MD5 evaluations per shingle — the dominant
    per-row cost at scale. Seeded as md5(f"{seed}:"+shingle); the split
    is oracle-checkable in DuckDB with the same substr() arithmetic.
    Output: (id, mh_0 … mh_{n-1}).
    """
    sh = shingle_table(docs, id_col, text_col, k)
    n_md5 = (num_hashes + 1) // 2
    md5_cols = [
        F.md5(F.concat(F.lit(f"{s}:"), F.col("shingle"))).alias(f"_m{s}") for s in range(n_md5)
    ]
    hashed = sh.select(F.col(id_col), *md5_cols)
    # min over the fixed-length lowercase-hex substrings, base-convert
    # AFTER the aggregate: same-length same-case hex compares
    # lexicographically exactly as it compares numerically ('0'-'9' <
    # 'a'-'f' in ASCII), so min-then-conv == conv-then-min — but the
    # per-shingle hot path drops num_hashes base conversions per row
    # and the groupBy carries them only once per (doc, hash)
    aggs = []
    for i in range(num_hashes):
        m = F.col(f"_m{i // 2}")
        start = 1 if i % 2 == 0 else 16
        aggs.append(F.min(F.substring(m, start, 15)).alias(f"_h{i}"))
    mins = hashed.groupBy(id_col).agg(*aggs)
    return mins.select(
        F.col(id_col),
        *[
            F.conv(F.col(f"_h{i}"), 16, 10).cast("long").alias(f"mh_{i}")
            for i in range(num_hashes)
        ],
    )


def lsh_candidate_pairs(
    signatures: DataFrame, id_col: str = "doc_id", num_hashes: int = 8, bands: int = 4
) -> DataFrame:
    """LSH banding: split the signature into ``bands`` bands of
    ``num_hashes // bands`` rows, hash each band, self-join on
    (band_id, band_hash). Returns distinct ordered pairs (id_a < id_b).

    The join key space is (band, hash) buckets, so complexity follows
    collisions, not the quadratic pair space."""
    rows = num_hashes // bands
    band_cols = []
    for b in range(bands):
        cols = [F.col(f"mh_{b * rows + r}").cast("string") for r in range(rows)]
        band_cols.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws(",", *cols)).alias("bh"))
        )
    buckets = signatures.select(
        F.col(id_col), F.explode(F.array(*band_cols)).alias("b")
    ).select(id_col, F.col("b.band").alias("band"), F.col("b.bh").alias("bh"))
    a, bb = buckets.alias("a"), buckets.alias("b")
    pairs = (
        a.join(
            bb,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .dropDuplicates()
    )
    return pairs


def shingle_sets(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 3) -> DataFrame:
    """(id, distinct shingle array) — cacheable input to ngram_jaccard."""
    return spread(docs).select(
        F.col(id_col), F.array_distinct(word_shingles(F.col(text_col), k)).alias("sh")
    )


def ngram_jaccard(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    sets: DataFrame | None = None,
) -> DataFrame:
    """Exact k-gram Jaccard for candidate pairs: join the two shingle
    sets and compute |∩| / |∪| via array ops. Pairs is (id_a, id_b).
    Pass a cached ``sets`` (from shingle_sets) to avoid recomputing the
    shingling for both sides of the pair join."""
    if sets is None:
        sets = shingle_sets(docs, id_col, text_col, k)
    out = (
        pairs.join(sets.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sets.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b")))
    return out.select(
        "id_a",
        "id_b",
        F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0)).alias("jaccard"),
    )


def dedup_clusters(pairs: DataFrame, max_iter: int = 20) -> DataFrame:
    """Connected components over near-duplicate pairs: every document
    reachable through a chain of pair edges gets the same canonical
    ``cluster_id`` (the minimum doc id in its component) — the step that
    turns pairwise near-dup verdicts (LSH/Jaccard/cosine) into "keep one
    representative per duplicate cluster".

    Input: ordered pairs ``(id_a, id_b)``. Output: ``(doc_id,
    cluster_id)`` for every id appearing in a pair (singletons never
    enter the pair table and need no row).

    Iterative min-label propagation: each round every vertex takes the
    minimum label among itself and its neighbours; a fixpoint is reached
    in O(component diameter) rounds — near-dup clusters are shallow
    (duplicates of duplicates), so a handful of rounds in practice, with
    ``max_iter`` as the runaway guard. Each round is one shuffle-join on
    the edge list + one groupBy(min); intermediate lineage is truncated
    with ``localCheckpoint`` so plans don't grow with the iteration
    count. The driver sees only the one-row convergence count per round,
    never the data.
    """
    edges = (
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
        .union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("cluster_id", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        neighbour_min = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("cluster_id").alias("nbr_min"))
        )
        updated = (
            labels.join(neighbour_min, labels.id == neighbour_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("cluster_id"), F.coalesce(F.col("nbr_min"), F.col("cluster_id"))
                ).alias("cluster_id"),
                (F.coalesce(F.col("nbr_min"), F.col("cluster_id")) < F.col("cluster_id")).alias(
                    "_changed"
                ),
            )
            .localCheckpoint()
        )
        changed = updated.filter(F.col("_changed")).limit(1).count()
        labels = updated.drop("_changed")
        if changed == 0:
            break
    else:
        raise RuntimeError(
            f"dedup_clusters did not converge within max_iter={max_iter} rounds "
            "(component diameter exceeds the bound); raise max_iter"
        )
    return labels.select(F.col("id").alias("doc_id"), "cluster_id")


def cross_corpus_duplicates(
    corpus: DataFrame,
    reference: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float | None = None,
) -> DataFrame:
    """Cross-corpus near-dup join: find documents in ``corpus`` that are
    near-duplicates of any document in ``reference`` — the "dedup the
    new crawl against the existing training set" step, which a SELF-join
    dedup cannot express (it would also pair corpus docs with each
    other).

    Same MinHash+LSH machinery as the self-dedup path, but the band
    buckets of the two sides meet in a two-table equi-join on
    (band, band_hash): candidate volume follows bucket collisions
    BETWEEN the corpora, never |corpus|×|reference|. With a
    ``threshold``, candidates are verified with exact k-gram Jaccard
    (array intersect over the two shingle sets) and filtered — the
    columns are then (doc_id, ref_id, jaccard); without, all candidate
    pairs return as (doc_id, ref_id).

    Scale notes: at 100 TB the reference side's signatures/buckets are
    computed once per training-set release — persist them and pass the
    bucketed form through ``reference`` on each new crawl. Both inputs
    only shuffle on the band key (plus the id-joins of the verify step);
    AQE splits skewed boilerplate buckets.
    """
    sig_c = minhash_signatures(corpus, id_col, text_col, k, num_hashes)
    sig_r = minhash_signatures(reference, id_col, text_col, k, num_hashes)

    def buckets(sig: DataFrame, out_id: str) -> DataFrame:
        rows = num_hashes // bands
        band_cols = []
        for b in range(bands):
            cols = [F.col(f"mh_{b * rows + r}").cast("string") for r in range(rows)]
            band_cols.append(
                F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws(",", *cols)).alias("bh"))
            )
        return sig.select(
            F.col(id_col).alias(out_id), F.explode(F.array(*band_cols)).alias("b")
        ).select(out_id, F.col("b.band").alias("band"), F.col("b.bh").alias("bh"))

    cand = (
        buckets(sig_c, "doc_id")
        .join(buckets(sig_r, "ref_id"), ["band", "bh"])
        .select("doc_id", "ref_id")
        .dropDuplicates()
    )
    if threshold is None:
        return cand
    sets_c = shingle_sets(corpus, id_col, text_col, k).select(
        F.col(id_col).alias("doc_id"), F.col("sh").alias("sh_a")
    )
    sets_r = shingle_sets(reference, id_col, text_col, k).select(
        F.col(id_col).alias("ref_id"), F.col("sh").alias("sh_b")
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b")))
    return (
        cand.join(sets_c, "doc_id")
        .join(sets_r, "ref_id")
        .select(
            "doc_id",
            "ref_id",
            F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0)).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def prefix_filter_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact-recall Jaccard similarity join via prefix filtering (the
    AllPairs/PPJoin family) — the complement to LSH banding: LSH is
    probabilistic (tunable recall), this is EXACT. Any pair with
    J(A, B) ≥ τ must share at least one token among the first
    |A| − ⌊τ·|A|⌋ tokens of each set when both are sorted by one global
    order, so joining only on prefix tokens loses nothing; an exact
    Jaccard verify then removes false positives. Output: every pair with
    k-shingle Jaccard ≥ τ as (id_a < id_b, jaccard).

    Global order = (document frequency asc, shingle asc): rarest tokens
    first, so prefixes join on the LEAST common shingles — candidate
    volume follows rare-token collisions, not the quadratic pair space.

    Plan: shingle explode → token-frequency groupBy (map-side partial)
    → one window per doc for prefix ranks → self-join on the prefix
    shingle → distinct pairs → array-intersect verify. Prefix length
    uses ⌊τ·n⌋ (not ⌈·⌉) so float rounding can only LENGTHEN the prefix
    — recall is preserved under IEEE jitter; the verify step restores
    exact precision. A size filter (min ≥ τ·max − ε) prunes pairs that
    cannot reach τ before the verify join.
    """
    from pyspark.sql import Window as W

    sets = shingle_sets(docs, id_col, text_col, k)
    sized = sets.select(F.col(id_col), F.col("sh"), F.size("sh").alias("_n"))
    tok = sized.select(F.col(id_col), F.col("_n"), F.explode("sh").alias("shingle"))
    freq = tok.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    w = W.partitionBy(id_col).orderBy(F.col("_df").asc(), F.col("shingle").asc())
    ranked = tok.join(freq, "shingle").withColumn("_rn", F.row_number().over(w))
    prefix_len = F.col("_n") - F.floor(F.lit(threshold) * F.col("_n")).cast("int") + F.lit(1)
    prefix = ranked.filter(F.col("_rn") <= prefix_len).select(id_col, "_n", "shingle")
    a, b = prefix.alias("a"), prefix.alias("b")
    size_ok = F.least(F.col("a._n"), F.col("b._n")) >= (
        F.lit(threshold) * F.greatest(F.col("a._n"), F.col("b._n")) - F.lit(1e-9)
    )
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            & size_ok,
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .dropDuplicates()
    )
    verified = ngram_jaccard(docs, cand, id_col, text_col, k, sets=sets)
    return verified.filter(F.col("jaccard") >= threshold)


def duplicated_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 8,
) -> DataFrame:
    """Exact duplicated-substring signal per document: the fraction of a
    doc's distinct ``width``-token spans that appear verbatim in ≥ 2
    documents — the set-oriented form of the exact-substring-dedup
    criterion (suffix-array dedup finds byte spans repeated across the
    corpus; here the unit is a fixed-width token window, which a
    groupBy can count without any suffix structure).

    Plan: span explode → 60-bit MD5 hash (shuffle carries 8-byte hashes,
    never span text) → span-frequency groupBy with map-side partials →
    hash-join back (co-partitioned on the hash by the groupBy) → per-doc
    conditional count. Output: (id, n_spans, n_dup_spans, dup_frac);
    ``dup_frac`` is an int/int IEEE division, bit-stable across engines.
    """
    sh = shingle_table(docs, id_col, text_col, k=width)
    hashed = sh.select(F.col(id_col), md5_long(F.col("shingle")).alias("_h"))
    counts = hashed.groupBy("_h").agg(F.count(F.lit(1)).alias("_nd"))
    return (
        hashed.join(counts, "_h")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.when(F.col("_nd") >= 2, 1).otherwise(0)).cast("long").alias("n_dup_spans"),
        )
        .withColumn("dup_frac", F.col("n_dup_spans").cast("double") / F.col("n_spans"))
    )


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 32) -> DataFrame:
    """SimHash fingerprint: for each bit position, sign of the sum of
    (+1/−1) votes from token hashes. Implemented as explode(tokens) →
    per-bit conditional sums → bit-OR reassembly. ``bits``≤60 so the
    fingerprint fits a BIGINT with the portable MD5 hash."""
    from aeon_mecha_spark.functions.text import tokens

    toks = spread(docs).select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    h = md5_long(F.col("tok")).alias("h")
    toks = toks.select(id_col, h)
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"b_{i}")
        for i in range(bits)
    ]
    agg = toks.groupBy(id_col).agg(*votes)
    fp = F.lit(0).cast("long")
    for i in range(bits):
        fp = fp + F.when(F.col(f"b_{i}") > 0, F.lit(2**i).cast("long")).otherwise(F.lit(0).cast("long"))
    return agg.select(F.col(id_col), fp.alias("simhash"))


def substring_duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Exact substring duplication: for each document, how many of its
    token positions are covered by an n-token gram that also appears in
    at least one OTHER document — the cross-document exact-substring
    signal (Lee et al., "Deduplicating Training Data Makes Language
    Models Better") that sequence-level dedup misses, at n-gram
    granularity rather than suffix-array granularity.

    Returns ``(id, n_grams, n_dup_grams, dup_tokens)`` for every doc
    with ≥ n tokens: total n-gram positions, positions whose gram is
    cross-doc duplicated, and the merged token coverage of those
    duplicated spans (overlapping gram hits union into maximal spans,
    so a verbatim 50-token quote counts 50 tokens, not 43 grams × n).
    Filter ``dup_tokens / (n_grams + n - 1) > θ`` to drop boilerplate.

    Plan: posexplode grams once, reduce each gram to its 60-bit MD5 (the
    shuffle key is 8 bytes, not an ~8-word string), one groupBy(gram)
    to find cross-doc grams, one join back on the gram hash (AQE splits
    skewed boilerplate grams), then a single window + groupBy over ONLY
    the duplicated positions. The span merge needs no general
    gaps-and-islands pass: every interval is the same length ``n``, so
    the union coverage of the sorted dup positions is exactly
    ``Σ min(n, pos - prev_dup_pos)`` — one lag expression. Per-doc
    gram totals never touch the exploded table at all:
    ``n_grams = n_tokens - n + 1`` is a map-only projection of the doc
    row. Every step is a single-shuffle hash exchange; nothing is
    quadratic in docs or grams.
    """
    eligible = spread(docs).filter(F.size(tokens(F.col(text_col))) >= n)
    per_doc = eligible.select(
        F.col(id_col),
        (F.size(tokens(F.col(text_col))) - F.lit(n) + F.lit(1)).cast("long").alias("n_grams"),
    )
    grams = eligible.select(
        F.col(id_col), F.posexplode(word_shingles(F.col(text_col), n)).alias("pos", "gram")
    ).select(id_col, "pos", md5_long(F.col("gram")).alias("gh"))
    # The gram table feeds two consumers (dup groupBy + join-back) with
    # different column pruning, so exchange reuse can't kick in and the
    # tokenize+explode+md5 scan — the dominant CPU cost — would run
    # once per consumer. Persist the compact (id, pos, gh) rows instead
    # (MEMORY_AND_DISK: ~24 B/row spills, never recomputes); at extreme
    # scale pre-materialize this table to Parquet and pass it around.
    grams = grams.persist()
    dup = (
        grams.groupBy("gh")
        .agg(F.count_distinct(F.col(id_col)).alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("gh")
    )
    dup_pos = grams.join(dup, "gh").select(id_col, "pos")
    w = W.partitionBy(id_col).orderBy("pos")
    # positions are strictly increasing per doc, so lag(pos) is the
    # previous duplicated gram start; coalesce to pos-n makes the first
    # dup gram contribute exactly n covered tokens
    prev_dup = F.lag("pos").over(w)
    covered = F.least(
        F.lit(n), F.col("pos") - F.coalesce(prev_dup, F.col("pos") - F.lit(n))
    )
    dup_agg = (
        dup_pos.withColumn("_cov", covered)
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_dup_grams"),
            F.sum("_cov").cast("long").alias("dup_tokens"),
        )
    )
    out = (
        per_doc.join(dup_agg, id_col, "left")
        .select(
            F.col(id_col),
            "n_grams",
            F.coalesce("n_dup_grams", F.lit(0)).cast("long").alias("n_dup_grams"),
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
        )
    )
    # the persisted gram table rides along for explicit release once the
    # caller has consumed the result (util.release_cached)
    return track_cached(out, grams)


def winnowing_fingerprints(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS algorithm): hash every k-token gram, slide a
    w-gram window, and select the minimum hash of each window. The
    selected ``(pos, fp)`` set is the document's fingerprint: any two
    documents sharing a run of at least ``w + k - 1`` tokens are
    GUARANTEED to share a fingerprint, and the density of selected
    hashes is ~2/(w+1) — position-robust local fingerprinting that a
    single whole-document hash (``fingerprint_duplicates``) cannot give.
    Join the output on ``fp`` across documents to find local overlaps.

    Returns distinct ``(id, pos, fp)`` — ``pos`` is the 0-based gram
    position whose hash was selected. Documents with fewer than k
    tokens contribute their whole text as one gram (the word_shingles
    contract); documents with fewer than w grams fingerprint their
    global minimum (the only full-coverage window).

    Plan: one posexplode + md5 scan, ONE per-doc window sort shared by
    all four window expressions (row_number, partition count, frame min,
    frame arg-min), then a distinct. No joins, nothing quadratic; at
    100 TB the only shuffle is the per-doc hash exchange, and docs are
    independent so the window parallelizes per document. Hash ties
    inside one window would make the arg-min engine-dependent; with
    60-bit MD5 over ≤ w rows that is ~w²/2⁶¹ per window — documented,
    not guarded (the weighted_sample stance).
    """
    g = (
        spread(docs)
        .select(
            F.col(id_col),
            F.posexplode(word_shingles(F.col(text_col), k)).alias("pos", "gram"),
        )
        .select(id_col, "pos", md5_long(F.col("gram")).alias("gh"))
    )
    wd = W.partitionBy(id_col).orderBy("pos")
    wf = wd.rowsBetween(-(w - 1), 0)
    sel = g.select(
        F.col(id_col),
        F.row_number().over(wd).alias("_rn"),
        F.count(F.lit(1)).over(W.partitionBy(id_col)).alias("_m"),
        F.min("gh").over(wf).alias("fp"),
        F.min_by("pos", "gh").over(wf).alias("pos"),
    )
    return (
        sel.filter(F.col("_rn") >= F.least(F.lit(w), F.col("_m")))
        .select(F.col(id_col), F.col("pos").cast("long").alias("pos"), "fp")
        .distinct()
    )


def ngram_novelty(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document n-gram novelty profile: the fraction of a document's
    distinct k-word shingles that first appear in THIS document — i.e.
    no document with a smaller id contains them. The curation metric
    behind "how much genuinely new text does each source add" (and the
    gradient complement of exact dedup: novelty 0 = pure rehash,
    novelty 1e6 ppm = entirely unseen).

    Ownership is ``min(id)`` per shingle — the same keep-first rule as
    the ownership dedup family, applied at the gram grain. Shingle
    semantics match ``curation.decontaminate`` (docs shorter than ``k``
    contribute their whole-text join, so every doc has ≥ 1 gram).
    Ratio is an exact ppm floor-division integer.

    Plan: doc-distinct shingle explode → ``groupBy(gram)`` min-id
    (map-side partial) → gram-keyed join back → per-doc count. Every
    shuffle is keyed by gram or doc id; nothing global, nothing
    quadratic — the pair space never materializes.
    """
    grams = spread(docs).select(
        F.col(id_col),
        F.explode(F.array_distinct(word_shingles(F.col(text_col), k))).alias("gram"),
    )
    owner = grams.groupBy("gram").agg(F.min(id_col).alias("_owner"))
    per_doc = (
        grams.join(owner, "gram")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(F.when(F.col("_owner") == F.col(id_col), 1).otherwise(0))
            .cast("long")
            .alias("n_novel"),
        )
    )
    return per_doc.select(
        id_col,
        "n_grams",
        "n_novel",
        F.expr("(n_novel * 1000000L) div n_grams").alias("novelty_ppm"),
    )


def canonical_select(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_orders: list[Column] | None = None,
) -> DataFrame:
    """Keep-best dedup: group documents by normalized-text fingerprint
    and elect ONE canonical copy per cluster by quality — the curation
    step after duplicate detection ("we found 40 copies; which one goes
    into the training set?"). Default quality order prefers the longest
    raw text (most intact copy), tie-broken by min id, so the election
    is total and deterministic.

    Unlike ``fingerprint_duplicates`` (which returns one row per
    cluster), this returns the per-document verdict — every doc with
    its cluster's canonical id, its quality rank within the cluster,
    and the keep flag — the shape a downstream filter consumes.

    Plan: one shuffle to the fingerprint key, one per-cluster window
    (clusters are tiny — bounded by the duplicate multiplicity, not the
    corpus), no join back to the corpus: the window carries the
    election through.

    Output: ``(id, fingerprint, canonical_id, rank, is_canonical)``.
    """
    orders = quality_orders or [
        F.length(F.col(text_col)).desc(),
        F.col(id_col).asc(),
    ]
    base = spread(docs).select(
        F.col(id_col),
        F.md5(normalize_text(F.col(text_col))).alias("fingerprint"),
        F.col(text_col),
    )
    w = W.partitionBy("fingerprint").orderBy(*orders)
    full = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return base.select(
        F.col(id_col),
        "fingerprint",
        F.first(id_col).over(full).alias("canonical_id"),
        F.row_number().over(w).alias("rank"),
    ).withColumn("is_canonical", F.col("rank") == 1)


def line_dedup(
    docs: DataFrame,
    max_doc_freq: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_line_chars: int = 1,
) -> DataFrame:
    """Line-level boilerplate removal (the C4/Dolma pass that precedes
    document-level dedup): drop every line whose TRIMMED form appears
    in more than ``max_doc_freq`` DISTINCT documents — navigation
    chrome, cookie banners, license footers — and reassemble the
    remaining lines in their original order. Lines shorter than
    ``min_line_chars`` after trimming are kept unconditionally (blank
    separators are structure, not boilerplate).

    Cf. the reference's per-stream QC passes (aeon/qc semantics): a
    global frequency table drives a per-record filter; here the
    "stream" is the line grain of a text corpus.

    Exactness: the line grain is ``trim(line)``; ordering is restored
    by the line's ORIGINAL index (``posexplode``), so the output text
    is a pure function of the input — no row-order dependence anywhere.

    Plan: one posexplode (map-side), one distinct-(line, doc) + line
    groupBy for document frequencies, ONE key-bounded equi-join of the
    line stream against the frequent-lines table (broadcast when it
    fits — boilerplate tables are tiny relative to the corpus; Spark's
    AQE picks the strategy), one per-doc groupBy whose
    ``array_sort(collect_list(struct(pos, line)))`` rebuilds the text.
    No windows. Output: ``(id, text, n_lines, n_dropped)``.
    """
    base = spread(docs).select(
        F.col(id_col), F.posexplode(F.split(F.col(text_col), "\n")).alias("_pos", "_line")
    ).withColumn("_t", F.trim(F.col("_line")))
    freq = (
        base.filter(F.length("_t") >= int(min_line_chars))
        .select("_t", id_col)
        .distinct()
        .groupBy("_t")
        .agg(F.count(F.lit(1)).cast("long").alias("_df"))
        .filter(F.col("_df") > int(max_doc_freq))
        .select(F.col("_t").alias("_bp"), F.lit(True).alias("_drop"))
    )
    flagged = base.join(
        freq,
        (F.col("_t") == F.col("_bp")) & (F.length("_t") >= int(min_line_chars)),
        "left",
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.sum(F.when(F.col("_drop"), 1).otherwise(0)).cast("long").alias("n_dropped"),
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("_drop").isNull(),
                        F.struct(F.col("_pos").alias("pos"), F.col("_line").alias("line")),
                    )
                )
            ).alias("_kept"),
        )
        .select(
            F.col(id_col),
            F.concat_ws(
                "\n", F.transform(F.col("_kept"), lambda s: s["line"])
            ).alias(text_col),
            "n_lines",
            "n_dropped",
        )
    )


def ngram_containment(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 3,
    sets: DataFrame | None = None,
) -> DataFrame:
    """Exact k-gram CONTAINMENT for candidate pairs — the asymmetric
    near-dup measure Jaccard misses: a short document quoted whole
    inside a long one has low Jaccard (the union is large) but
    containment ≈ 1 on the short side. The standard quote/subset-dup
    verifier to run beside :func:`ngram_jaccard` on the same LSH
    candidates.

    Reports both directions and the symmetric max, in EXACT ppm
    (integer sizes, one decimal div each — no float ratio):
    ``containment_a_ppm = |∩|·10⁶ div |A|`` etc. Pairs with an empty
    side report 0.

    Plan: identical to ``ngram_jaccard`` — two key-bounded joins of the
    (cached) shingle-set table onto the pair list; array intersection
    is per-row map-side work. Output: ``(id_a, id_b, n_common, n_a,
    n_b, containment_a_ppm, containment_b_ppm, containment_max_ppm)``.
    """
    if sets is None:
        sets = shingle_sets(docs, id_col, text_col, k)
    out = (
        pairs.join(
            sets.withColumnRenamed(id_col, "id_a").withColumnRenamed("sh", "sh_a"),
            "id_a",
        ).join(
            sets.withColumnRenamed(id_col, "id_b").withColumnRenamed("sh", "sh_b"),
            "id_b",
        )
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b"))).cast("long")
    na = F.size("sh_a").cast("long")
    nb = F.size("sh_b").cast("long")
    out = (
        out.withColumn("n_common", inter)
        .withColumn("n_a", na)
        .withColumn("n_b", nb)
        .withColumn(
            "containment_a_ppm",
            F.expr(
                "CAST(CASE WHEN n_a > 0 THEN "
                "(CAST(n_common AS DECIMAL(38,0)) * 1000000) div n_a "
                "ELSE 0 END AS BIGINT)"
            ),
        )
        .withColumn(
            "containment_b_ppm",
            F.expr(
                "CAST(CASE WHEN n_b > 0 THEN "
                "(CAST(n_common AS DECIMAL(38,0)) * 1000000) div n_b "
                "ELSE 0 END AS BIGINT)"
            ),
        )
    )
    return out.select(
        "id_a",
        "id_b",
        "n_common",
        "n_a",
        "n_b",
        "containment_a_ppm",
        "containment_b_ppm",
        F.greatest("containment_a_ppm", "containment_b_ppm").alias(
            "containment_max_ppm"
        ),
    )
