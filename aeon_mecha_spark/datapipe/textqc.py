"""Text quality scoring, language-ID heuristics, token counting, and
document fingerprinting over a ``documents`` table.

Everything is a Catalyst expression over functions/text.py — one pass,
no shuffle (per-document map work), column-pruned to the text column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

from aeon_mecha_spark.functions.hashing import md5_long
from aeon_mecha_spark.util import spread
from aeon_mecha_spark.functions.text import (
    char_count,
    mean_token_len,
    normalize_text,
    punct_ratio,
    stopword_ratio,
    token_count,
    tokens,
    word_shingles,
)

# Per-language marker words for the n-gram/stopword language-ID heuristic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "a"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "de", "que", "los", "las"],
    "de": ["der", "die", "und", "das", "ist"],
    "zh": ["的", "是", "在", "了", "和"],
}


def quality_features(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-doc quality features: length, token count, punctuation ratio,
    stopword ratio, mean token length + a composite [0,1] quality score
    (monotone heuristic: long-enough, low punctuation, some stopwords)."""
    t = F.col(text_col)
    n_tok = token_count(t)
    feats = spread(docs).select(
        F.col(id_col),
        char_count(t).alias("n_chars"),
        n_tok.alias("n_tokens"),
        F.round(punct_ratio(t), 6).alias("punct_ratio"),
        F.round(stopword_ratio(t), 6).alias("stopword_ratio"),
        F.round(mean_token_len(t), 6).alias("mean_token_len"),
    )
    score = (
        F.least(F.col("n_tokens") / 100.0, F.lit(1.0)) * 0.5
        + (1.0 - F.least(F.col("punct_ratio") * 5.0, F.lit(1.0))) * 0.3
        + F.least(F.col("stopword_ratio") * 5.0, F.lit(1.0)) * 0.2
    )
    return feats.withColumn("quality_score", F.round(score, 6))


def lang_scores(text: Column, markers: dict[str, list[str]] | None = None) -> dict[str, Column]:
    """Marker-hit-count per language over lowercased tokens."""
    markers = markers or LANG_MARKERS
    toks = tokens(F.lower(text))
    out = {}
    for lang, words in markers.items():
        arr = F.array(*[F.lit(w) for w in words])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    return out


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Predicted language = argmax marker score, 'und' when all zero.
    Deterministic tie-break: language list order."""
    scores = lang_scores(F.col(text_col))
    best = F.lit("und")
    best_score = F.lit(0)
    # iterate in fixed order; strictly-greater keeps first-wins ties
    for lang, s in scores.items():
        cond = s > best_score
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, s).otherwise(best_score)
    return spread(docs).select(
        F.col(id_col),
        *[s.alias(f"score_{lang}") for lang, s in scores.items()],
        best.alias("pred_lang"),
    )


def fingerprints(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Document fingerprints: normalized-text MD5 (fuzzy-exact identity)
    + a 60-bit integer content hash for compact storage/joins."""
    norm = normalize_text(F.col(text_col))
    return spread(docs).select(
        F.col(id_col),
        F.md5(norm).alias("fingerprint_md5"),
        md5_long(norm).alias("fingerprint_long"),
    )


def term_counts(
    docs: DataFrame, keys: list[str] | None = None, text_col: str = "text"
) -> DataFrame:
    """(keys…, term, n) long table of lowercased whitespace-token counts.

    One explode + one hash-groupBy with map-side partial counts — the
    shuffle carries (key, term) partials, not the token stream. The
    canonical first stage of vocabulary / Zipf / top-terms analyses.
    """
    keys = list(keys or [])
    toks = spread(docs).select(
        *keys, F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    )
    return toks.groupBy(*keys, "term").agg(F.count(F.lit(1)).alias("n"))


def top_terms(
    docs: DataFrame, k: int = 5, keys: list[str] | None = None, text_col: str = "text"
) -> DataFrame:
    """Top-k most frequent terms per key group with a deterministic
    (count desc, term asc) order. The ranking window runs over the
    already-aggregated count table (vocabulary-sized, not corpus-sized);
    Spark's WindowGroupLimit pushes the k cutoff below the sort."""
    keys = list(keys or [])
    counts = term_counts(docs, keys, text_col)
    w = (W.partitionBy(*keys) if keys else W.partitionBy()).orderBy(
        F.col("n").desc(), F.col("term").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .withColumn("rank", F.col("rank").cast("long"))
    )


def ngram_counts(docs: DataFrame, k: int = 2, text_col: str = "text") -> DataFrame:
    """(ngram, n) global k-word-shingle frequency over lowercased text.
    Documents shorter than k tokens are dropped (no partial shingle).
    Same explode→groupBy shape as term_counts."""
    lt = F.lower(F.col(text_col))
    base = spread(docs).select(lt.alias("_lt")).filter(F.size(tokens(F.col("_lt"))) >= k)
    grams = base.select(F.explode(word_shingles(F.col("_lt"), k)).alias("ngram"))
    return grams.groupBy("ngram").agg(F.count(F.lit(1)).alias("n"))
