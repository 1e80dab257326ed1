"""Text quality scoring, language-ID heuristics, token counting, and
document fingerprinting over a ``documents`` table.

Everything is a Catalyst expression over functions/text.py — one pass,
no shuffle (per-document map work), column-pruned to the text column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
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
