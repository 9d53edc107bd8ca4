"""Text-analysis operators for training-data curation — language ID
(n-gram/stopword heuristic), quality scoring, token counting, document
fingerprinting. All pure column expressions (whole-stage codegen, no
Python), each with an exact ANSI-SQL twin for the oracle."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_rust_spark.functions.hashing import shingles

# small fixed English stoplist — enough signal for a heuristic LID
EN_STOPWORDS = [
    "the", "of", "and", "to", "in", "a", "is", "that", "it", "for",
    "on", "with", "as", "was", "at", "by", "an", "be", "this", "are",
]

TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"  # BPE-ish word/number/punct split


def words_lower(text_col: str) -> Column:
    return F.expr(f"filter(split(lower({text_col}), ' '), w -> length(w) > 0)")


def stopword_ratio(text_col: str) -> Column:
    stoplist = ", ".join(f"'{w}'" for w in EN_STOPWORDS)
    return F.expr(
        f"CAST(size(filter(filter(split(lower({text_col}), ' '), w -> length(w) > 0),"
        f" w -> array_contains(array({stoplist}), w))) AS DOUBLE)"
        f" / greatest(size(filter(split(lower({text_col}), ' '), w -> length(w) > 0)), 1)"
    )


def language_id(text_col: str, en_threshold: float = 0.12) -> Column:
    """Heuristic LID: English iff stopword ratio clears the threshold."""
    return F.when(stopword_ratio(text_col) >= en_threshold, F.lit("en")).otherwise(
        F.lit("other")
    )


def token_count(text_col: str) -> Column:
    return F.regexp_count(F.col(text_col), F.lit(TOKEN_REGEX))


def punct_ratio(text_col: str) -> Column:
    return F.regexp_count(F.col(text_col), F.lit(r"[^\sA-Za-z0-9]")).cast(
        "double"
    ) / F.greatest(F.length(text_col), F.lit(1))


def mean_word_len(text_col: str) -> Column:
    return F.expr(
        f"CAST(aggregate(filter(split({text_col}, ' '), w -> length(w) > 0), 0,"
        f" (acc, w) -> acc + length(w)) AS DOUBLE)"
        f" / greatest(size(filter(split({text_col}, ' '), w -> length(w) > 0)), 1)"
    )


def quality_score(text_col: str) -> Column:
    """Composite curation score in [0,1]-ish: rewards natural word length
    and stopword presence, penalizes punctuation soup and extremes."""
    length_score = F.least(F.length(text_col).cast("double") / 500.0, F.lit(1.0))
    word_len = mean_word_len(text_col)
    word_len_score = F.lit(1.0) - F.least(F.abs(word_len - 5.0) / 5.0, F.lit(1.0))
    return F.round(
        0.3 * length_score
        + 0.3 * word_len_score
        + 0.3 * F.least(stopword_ratio(text_col) * 4.0, F.lit(1.0))
        + 0.1 * (1.0 - F.least(punct_ratio(text_col) * 5.0, F.lit(1.0))),
        6,
    )


def doc_fingerprint(text_col: str, shingle_n: int = 4) -> Column:
    """Winnowing-style document fingerprint: the minimal shingle hash —
    robust to local edits, computed per-row with zero shuffle."""
    return F.array_min(F.transform(shingles(text_col, shingle_n), F.md5))


def analyze_documents(docs: DataFrame, text_col: str = "text") -> DataFrame:
    return docs.select(
        "doc_id",
        token_count(text_col).alias("n_tokens"),
        F.round(stopword_ratio(text_col), 6).alias("stopword_ratio"),
        F.round(punct_ratio(text_col), 6).alias("punct_ratio"),
        language_id(text_col).alias("lang_pred"),
        quality_score(text_col).alias("quality"),
        doc_fingerprint(text_col).alias("fingerprint"),
    )
