"""Text-analysis operators for training-data curation — language ID
(n-gram/stopword heuristic), quality scoring, token counting, document
fingerprinting. All pure column expressions (whole-stage codegen, no
Python), each with an exact ANSI-SQL twin for the oracle."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_rust_spark.functions.hashing import shingles

# small fixed stoplists (public common-word lists) — enough signal for a
# heuristic LID; accent-free spellings keep the Spark/DuckDB twins
# byte-identical without unicode-collation concerns
EN_STOPWORDS = [
    "the", "of", "and", "to", "in", "a", "is", "that", "it", "for",
    "on", "with", "as", "was", "at", "by", "an", "be", "this", "are",
]
STOPWORDS = {
    "en": EN_STOPWORDS,
    "es": [
        "el", "la", "los", "las", "de", "que", "y", "en", "un", "una",
        "es", "se", "no", "por", "con", "para", "como", "pero", "sus", "le",
    ],
    "fr": [
        "le", "les", "des", "une", "est", "dans", "pour", "au", "aux", "ce",
        "il", "elle", "ne", "pas", "sur", "avec", "son", "mais", "nous", "vous",
    ],
    "de": [
        "der", "die", "das", "und", "ist", "nicht", "ein", "eine", "zu",
        "den", "dem", "mit", "auf", "von", "sich", "auch", "als", "wir",
        "aber", "ich",
    ],
}
LID_LANGS = ("en", "es", "fr", "de")

TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"  # BPE-ish word/number/punct split


def words_lower(text_col: str) -> Column:
    return F.expr(f"filter(split(lower({text_col}), ' '), w -> length(w) > 0)")


def stopword_ratio(text_col: str, lang: str = "en") -> Column:
    stoplist = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return F.expr(
        f"CAST(size(filter(filter(split(lower({text_col}), ' '), w -> length(w) > 0),"
        f" w -> array_contains(array({stoplist}), w))) AS DOUBLE)"
        f" / greatest(size(filter(split(lower({text_col}), ' '), w -> length(w) > 0)), 1)"
    )


def language_id(
    text_col: str,
    threshold: float = 0.12,
    langs: tuple[str, ...] = LID_LANGS,
) -> Column:
    """Heuristic multi-language LID (round 3 — was an en/other binary):
    per-language stopword ratio, argmax above ``threshold``, else
    'other'. Ties break toward the earlier language in ``langs`` — the
    cascade shape is mirrored verbatim in the DuckDB oracle, and the
    ratios are exact int/int doubles, so both engines agree bit-for-bit.
    Pure codegen expressions (the word split is inlined per language —
    Catalyst doesn't CSE across lambdas; acceptable for a 4-way cascade,
    measured in the lang_id oracle queries)."""
    ratios = [stopword_ratio(text_col, lang) for lang in langs]
    expr = F.lit("other")
    for i in range(len(langs) - 1, -1, -1):
        cond = ratios[i] >= threshold
        for j in range(i + 1, len(langs)):
            cond = cond & (ratios[i] >= ratios[j])
        expr = F.when(cond, F.lit(langs[i])).otherwise(expr)
    return expr


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


# PII patterns (round 3): kept inside the RE2 ∩ Java-regex common subset
# (no lookaround, ASCII \b and \d only) so Spark and the DuckDB oracle
# match byte-identically. Shapes are mutually exclusive (SSN has a 2-digit
# middle group, phones 3; IPv4 needs three dots), so redaction order
# cannot change the result.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
    "phone": r"\b\d{3}[-.]\d{3}[-.]\d{4}\b",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
}


def pii_count(text_col: str, kind: str) -> Column:
    """Non-overlapping match count for one PII kind (JVM regexp_count)."""
    return F.regexp_count(F.col(text_col), F.lit(PII_PATTERNS[kind]))


def redact_pii(text_col: str) -> Column:
    """Replace every PII match with its [KIND] placeholder — chained
    global regexp_replace, whole-stage codegen, zero Python. The
    replacement order is fixed (email, ssn, phone, ipv4) and mirrored in
    the SQL oracle."""
    c = F.col(text_col)
    for kind, pat in PII_PATTERNS.items():
        c = F.regexp_replace(c, pat, f"[{kind.upper()}]")
    return c


def pii_scan(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc PII counts + redacted text — the pre-training scrub pass."""
    return docs.select(
        "doc_id",
        *[pii_count(text_col, k).alias(f"n_{k}") for k in PII_PATTERNS],
        redact_pii(text_col).alias("redacted"),
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
