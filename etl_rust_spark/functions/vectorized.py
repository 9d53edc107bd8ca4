"""Vectorized Python surface (reference §2.4 'UDF/UDAF' slots).

The reference's whole framework is a UDF surface — ``transform`` is the
scalar slot (/root/reference/src/etl/processor.rs:38), ``load``/
``BatchProcessor::process`` the batch slot (:43). Spark-side the rule is:
built-in expressions first; when Python is unavoidable, Arrow-batched
pandas UDFs — NEVER row-at-a-time Python.

These are reference implementations of both slots, tested for agreement
with their pure-expression twins:

- ``quality_score_udf`` — scalar pandas UDF (Series→Series), same formula
  as ``operators.text.quality_score``.
- ``weighted_mean_udaf`` — grouped-aggregate pandas UDF (UDAF slot).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from etl_rust_spark.operators.text import EN_STOPWORDS

_STOPSET = frozenset(EN_STOPWORDS)


@F.pandas_udf(DoubleType())
def quality_score_udf(text: pd.Series) -> pd.Series:
    """Arrow-vectorized twin of operators.text.quality_score."""
    s = text.fillna("")
    length = s.str.len().astype("float64")
    words = s.str.lower().str.split(" ").map(lambda ws: [w for w in ws if w])
    n_words = words.map(len).clip(lower=1).astype("float64")
    raw_words = s.str.split(" ").map(lambda ws: [w for w in ws if w])
    n_raw = raw_words.map(len).clip(lower=1).astype("float64")
    sum_wlen = raw_words.map(lambda ws: sum(len(w) for w in ws)).astype("float64")
    stop = words.map(lambda ws: sum(w in _STOPSET for w in ws)).astype("float64")
    punct = s.str.count(r"[^\sA-Za-z0-9]").astype("float64")

    length_score = np.minimum(length / 500.0, 1.0)
    mwl = sum_wlen / n_raw
    word_len_score = 1.0 - np.minimum(np.abs(mwl - 5.0) / 5.0, 1.0)
    stop_ratio = stop / n_words
    punct_ratio = punct / np.maximum(length, 1.0)
    score = (
        0.3 * length_score
        + 0.3 * word_len_score
        + 0.3 * np.minimum(stop_ratio * 4.0, 1.0)
        + 0.1 * (1.0 - np.minimum(punct_ratio * 5.0, 1.0))
    )
    # HALF_UP to match Spark's round() (np.round is banker's rounding)
    return np.floor(score * 1e6 + 0.5) / 1e6


@F.pandas_udf(DoubleType())
def weighted_mean_udaf(value: pd.Series, weight: pd.Series) -> float:
    """Grouped-agg pandas UDF (UDAF slot): sum(v*w)/sum(w)."""
    w = weight.fillna(0.0)
    denom = w.sum()
    return float((value.fillna(0.0) * w).sum() / denom) if denom else 0.0
