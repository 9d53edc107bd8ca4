"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query (keyed event stream → per-key final
state, the engine's CDC semantics as a pure query) at sf0.001.
``queries``/``oracle_sql`` expose the full operator surface from
``etl_rust_spark.queries`` (SURVEY.md §2 inventory + training-data ops).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etl_rust_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["cdc_final_state"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Each callable takes (spark, sf_dir) and returns a DataFrame.
    Every computed/aggregate column is aliased to match ``oracle_sql``.
    """
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """Equivalent ANSI SQL per query, runnable by DuckDB on the
    pre-registered parquet views. Queries absent here (multimodal stub)
    get the driver's weaker rows-only check."""
    return dict(ORACLES)
