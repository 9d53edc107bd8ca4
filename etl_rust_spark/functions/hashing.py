"""Cross-engine deterministic hashing primitives.

Everything here is chosen to produce BIT-IDENTICAL results in Spark SQL and
ANSI SQL (DuckDB) so the driver's oracle comparison is exact:

- ``md5_long``: first 15 hex digits of md5 as a signed 60-bit integer.
  Spark: ``conv(substring(md5(x),1,15),16,10)``; DuckDB:
  ``CAST('0x'||substring(md5(x),1,15) AS BIGINT)`` — verified equal.
- ``knuth_hash``: multiplicative fingerprint ``(x*2654435761) % 2^32``.
  The reference uses a 64-bit multiplicative fingerprint
  (/root/reference/benches/etl_streaming_benchmark_optimized.rs:85,111);
  a 64-bit wrap would overflow under Spark 4's default ANSI mode, so the
  product is computed exactly in DECIMAL(38,0) (Spark) / HUGEINT (DuckDB)
  and reduced mod 2^32 — safe for the FULL signed-64 input domain, not
  just 32-bit ids (a bare ``long * 2654435761`` overflows past x≈3.4e9).
- ``shingles``: word n-gram shingling with higher-order array functions
  (JVM-side, codegen'd — no Python in the path).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_long(col: Column | str) -> Column:
    """Uniform 60-bit hash of a string column (JVM md5, no UDF)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str) -> str:
    """DuckDB-side equivalent of md5_long (verified bit-identical)."""
    return f"CAST(CONCAT('0x', SUBSTRING(md5({expr}), 1, 15)) AS BIGINT)"


def knuth_hash(col: Column | str) -> Column:
    """32-bit multiplicative fingerprint, exact over the full long domain
    (the product runs in decimal(38,0), so ANSI mode can never overflow)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.pmod(
        c.cast("decimal(38,0)") * F.lit(2654435761), F.lit(4294967296)
    ).cast("long")


def knuth_hash_sql(expr: str) -> str:
    """DuckDB twin of knuth_hash. DuckDB's ``%`` follows the dividend's
    sign while Spark's ``pmod`` is always nonnegative, so the remainder is
    re-normalized (+m then % m again) to stay engine-identical for
    NEGATIVE inputs too (ADVICE r02)."""
    prod = f"(CAST({expr} AS HUGEINT) * 2654435761)"
    return f"CAST((({prod} % 4294967296) + 4294967296) % 4294967296 AS BIGINT)"


def shingles(text_col: str, n: int = 3) -> Column:
    """Word n-gram shingles as array<string> (empty-safe).

    transform(sequence(...)) keeps the whole computation in whole-stage
    codegen — the Spark-idiomatic replacement for a per-row tokenizer UDF.
    """
    words = f"split({text_col}, ' ')"
    # guard short texts: sequence(1, 0) would DESCEND ([1,0]) in Spark
    return F.expr(
        f"CASE WHEN size({words}) >= {n} THEN"
        f" transform(sequence(1, size({words}) - {n - 1}),"
        f" i -> array_join(slice({words}, i, {n}), ' '))"
        f" ELSE array_remove(array(''), '') END"
    )


def shingles_sql(expr: str, n: int = 3) -> str:
    """DuckDB equivalent of shingles() (1-based inclusive list slicing)."""
    words = f"string_split({expr}, ' ')"
    return (
        f"list_transform(range(1, greatest(len({words}) - {n - 2}, 1)),"
        f" i -> array_to_string({words}[i:i+{n - 1}], ' '))"
    )
