"""Spark-compatible XXH64 in Python — the bucket hash, executor-side.

``format("icelite")``'s native streaming SINK assigns each row its file
bucket inside a Python worker, where no SparkSession (and no JVM
``F.xxhash64``) exists. The table's layout invariant is
``bucket = pmod(xxhash64(bucket_key), n_buckets)`` (lake/format.py
``_bucket_expr``), so the Python side must reproduce Spark's XXH64
bit-for-bit or bucket pruning silently corrupts.

XXH64 is a public algorithm (Yann Collet, BSD); Spark's
``org.apache.spark.sql.catalyst.expressions.XXH64`` applies it per type:

- long (and the 8-byte tail path): ``hash = seed + P5 + 8``, one 8-byte
  round, avalanche;
- int/short/byte/boolean: the 4-byte path (``seed + P5 + 4``) over the
  value's 32-bit two's complement — NOT widened to long;
- strings: standard XXH64 over the UTF-8 bytes (32-byte stripes, 8/4/1
  tails).

Seed is Spark's default 42. ``tests/test_icelite_sink.py`` differential-
tests every path against ``F.xxhash64`` on randomized values, so a Spark
implementation change would fail loudly rather than mis-bucket.

The long/int paths are numpy-vectorized (the hot path: integer conv-id
keys hash at memory bandwidth); strings fall back to a per-value scalar
loop — fine for a tail sink's micro-batches, and the reason bulk
backfills should go through ``apply_changes`` (JVM) instead.
"""

from __future__ import annotations

import numpy as np

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1

SPARK_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def xxh64_bytes(data: bytes, seed: int = SPARK_SEED) -> int:
    """Standard XXH64 over a byte string (Spark's string-column path).
    Returns the UNSIGNED 64-bit digest; callers wanting Spark's LongType
    view subtract 2**64 when the high bit is set."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i + 32 <= n:
            for off, upd in ((0, 1), (8, 2), (16, 3), (24, 4)):
                w = int.from_bytes(data[i + off : i + off + 8], "little")
                if upd == 1:
                    v1 = (_rotl((v1 + w * _P2) & _M, 31) * _P1) & _M
                elif upd == 2:
                    v2 = (_rotl((v2 + w * _P2) & _M, 31) * _P1) & _M
                elif upd == 3:
                    v3 = (_rotl((v3 + w * _P2) & _M, 31) * _P1) & _M
                else:
                    v4 = (_rotl((v4 + w * _P2) & _M, 31) * _P1) & _M
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * _P2) & _M, 31) * _P1) & _M
            h = (h * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        w = int.from_bytes(data[i : i + 8], "little")
        h ^= (_rotl((w * _P2) & _M, 31) * _P1) & _M
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        w = int.from_bytes(data[i : i + 4], "little")
        h ^= (w * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    return _fmix(h)


def _np_rotl(x: np.ndarray, r: int) -> np.ndarray:
    return (x << np.uint64(r)) | (x >> np.uint64(64 - r))


def _np_fmix(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> np.uint64(33))
    h = h * np.uint64(_P2)
    h = h ^ (h >> np.uint64(29))
    h = h * np.uint64(_P3)
    return h ^ (h >> np.uint64(32))


def xxh64_longs(vals: np.ndarray, seed: int = SPARK_SEED) -> np.ndarray:
    """Vectorized Spark ``XXH64.hashLong`` over an int64 array → uint64
    digests (numpy uint64 arithmetic wraps mod 2**64, matching Java)."""
    with np.errstate(over="ignore"):
        v = vals.astype(np.int64).view(np.uint64)
        k1 = _np_rotl(v * np.uint64(_P2), 31) * np.uint64(_P1)
        h = np.uint64((seed + _P5 + 8) & _M) ^ k1
        h = _np_rotl(h, 27) * np.uint64(_P1) + np.uint64(_P4)
        return _np_fmix(h)


def xxh64_ints(vals: np.ndarray, seed: int = SPARK_SEED) -> np.ndarray:
    """Vectorized Spark ``XXH64.hashInt`` (the 4-byte path Spark uses for
    int/short/byte/boolean columns — values as unsigned 32-bit)."""
    with np.errstate(over="ignore"):
        v = vals.astype(np.int32).view(np.uint32).astype(np.uint64)
        h = np.uint64((seed + _P5 + 4) & _M) ^ (v * np.uint64(_P1))
        h = _np_rotl(h, 23) * np.uint64(_P2) + np.uint64(_P3)
        return _np_fmix(h)


def spark_bucket_of(arr, n_buckets: int, seed: int = SPARK_SEED) -> np.ndarray:
    """``pmod(xxhash64(col), n_buckets)`` for a pyarrow Array/ChunkedArray
    of the table's bucket-key column. Integral columns vectorize; strings
    hash per value. Raises on unsupported types and on nulls (a CDC key
    is never null; fail fast beats mis-bucketing)."""
    import pyarrow as pa
    import pyarrow.types as pt

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        raise ValueError("bucket key column contains nulls")
    t = arr.type
    if pt.is_integer(t):
        np_vals = arr.to_numpy(zero_copy_only=False)
        if t.bit_width == 64:
            h = xxh64_longs(np_vals, seed)
        else:
            h = xxh64_ints(np_vals, seed)
    elif pt.is_string(t) or pt.is_large_string(t):
        h = np.fromiter(
            (xxh64_bytes(s.encode("utf-8"), seed) for s in arr.to_pylist()),
            dtype=np.uint64,
            count=len(arr),
        )
    else:
        raise ValueError(f"unsupported bucket key type for the native sink: {t}")
    signed = h.view(np.int64)
    return (signed % np.int64(n_buckets)).astype(np.int64)
