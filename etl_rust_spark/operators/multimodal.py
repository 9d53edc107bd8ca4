"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side architecture is real and tested — typed binary+metadata
schema, Arrow-batched ``mapInPandas`` (never per-row Python), partition
sizing notes — while the actual media decode is STUBBED behind
``_decode_stub`` (no image/audio libraries ship in this container). Swap
``_decode_stub`` for a PIL/ffmpeg call and nothing else changes.

Scale notes: binary payloads make rows wide — keep
``spark.sql.files.maxPartitionBytes`` low enough that one Arrow batch of
blobs fits executor memory, and repartition upstream by size class if blob
sizes are heavily skewed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

FEATURE_SCHEMA = (
    "doc_id long, mime string, n_bytes long, width int, height int, checksum long"
)


def _decode_stub(blob: bytes) -> tuple[int, int]:
    """Deterministic fake decoder (stand-in for PIL.Image.open etc.).

    Real decode is NOT implemented here — container has no media libs.
    The fake is deterministic so tests can assert the plumbing.
    """
    n = len(blob)
    return (n % 640) + 1, ((n * 7) % 480) + 1


def extract_features(df: DataFrame) -> DataFrame:
    """df: (doc_id long, blob binary, mime string) → per-blob features.

    mapInPandas: Arrow ships whole column batches to one Python worker per
    partition; the loop below is over *batches*, and the per-row work is
    numpy/pandas vectorized where possible.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf["blob"]
            dims = [_decode_stub(b) for b in blobs]  # stub: real decode here
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "n_bytes": blobs.map(len).astype("int64"),
                    "width": pd.Series([d[0] for d in dims], dtype="int32"),
                    "height": pd.Series([d[1] for d in dims], dtype="int32"),
                    "checksum": blobs.map(
                        lambda b: sum(b[:64]) if b else 0
                    ).astype("int64"),
                }
            )

    return df.mapInPandas(op, schema=FEATURE_SCHEMA)
