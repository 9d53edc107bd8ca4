import pandas as pd
import pytest

from etl_rust_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    # small parallelism: test datasets are tiny; real sizing is bench.py's job
    return get_spark("etl_rust_spark-tests", master="local[4]", shuffle_partitions=8)


def assert_pdf_equal(actual: pd.DataFrame, expected: pd.DataFrame, sort_cols=None):
    """Order-insensitive frame equality with stable key ordering — the
    reference's sort-then-compare pattern (src/bucket/bucket.rs:425-430)."""
    sort_cols = sort_cols or [c for c in ("conv_id", "turn_idx") if c in actual.columns]
    a = actual.sort_values(sort_cols).reset_index(drop=True)
    e = expected.sort_values(sort_cols).reset_index(drop=True)
    a = a[sorted(a.columns)]
    e = e[sorted(e.columns)]
    pd.testing.assert_frame_equal(a, e, check_dtype=False, check_like=True)
