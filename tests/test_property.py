"""Property-based check (hypothesis): for ANY changelog — arbitrary op
sequences, duplicate deliveries, arbitrary emission order, arbitrary
batch boundaries, either merge mode — the engine's final state equals the
independent oracle replay. (The reference only aspired to property tests,
docs/plans/...-design.md:147.)"""

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_rust_spark.changelog import CHANGELOG_SCHEMA, replay_oracle_pandas
from etl_rust_spark.operators.apply import (
    apply_changes,
    create_transcript_table,
    read_transcripts,
)
from tests.conftest import assert_pdf_equal

KEYS = [("c0", 0), ("c0", 1), ("c1", 0), ("c1", 1), ("c2", 0)]


@st.composite
def changelogs(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    rows = []
    for lsn in range(n):
        conv, turn = draw(st.sampled_from(KEYS))
        op = draw(st.sampled_from(["I", "U", "U", "D"]))
        is_del = op == "D"
        rows.append(
            {
                "lsn": lsn,
                "op": op,
                "conv_id": conv,
                "turn_idx": np.int32(turn),
                "role": None if is_del else draw(st.sampled_from(["user", "assistant"])),
                "text": None if is_del else f"t-{lsn}-{draw(st.integers(0, 99))}",
                "tool": None if is_del else "",
                "ts": pd.NaT if is_del else pd.Timestamp("2025-01-01") + pd.Timedelta(seconds=lsn),
            }
        )
    # duplicate deliveries
    n_dups = draw(st.integers(min_value=0, max_value=min(5, n)))
    for _ in range(n_dups):
        rows.append(dict(rows[draw(st.integers(0, n - 1))]))
    # arbitrary emission order
    order = draw(st.permutations(range(len(rows))))
    pdf = pd.DataFrame([rows[i] for i in order])
    n_batches = draw(st.integers(min_value=1, max_value=3))
    mode = draw(st.sampled_from(["cow", "mor"]))
    return pdf, n_batches, mode


@given(case=changelogs())
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_any_changelog_replays_to_oracle_state(spark, tmp_path_factory, case):
    pdf, n_batches, mode = case
    path = tmp_path_factory.mktemp("prop")
    table = create_transcript_table(spark, str(path / "t"), n_buckets=4)
    for i, idx in enumerate(np.array_split(np.arange(len(pdf)), n_batches)):
        if len(idx) == 0:
            continue
        batch = spark.createDataFrame(pdf.iloc[idx], schema=CHANGELOG_SCHEMA)
        apply_changes(table, batch, batch_key=f"b{i}", mode=mode)
    actual = read_transcripts(table).toPandas()
    expected = replay_oracle_pandas(pdf)
    if len(expected) == 0:
        assert len(actual) == 0
    else:
        assert_pdf_equal(actual, expected)


def test_knuth_hash_full_long_domain(spark):
    """ADVICE fix regression: the multiplicative fingerprint must be exact
    (and ANSI-safe) across the FULL signed-64 domain — the old long
    multiply overflowed past x≈3.4e9."""
    from etl_rust_spark.functions.hashing import knuth_hash

    xs = [0, 1, 3_400_000_000, 2**31, 2**40 + 7, 2**62, 2**63 - 1,
          -1, -(2**62), -(2**63)]
    df = spark.createDataFrame([(x,) for x in xs], "x long")
    got = {r["x"]: r["h"] for r in df.select("x", knuth_hash("x").alias("h")).collect()}
    for x in xs:
        assert got[x] == (x * 2654435761) % (2**32), x

    # the DuckDB twin must agree on the SAME full domain — DuckDB's % is
    # sign-following, so the SQL re-normalizes (ADVICE r02: the two
    # engines diverged for negative inputs)
    import duckdb

    from etl_rust_spark.functions.hashing import knuth_hash_sql

    con = duckdb.connect()
    con.execute("CREATE TABLE t (x BIGINT)")
    con.executemany("INSERT INTO t VALUES (?)", [(x,) for x in xs])
    duck = dict(
        con.execute(f"SELECT x, {knuth_hash_sql('x')} FROM t").fetchall()
    )
    assert duck == got
