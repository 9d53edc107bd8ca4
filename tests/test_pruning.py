"""Predicate-driven FILE pruning on the general read path (round-3 #1):
per-file min/max manifest stats for key/order/ts/numeric columns drive
``read(where=...)`` file skipping BEFORE the parquet scan, proven by
counting distinct ``input_file_name()`` — plus the merge-on-read safety
rule (non-key predicates never prune under deltas) and the null/legacy
stats guards (ADVICE r02).

Reference analog: the whole point of the example's keyed sink design is
selective access (/root/reference/example/create_schema.sql:3-135 PK
design); Icelite's manifest stats are the Iceberg-shaped equivalent.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from etl_rust_spark.lake.format import IceliteTable, _bucket_expr, _file_may_match
from etl_rust_spark.operators.apply import apply_changes, create_transcript_table

CHANGE_SCHEMA = (
    "lsn long, op string, conv_id string, turn_idx int, role string, "
    "text string, tool string, ts timestamp"
)


def _pick_bucket_disjoint_convs(spark, n_buckets, k=3):
    """Two conv-id groups guaranteed to land in disjoint buckets, so CoW
    commits for group A never rewrite group B's files."""
    cands = spark.createDataFrame(
        [(f"conv-{i:03d}",) for i in range(128)], "conv_id string"
    ).select("conv_id", _bucket_expr("conv_id", n_buckets).alias("b"))
    a, b, a_buckets, b_buckets = [], [], set(), set()
    for r in cands.collect():
        if len(a) < k and r["b"] not in b_buckets:
            a.append(r["conv_id"])
            a_buckets.add(r["b"])
        elif len(b) < k and r["b"] not in a_buckets:
            b.append(r["conv_id"])
            b_buckets.add(r["b"])
    assert len(a) == k and len(b) == k
    return a, b


def _batch(spark, convs, ts, lsn0):
    rows = [
        (lsn0 + i * 10 + t, "I", c, t, "user", f"text {c} {t}", "",
         ts + dt.timedelta(minutes=t))
        for i, c in enumerate(convs)
        for t in range(5)
    ]
    return spark.createDataFrame(rows, CHANGE_SCHEMA)


def _files_read(df):
    """Files backing the plan's scan node (survives aggregations, unlike
    input_file_name after a shuffle)."""
    return set(df.inputFiles())


def test_ts_range_pruning_on_cow_table(spark, tmp_path):
    """Delta-free table: a ts-range read touches ONLY the files whose
    stats overlap the range, and returns exactly the unpruned answer."""
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=16)
    convs_a, convs_b = _pick_bucket_disjoint_convs(spark, 16)
    jan, jun = dt.datetime(2025, 1, 1), dt.datetime(2025, 6, 1)
    apply_changes(table, _batch(spark, convs_a, jan, 0), batch_key="a")
    apply_changes(table, _batch(spark, convs_b, jun, 1000), batch_key="b")

    all_files = _files_read(table.read())
    where = [("ts", ">=", jun)]
    pruned = table.read(where=where)
    pruned_files = _files_read(pruned)
    # strictly fewer files scanned, and none of batch A's files touched
    assert pruned_files < all_files
    expected = table.read().filter(F.col("ts") >= F.lit(jun))
    assert sorted(map(tuple, pruned.collect())) == sorted(
        map(tuple, expected.collect())
    )
    assert pruned.count() == 15  # batch B only

    # between on ts: only batch A's window
    feb = dt.datetime(2025, 2, 1)
    ja = table.read(where=[("ts", "between", (jan, feb))])
    assert _files_read(ja) < all_files
    assert ja.count() == 15


def test_key_predicate_pruning_and_file_counts(spark, tmp_path):
    """conv_id equality prunes down to the one conversation's files —
    bucket alignment + per-file key ranges."""
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=16)
    convs_a, convs_b = _pick_bucket_disjoint_convs(spark, 16)
    jan = dt.datetime(2025, 1, 1)
    apply_changes(table, _batch(spark, convs_a, jan, 0), batch_key="a")
    apply_changes(table, _batch(spark, convs_b, jan, 1000), batch_key="b")
    target = convs_a[0]
    got = table.read(where=[("conv_id", "=", target)])
    assert _files_read(got) < _files_read(table.read())
    assert got.count() == 5
    assert {r["conv_id"] for r in got.select("conv_id").distinct().collect()} == {
        target
    }


def test_nonkey_pruning_is_disabled_under_mor_deltas(spark, tmp_path):
    """The adversarial MoR case: the key's NEWER version (in a delta)
    falls outside the ts predicate while its older base version matches.
    Naive stats pruning would skip the delta and resurrect the old row;
    the read must return empty."""
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    jan, jun = dt.datetime(2025, 1, 1), dt.datetime(2025, 6, 1)
    b1 = spark.createDataFrame(
        [(1, "I", "c1", 0, "user", "v1", "", jan)], CHANGE_SCHEMA
    )
    b2 = spark.createDataFrame(
        [(2, "U", "c1", 0, "user", "v2", "", jun)], CHANGE_SCHEMA
    )
    apply_changes(table, b1, batch_key="b1", mode="mor")
    apply_changes(table, b2, batch_key="b2", mode="mor")
    ptr = table.pointer()
    kinds = {f.get("kind", "base") for f in table._files(ptr)}
    assert "delta" in kinds  # precondition: snapshot really holds deltas
    got = table.read(
        where=[("ts", "between", (jan, dt.datetime(2025, 2, 1)))]
    )
    assert got.count() == 0  # current version of (c1,0) is June — excluded
    # and the current row is still reachable
    assert table.read(where=[("ts", ">=", jun)]).count() == 1


def test_key_pruning_still_applies_under_mor_deltas(spark, tmp_path):
    """Key-column predicates prune even with deltas present (all versions
    of a key share its key values)."""
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=16)
    convs_a, convs_b = _pick_bucket_disjoint_convs(spark, 16)
    jan = dt.datetime(2025, 1, 1)
    apply_changes(table, _batch(spark, convs_a, jan, 0), batch_key="a", mode="mor")
    apply_changes(table, _batch(spark, convs_b, jan, 1000), batch_key="b", mode="mor")
    got = table.read(where=[("conv_id", "=", convs_a[0])])
    assert _files_read(got) < _files_read(table.read())
    assert got.count() == 5


def test_pruned_read_equals_filter_on_evolved_table(spark, tmp_path):
    """Old files lack stats for an evolved column → non-skippable for
    predicates on it; results still exact."""
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    jan = dt.datetime(2025, 1, 1)
    apply_changes(
        table,
        spark.createDataFrame([(1, "I", "c1", 0, "u", "x", "", jan)], CHANGE_SCHEMA),
        batch_key="b1",
    )
    evolved = CHANGE_SCHEMA + ", score double"
    apply_changes(
        table,
        spark.createDataFrame(
            [(2, "I", "c2", 0, "u", "y", "", jan, 0.75)], evolved
        ),
        batch_key="b2",
    )
    got = table.read(where=[("score", ">=", 0.5)])
    assert got.count() == 1
    assert got.collect()[0]["conv_id"] == "c2"


def test_file_may_match_guards():
    """ADVICE r02: null stats (all-null column), legacy entries, and
    incomparable types are never skippable."""
    sch = {}
    # null stats → include
    assert _file_may_match({"stats": {"k": [None, None]}}, [("k", "=", 5)], sch, "k")
    # legacy entry: only kmin/kmax for the bucket key
    legacy = {"kmin": "a", "kmax": "m"}
    assert _file_may_match(legacy, [("k", "=", "b")], sch, "k")
    assert not _file_may_match(legacy, [("k", "=", "z")], sch, "k")
    # legacy null kmin (the exact ADVICE crash): include, don't TypeError
    assert _file_may_match({"kmin": None, "kmax": None}, [("k", "=", "z")], sch, "k")
    # incomparable predicate value vs stored stat type → include
    assert _file_may_match({"stats": {"k": ["a", "m"]}}, [("k", "=", 5)], sch, "k")
    # no stats at all (pre-stats manifest) → include
    assert _file_may_match({}, [("k", "=", 5)], sch, "k")
    # provable exclusions across ops
    e = {"stats": {"x": [10, 20]}}
    assert not _file_may_match(e, [("x", "<", 10)], sch, None)
    assert not _file_may_match(e, [("x", "<=", 9)], sch, None)
    assert not _file_may_match(e, [("x", ">", 20)], sch, None)
    assert not _file_may_match(e, [("x", ">=", 21)], sch, None)
    assert not _file_may_match(e, [("x", "between", (21, 30))], sch, None)
    assert _file_may_match(e, [("x", "between", (20, 30))], sch, None)


def test_read_keys_null_and_type_safety(spark, tmp_path):
    """read_keys survives stats that can't be compared to the probe
    values (returns the correct empty/complete answer, never TypeError)."""
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    jan = dt.datetime(2025, 1, 1)
    apply_changes(
        table,
        spark.createDataFrame([(1, "I", "c1", 0, "u", "x", "", jan)], CHANGE_SCHEMA),
        batch_key="b1",
    )
    assert table.read_keys(["c1"]).count() == 1
    assert table.read_keys(["nope"]).count() == 0


def test_unsupported_where_op_raises(spark, tmp_path):
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=2)
    with pytest.raises(ValueError, match="unsupported where op"):
        table.read(where=[("ts", "!=", 1)])


# ---------------------------------------------------------------- widening


def test_schema_widening_int_to_long(spark, tmp_path):
    """turn_idx int → long mid-stream: schema widens, old int32 files read
    through the long schema (parquet reader type promotion), and a later
    narrower batch casts up."""
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    jan = dt.datetime(2025, 1, 1)
    apply_changes(
        table,
        spark.createDataFrame([(1, "I", "c1", 0, "u", "old", "", jan)], CHANGE_SCHEMA),
        batch_key="b1",
    )
    wide = CHANGE_SCHEMA.replace("turn_idx int", "turn_idx long")
    apply_changes(
        table,
        spark.createDataFrame(
            [(2, "I", "c2", 2**40, "u", "wide", "", jan)], wide
        ),
        batch_key="b2",
    )
    assert table.schema["turn_idx"].dataType.typeName() == "long"
    rows = {r["conv_id"]: r["turn_idx"] for r in table.read().collect()}
    assert rows == {"c1": 0, "c2": 2**40}
    # narrower batch into the widened table: cast up, no error
    apply_changes(
        table,
        spark.createDataFrame([(3, "I", "c3", 7, "u", "narrow", "", jan)], CHANGE_SCHEMA),
        batch_key="b3",
    )
    assert table.read().count() == 3


def test_schema_widening_float_to_double(spark, tmp_path):
    from pyspark.sql import types as T

    table = create_transcript_table(
        spark,
        str(tmp_path / "t"),
        n_buckets=4,
        extra_fields=[T.StructField("score", T.FloatType(), True)],
    )
    jan = dt.datetime(2025, 1, 1)
    sch_f = CHANGE_SCHEMA + ", score float"
    sch_d = CHANGE_SCHEMA + ", score double"
    apply_changes(
        table,
        spark.createDataFrame([(1, "I", "c1", 0, "u", "x", "", jan, 0.5)], sch_f),
        batch_key="b1",
    )
    apply_changes(
        table,
        spark.createDataFrame([(2, "I", "c2", 0, "u", "y", "", jan, 0.25)], sch_d),
        batch_key="b2",
    )
    assert table.schema["score"].dataType.typeName() == "double"
    got = {r["conv_id"]: r["score"] for r in table.read().collect()}
    assert got == {"c1": 0.5, "c2": 0.25}


def test_non_widening_conflict_still_rejected(spark, tmp_path):
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=2)
    jan = dt.datetime(2025, 1, 1)
    bad = CHANGE_SCHEMA.replace("role string", "role int")
    with pytest.raises(TypeError, match="type conflict"):
        apply_changes(
            table,
            spark.createDataFrame([(1, "I", "c1", 0, 5, "x", "", jan)], bad),
            batch_key="b1",
        )


def test_in_predicate_prunes_and_is_exact(spark, tmp_path):
    """`where=[("conv_id","in",[a, b])]` prunes to the named
    conversations' files (a file skips only when EVERY requested value
    misses its range) and the residual isin filter makes rows exact."""
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=16)
    convs_a, convs_b = _pick_bucket_disjoint_convs(spark, 16)
    jan = dt.datetime(2025, 1, 1)
    apply_changes(table, _batch(spark, convs_a, jan, 0), batch_key="a")
    apply_changes(table, _batch(spark, convs_b, jan, 1000), batch_key="b")
    want = [convs_a[0], convs_b[0]]
    got = table.read(where=[("conv_id", "in", want)])
    assert len(_files_read(got)) < len(_files_read(table.read()))
    assert got.count() == 10
    assert {r["conv_id"] for r in got.select("conv_id").distinct().collect()} == set(
        want
    )
    # empty IN list: no file is skippable by it, filter yields no rows
    assert table.read(where=[("conv_id", "in", [])]).count() == 0


def test_read_keys_on_long_bucket_key(spark, tmp_path):
    """Non-string bucket keys: the lookup frame must carry the key's REAL
    type (a stringified probe would hash into the wrong buckets)."""
    from etl_rust_spark.lake.format import IceliteTable

    schema = (
        "user_id long, seq long, v string"
    )
    import pyspark.sql.types as T
    t = IceliteTable.create(
        spark, str(tmp_path / "t"),
        T.StructType([
            T.StructField("user_id", T.LongType()),
            T.StructField("seq", T.LongType()),
            T.StructField("v", T.StringType()),
        ]),
        key_cols=["user_id"], bucket_key="user_id", n_buckets=8,
        order_cols=["user_id"], seq_col="seq",
    )
    rows = [(i, i, f"v{i}") for i in range(64)]
    t.merge(
        spark.createDataFrame(rows, schema).withColumn("op", F.lit("U")),
        batch_key="b0", seq_col="seq",
    )
    got = t.read_keys([7, 33])
    assert {r["user_id"] for r in got.collect()} == {7, 33}


def test_footer_harvested_stats_equal_data_computed_stats(spark, tmp_path):
    """Round 4 replaced the per-commit stats re-scan with parquet-footer
    harvesting. Direct exactness check: for EVERY committed file, the
    manifest's [min, max] per stat column must equal what an independent
    engine (DuckDB) computes from the file's rows — in the stored-stat
    domain (epoch micros for timestamps, raw for ints/strings)."""
    import duckdb

    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=4)
    rows = [
        (100 + i, "I", f"conv-{i % 7}", i % 5, "user", f"text {i}", "",
         dt.datetime(2025, 3, 1, 12, 0, i % 60))
        for i in range(200)
    ]
    apply_changes(
        t, spark.createDataFrame(rows, CHANGE_SCHEMA), batch_key="b0", mode="mor"
    )
    con = duckdb.connect()
    files = t.snapshot()["files"]
    assert files
    checked = 0
    for f in files:
        for col, (lo, hi) in f["stats"].items():
            if lo is None and hi is None:
                continue
            if col == "ts":
                q = (
                    "SELECT CAST(floor(epoch(min(ts)) * 1000000) AS BIGINT),"
                    "       CAST(floor(epoch(max(ts)) * 1000000) AS BIGINT)"
                    f" FROM '{f['path']}'"
                )
            else:
                q = f"SELECT min({col}), max({col}) FROM '{f['path']}'"
            want_lo, want_hi = con.execute(q).fetchone()
            assert (lo, hi) == (want_lo, want_hi), (f["path"], col)
            checked += 1
    assert checked >= len(files) * 3  # several stat columns per file


def test_footer_stats_distributed_path_over_64_files(spark, tmp_path):
    """Commits with >64 part files harvest footers via the RDD fan-out
    branch — same manifest contents as the serial path (rows, buckets,
    non-null key stats on every file)."""
    t = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=96)
    rows = [
        (100 + i, "I", f"conv-{i}", 0, "user", f"t{i}", "",
         dt.datetime(2025, 3, 1)) for i in range(800)
    ]
    apply_changes(
        t, spark.createDataFrame(rows, CHANGE_SCHEMA), batch_key="b0", mode="mor"
    )
    files = t.snapshot()["files"]
    assert len(files) > 64  # the distributed branch actually ran
    assert sum(f["rows"] for f in files) == 800
    assert all(f["stats"]["conv_id"][0] is not None for f in files)
    assert all(f["kmin"] == f["stats"]["conv_id"][0] for f in files)


def test_dnf_where_prunes_union_of_groups(spark, tmp_path):
    """read(where=[[...],[...]]) — the pyarrow-filters DNF form: files
    skipped only when EVERY OR-group excludes them, results exactly the
    OR of the groups' AND predicates."""
    from pyspark.sql import functions as F

    from etl_rust_spark.operators.apply import apply_changes, create_transcript_table

    sch = ("lsn long, op string, conv_id string, turn_idx int, role string, "
           "text string, tool string, ts timestamp")
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=8)
    # per-commit key locality (the natural CDC arrival shape): each batch
    # covers a disjoint conv range, so per-file key stats are narrow
    for b in range(4):
        rows = [
            (k, "I", f"conv-{k:03d}", 0, "user", f"text {k}", "", None)
            for k in range(b * 16, (b + 1) * 16)
        ]
        apply_changes(table, spark.createDataFrame(rows, sch),
                      batch_key=f"b{b}", mode="mor")
    full = table.read()
    n_files = len(full.inputFiles())

    dnf = [
        [("conv_id", "=", "conv-003")],
        [("conv_id", "between", ("conv-050", "conv-052"))],
    ]
    got = table.read(where=dnf)
    want = full.filter(
        (F.col("conv_id") == "conv-003")
        | F.col("conv_id").between("conv-050", "conv-052")
    )
    assert sorted(r["conv_id"] for r in got.collect()) == sorted(
        r["conv_id"] for r in want.collect()
    )
    assert got.count() == 4
    # pruning fired: strictly fewer files than the table holds
    assert 0 < len(got.inputFiles()) < n_files

    # under MoR deltas, a group carrying only NON-key conditions cannot
    # exclude any file — everything survives, but the result stays exact
    apply_changes(
        table,
        spark.createDataFrame(
            [(1000, "U", "conv-003", 0, "user", "updated", "", None)], sch
        ),
        batch_key="b-upd", mode="mor",
    )
    mixed = [
        [("conv_id", "=", "conv-003")],
        [("text", "=", "text 50")],  # non-key under deltas: no pruning
    ]
    got2 = table.read(where=mixed)
    assert len(got2.inputFiles()) == len(table.read().inputFiles())
    texts = {r["conv_id"]: r["text"] for r in got2.collect()}
    assert texts == {"conv-003": "updated", "conv-050": "text 50"}

    # delete_where composes with DNF: both groups' keys tombstone
    table.delete_where(dnf)
    live = table.read().filter(~F.coalesce(F.col("__deleted"), F.lit(False)))
    assert live.filter(F.col("conv_id").isin(
        "conv-003", "conv-050", "conv-051", "conv-052")).count() == 0
    assert live.count() == 60


def test_bucket_pruning_on_where_equality(spark, tmp_path):
    """=/IN on the bucket key in read(where=) prunes by HASH BUCKET like
    read_keys — effective even after compaction leaves hash-mixed files
    whose min/max stats span the whole key range, and MoR-safe (a key's
    versions never leave its bucket)."""
    from pyspark.sql import functions as F

    from etl_rust_spark.operators.apply import apply_changes, create_transcript_table

    sch = ("lsn long, op string, conv_id string, turn_idx int, role string, "
           "text string, tool string, ts timestamp")
    table = create_transcript_table(spark, str(tmp_path / "t"), n_buckets=8)
    rows = [
        (k, "I", f"conv-{k:03d}", 0, "user", f"text {k}", "", None)
        for k in range(64)
    ]
    apply_changes(table, spark.createDataFrame(rows, sch),
                  batch_key="b0", mode="mor")
    table.compact()  # hash-mixed files: stats ranges are wide
    n_files = len(table.read().inputFiles())
    assert n_files == 8

    got = table.read(where=[("conv_id", "=", "conv-003")])
    assert got.count() == 1
    assert len(got.inputFiles()) == 1  # one bucket's single file

    got_in = table.read(
        where=[("conv_id", "in", ["conv-003", "conv-050"])]
    )
    assert got_in.count() == 2
    assert 1 <= len(got_in.inputFiles()) <= 2

    # a later delta doesn't break it: bucket pruning is version-complete
    apply_changes(
        table,
        spark.createDataFrame(
            [(1000, "U", "conv-003", 0, "user", "updated", "", None)], sch
        ),
        batch_key="b1", mode="mor",
    )
    got2 = table.read(where=[("conv_id", "=", "conv-003")])
    rows2 = got2.collect()
    assert len(rows2) == 1 and rows2[0]["text"] == "updated"
    assert len(got2.inputFiles()) < len(table.read().inputFiles())

    # DNF groups each carry their own bucket restriction
    dnf = table.read(where=[
        [("conv_id", "=", "conv-003")],
        [("conv_id", "=", "conv-050")],
    ])
    assert dnf.count() == 2
    assert len(dnf.inputFiles()) <= 4


def test_local_bucket_of_values_matches_spark_job(spark):
    """r6: _bucket_of_values computes common-type literals DRIVER-SIDE
    (zero Spark jobs) through the xxh64 port — must be bit-identical to
    the typed-job path the writer's layout derives from."""
    import pyspark.sql.types as T

    from etl_rust_spark.lake.format import _local_bucket_of_values

    def spark_buckets(vals, dt, n):
        fld = T.StructType([T.StructField("k", dt)])
        rows = (
            spark.createDataFrame([(v,) for v in vals], fld)
            .select(_bucket_expr("k", n))
            .collect()
        )
        return [int(r[0]) for r in rows]

    cases = [
        (T.StringType(), ["", "a", "conv-0001", "☃ unicode", "x" * 100]),
        (T.LongType(), [0, 1, -1, 2**62, -(2**62), 41, 1234567890123]),
        (T.IntegerType(), [0, 1, -1, 2**31 - 1, -(2**31), 99]),
        (T.ShortType(), [0, 5, -5, 2**15 - 1, -(2**15)]),
        (T.ByteType(), [0, 3, -3, 127, -128]),
        (T.BooleanType(), [True, False]),
    ]
    for dt, vals in cases:
        for n in (8, 32, 4096):
            local = _local_bucket_of_values(vals, dt, n)
            assert local is not None, (dt, n)
            assert [local[v] for v in vals] == spark_buckets(vals, dt, n), (
                dt, n,
            )

    # outside the proven domain → None (caller falls back to the job)
    assert _local_bucket_of_values([1.5], T.DoubleType(), 8) is None
    assert _local_bucket_of_values(["s"], T.TimestampType(), 8) is None
    # mistyped literal for the column type → None, never a guess
    assert _local_bucket_of_values([1], T.StringType(), 8) is None
    assert _local_bucket_of_values(["1"], T.LongType(), 8) is None
    assert _local_bucket_of_values([True], T.LongType(), 8) is None
    assert _local_bucket_of_values([2**63], T.LongType(), 8) is None
    assert _local_bucket_of_values([2**31], T.IntegerType(), 8) is None
