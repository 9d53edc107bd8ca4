"""Property-based check (hypothesis): for ANY changelog — arbitrary op
sequences, duplicate deliveries, arbitrary emission order, arbitrary
batch boundaries, either merge mode — the engine's final state equals the
independent oracle replay. (The reference only aspired to property tests,
docs/plans/...-design.md:147.)"""

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_rust_spark.changelog import (
    CHANGELOG_SCHEMA,
    TRANSCRIPT_SCHEMA,
    replay_oracle_pandas,
)
from etl_rust_spark.operators.apply import (
    apply_changes,
    create_transcript_table,
    read_transcripts,
    sync_snapshot,
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


# ---------------------------------------------------------------------------
# Model-based property: field-id schema evolution under ARBITRARY op
# interleavings (merge / add-column / rename / drop / compact). The model
# keys every value by FIELD ID, exactly like Icelite v3 must: a rename
# moves the name, not the data; a drop retires the id; a merge that still
# carries a renamed column's OLD name creates a FRESH column; an upsert
# replaces the whole row (missing payload columns go null, never carried).
# ---------------------------------------------------------------------------

_EVO_KEYS = [("c0", 0), ("c0", 1), ("c1", 0), ("c2", 0)]


@st.composite
def evolution_ops(draw):
    ops = []
    n = draw(st.integers(min_value=2, max_value=7))
    for _ in range(n):
        kind = draw(st.sampled_from(["merge", "merge", "merge", "rename", "drop",
                                     "add", "add_ddl", "compact",
                                     "compact_deltas", "rewrite_manifests"]))
        if kind == "merge":
            ops.append(("merge",
                        draw(st.lists(st.sampled_from(_EVO_KEYS), min_size=1,
                                      max_size=4, unique=True)),
                        draw(st.integers(0, 1000))))  # column-subset seed
        elif kind == "rename":
            ops.append(("rename", draw(st.integers(0, 1000))))
        elif kind == "drop":
            ops.append(("drop", draw(st.integers(0, 1000))))
        elif kind == "add":
            ops.append(("add", draw(st.sampled_from(_EVO_KEYS))))
        else:  # compact / compact_deltas / rewrite_manifests — no args
            ops.append((kind,))
    return ops


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ops=evolution_ops())
def test_field_id_evolution_matches_model(spark, ops):
    import tempfile

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from etl_rust_spark.lake.format import IceliteTable

    with tempfile.TemporaryDirectory(prefix="evo_prop_") as root:
        schema = T.StructType([
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("p0", T.StringType()),
        ])
        t = IceliteTable.create(
            spark, f"{root}/t", schema,
            key_cols=["conv_id", "turn_idx"], bucket_key="conv_id",
            n_buckets=2, order_cols=["conv_id", "turn_idx"], seq_col="lsn",
        )
        # ---- model: field ids are the source of truth
        fields = [("p0", 0)]          # (current name, id), payload only
        next_fid = [1]
        data: dict = {}               # key -> {"lsn": n, fid: value}
        lsn = [0]
        name_ctr = [0]

        def payload_names():
            return [n for n, _ in fields]

        def do_merge(keys, seed, extra_col=None):
            names = payload_names()
            # deterministic column subset of the CURRENT schema
            use = [n for i, n in enumerate(names) if (seed >> i) & 1] or names[:1]
            if extra_col:
                use = use + [extra_col]
            rows = []
            for conv, turn in keys:
                lsn[0] += 1
                vals = {n: f"{n}:{lsn[0]}" for n in use}
                rows.append((conv, turn, lsn[0], vals))
            # engine side
            cols = ["conv_id", "turn_idx", "lsn", *use]
            sdf = spark.createDataFrame(
                [(c, tu, sl, *[v[n] for n in use]) for c, tu, sl, v in rows],
                "conv_id string, turn_idx int, lsn long, "
                + ", ".join(f"`{n}` string" for n in use),
            ).withColumn("op", F.lit("U"))
            t.merge(sdf, seq_col="lsn")
            # model side
            for n in use:
                if n not in dict(fields):
                    fields.append((n, next_fid[0]))
                    next_fid[0] += 1
            byname = dict(fields)
            for conv, turn, sl, vals in rows:
                data[(conv, turn)] = {"lsn": sl,
                                      **{byname[n]: v for n, v in vals.items()}}

        for op in ops:
            if op[0] == "merge":
                do_merge(op[1], op[2])
            elif op[0] == "add":
                name_ctr[0] += 1
                do_merge([op[1]], 1023, extra_col=f"p{name_ctr[0]}")
            elif op[0] == "add_ddl":
                # explicit metadata-only ADD COLUMN: fresh field id, no
                # data commit — every existing row reads NULL; later
                # merges may populate it (it joins payload_names())
                name_ctr[0] += 1
                new = f"d{name_ctr[0]}"
                t.add_column(new, "string")
                fields.append((new, next_fid[0]))
                next_fid[0] += 1
            elif op[0] == "rename":
                if not fields:
                    continue
                i = op[1] % len(fields)
                old, fid = fields[i]
                name_ctr[0] += 1
                new = f"r{name_ctr[0]}"
                t.rename_column(old, new)
                fields[i] = (new, fid)
            elif op[0] == "drop":
                if len(fields) < 2:
                    continue  # keep at least one payload column
                i = op[1] % len(fields)
                t.drop_column(fields[i][0])
                fields.pop(i)
            elif op[0] == "compact_deltas":
                # minor compaction: rewrites/folds nothing visible — the
                # model is untouched by any maintenance op
                t.compact_deltas(min_delta_files_per_bucket=0)
            elif op[0] == "rewrite_manifests":
                t.rewrite_manifests()
            else:
                t.compact()

        # ---- compare engine vs model
        got = {(r["conv_id"], r["turn_idx"]): r.asDict() for r in t.read().collect()}
        byid = {fid: n for n, fid in fields}
        want = {}
        for key, row in data.items():
            want[key] = {"conv_id": key[0], "turn_idx": key[1], "lsn": row["lsn"],
                         **{n: row.get(fid) for fid, n in byid.items()}}
        assert got == want, f"\nops={ops}\ngot={got}\nwant={want}"


# ---------------------------------------------------------------------------
# Streaming-source differential under evolution interleavings (VERDICT r04
# #7): a CONSUMER tails the table through the icelite source while commits
# interleave with rename/drop/add/compact. The stream pins its declared
# schema at subscribe time; a rename/drop of a declared column mid-stream
# must FAIL FAST (ADVICE r04) and a restart re-infers; everything the
# consumer ever reads must equal the JVM ``read_changes`` over the same
# seq range projected to the consumer's declared columns. The batch
# reader with a user-pinned .schema() IS the stream's read path
# (``_partitions_for`` + ``_read_partition_arrow`` are shared; only offset
# bookkeeping differs), so the model drives consume points through it —
# one hypothesis example then costs seconds, not stream-startup minutes.
# ---------------------------------------------------------------------------


@st.composite
def stream_evolution_ops(draw):
    ops = [("merge", [("c0", 0), ("c1", 0)], 1023)]  # seed data pre-subscribe
    n = draw(st.integers(min_value=2, max_value=6))
    for _ in range(n):
        kind = draw(st.sampled_from(
            ["merge", "merge", "merge", "rename", "drop", "add", "compact",
             "compact_deltas", "rewrite_manifests"]
        ))
        if kind == "merge":
            ops.append(("merge",
                        draw(st.lists(st.sampled_from(_EVO_KEYS), min_size=1,
                                      max_size=3, unique=True)),
                        draw(st.integers(0, 1000))))
        elif kind == "rename":
            ops.append(("rename", draw(st.integers(0, 1000))))
        elif kind == "drop":
            ops.append(("drop", draw(st.integers(0, 1000))))
        elif kind == "add":
            ops.append(("add", draw(st.sampled_from(_EVO_KEYS))))
        else:  # maintenance ops the SOURCE must skip mid-stream
            ops.append((kind,))
    return ops


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ops=stream_evolution_ops())
def test_stream_source_matches_read_changes_under_evolution(spark, ops):
    import tempfile

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from etl_rust_spark.lake.format import IceliteTable
    from etl_rust_spark.sources import register_icelite_source

    register_icelite_source(spark)
    with tempfile.TemporaryDirectory(prefix="src_evo_prop_") as root:
        path = f"{root}/t"
        schema = T.StructType([
            T.StructField("conv_id", T.StringType()),
            T.StructField("turn_idx", T.IntegerType()),
            T.StructField("lsn", T.LongType()),
            T.StructField("p0", T.StringType()),
        ])
        t = IceliteTable.create(
            spark, path, schema,
            key_cols=["conv_id", "turn_idx"], bucket_key="conv_id",
            n_buckets=2, order_cols=["conv_id", "turn_idx"], seq_col="lsn",
        )
        fields = ["p0"]
        name_ctr = [0]
        lsn = [0]

        def do_merge(keys, seed, extra_col=None):
            use = [n for i, n in enumerate(fields) if (seed >> i) & 1] or fields[:1]
            if extra_col:
                use = use + [extra_col]
            rows = []
            for conv, turn in keys:
                lsn[0] += 1
                rows.append((conv, turn, lsn[0], *[f"{n}:{lsn[0]}" for n in use]))
            sdf = spark.createDataFrame(
                rows,
                "conv_id string, turn_idx int, lsn long, "
                + ", ".join(f"`{n}` string" for n in use),
            ).withColumn("op", F.lit("U"))
            t.merge(sdf, seq_col="lsn", mode="mor")  # feeds require MoR
            for n in use:
                if n not in fields:
                    fields.append(n)

        def current_stream_schema():
            return (
                spark.read.format("icelite").option("path", path).load().schema
            )

        def consume(state):
            """Read (state['last'], cur] through the source with the
            consumer's PINNED schema; on the documented fail-fast,
            restart (re-pin) and re-read. Always compare against JVM
            read_changes projected to the declared columns."""
            cur = t.current_seq()
            if cur == state["last"]:
                return
            if state["decl"] is None:
                state["decl"] = current_stream_schema()
            reader = (
                spark.read.format("icelite").schema(state["decl"])
                .option("path", path)
                .option("sinceSeq", str(state["last"]))
                .option("untilSeq", str(cur))
            )
            try:
                rows = reader.load().collect()
            except Exception as e:  # noqa: BLE001 — must be the fail-fast
                assert "renamed or dropped" in str(e), f"unexpected: {e}"
                state["decl"] = current_stream_schema()  # restart re-infers
                rows = (
                    spark.read.format("icelite").schema(state["decl"])
                    .option("path", path)
                    .option("sinceSeq", str(state["last"]))
                    .option("untilSeq", str(cur))
                    .load()
                    .collect()
                )
            cols = [f.name for f in state["decl"].fields]
            want_df = t.read_changes(state["last"], cur)
            have = {c: True for c in want_df.columns}
            proj = [
                F.col(c) if c in have else F.lit(None).cast("string")
                for c in cols
            ]
            want = {
                tuple(r[c] for c in cols)
                for r in want_df.select(
                    [p.alias(c) for p, c in zip(proj, cols)]
                ).collect()
            }
            got = {tuple(r[c] for c in cols) for r in rows}
            assert got == want, f"range ({state['last']},{cur}] cols={cols}"
            state["last"] = cur

        state = {"decl": None, "last": 0}
        for op in ops:
            if op[0] == "merge":
                do_merge(op[1], op[2])
            elif op[0] == "add":
                name_ctr[0] += 1
                do_merge([op[1]], 1023, extra_col=f"p{name_ctr[0]}")
            elif op[0] == "rename":
                i = op[1] % len(fields)
                name_ctr[0] += 1
                new = f"r{name_ctr[0]}"
                t.rename_column(fields[i], new)
                fields[i] = new
            elif op[0] == "drop":
                if len(fields) < 2:
                    continue
                i = op[1] % len(fields)
                t.drop_column(fields[i])
                fields.pop(i)
            elif op[0] == "compact_deltas":
                t.compact_deltas(min_delta_files_per_bucket=0)
            elif op[0] == "rewrite_manifests":
                t.rewrite_manifests()
            else:
                t.compact()
            consume(state)


# ---------------------------------------------------------------------------
# Preimage-feed differential (round 5): for ANY batch sequence — arbitrary
# key subsets, arbitrary LSN assignment (so late lower-LSN deliveries are
# common), inserts/updates/deletes — every row of
# ``read_changes_with_preimage(since)`` must carry as ``_before`` exactly
# the max-LSN delivery of that key from any EARLIER commit (or the base
# snapshot), for any resume point. Guards the window logic plus the
# round-5 base↔feed schema alignment.
# ---------------------------------------------------------------------------


@st.composite
def preimage_workloads(draw):
    n_events = draw(st.integers(min_value=4, max_value=24))
    n_batches = draw(st.integers(min_value=2, max_value=5))
    lsns = list(range(1, n_events + 1))
    # shuffle LSNs across batches: later commits often carry older LSNs
    perm = draw(st.permutations(lsns))
    batches = [[] for _ in range(n_batches)]
    for i, lsn in enumerate(perm):
        b = draw(st.integers(0, n_batches - 1))
        key = draw(st.sampled_from(KEYS))
        op = draw(st.sampled_from(["I", "U", "U", "D"]))
        batches[b].append((key, lsn, op))
    return [b for b in batches if b]


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(batches=preimage_workloads())
def test_preimage_feed_matches_model(spark, batches):
    import tempfile

    from pyspark.sql import functions as F

    from etl_rust_spark.lake.format import IceliteTable

    with tempfile.TemporaryDirectory(prefix="preimg_prop_") as root:
        t = create_transcript_table(spark, f"{root}/t", n_buckets=2)
        deliveries = []  # (commit_seq, key, lsn, text, deleted)
        for bi, batch in enumerate(batches):
            rows = [
                (lsn, op, k[0], k[1], "user",
                 None if op == "D" else f"v{lsn}", "",
                 pd.Timestamp("2025-01-01"))
                for (k, lsn, op) in batch
            ]
            sdf = spark.createDataFrame(
                pd.DataFrame(rows, columns=[
                    "lsn", "op", "conv_id", "turn_idx", "role", "text",
                    "tool", "ts"]),
                schema=CHANGELOG_SCHEMA,
            )
            apply_changes(t, sdf, batch_key=f"b{bi}", mode="mor")
            seq = t.current_seq()
            # the batch's delivered winner per key = its max-LSN row
            best = {}
            for (k, lsn, op) in batch:
                if k not in best or lsn > best[k][0]:
                    best[k] = (lsn, op)
            for k, (lsn, op) in best.items():
                deliveries.append(
                    (seq, k, lsn, None if op == "D" else f"v{lsn}", op == "D")
                )

        seqs = sorted({d[0] for d in deliveries})
        for since in {0, seqs[len(seqs) // 2]}:
            got = {
                (r["_commit_seq"], (r["conv_id"], r["turn_idx"])): (
                    r["_before"]["__lsn"] if r["_before"] else None,
                    r["_before"]["text"] if r["_before"] else None,
                    r["_before"]["__deleted"] if r["_before"] else None,
                )
                for r in t.read_changes_with_preimage(since).collect()
            }
            want = {}
            for (s, k, lsn, text, dead) in deliveries:
                if s <= since:
                    continue
                prior = [d for d in deliveries if d[1] == k and d[0] < s]
                if prior:
                    best = max(prior, key=lambda d: d[2])  # max-LSN delivery
                    want[(s, k)] = (best[2], best[3], best[4])
                else:
                    want[(s, k)] = (None, None, None)
            assert got == want, f"since={since}"


# ---------------------------------------------------------------------------
# additive (agg_cols) tables: fold == model accumulator under arbitrary
# interleavings of partial merges (incl. repeated keys in one batch and
# NEGATIVE partials — the retraction contract), redelivery, compaction and
# time travel
# ---------------------------------------------------------------------------

_ADD_KEYS = ["a", "b", "c"]


@st.composite
def additive_ops(draw):
    ops = []
    n = draw(st.integers(min_value=2, max_value=6))
    for _ in range(n):
        kind = draw(st.sampled_from(["merge", "merge", "merge", "redeliver",
                                     "compact", "partial_compact"]))
        if kind == "merge":
            rows = draw(st.lists(
                st.tuples(
                    st.sampled_from(_ADD_KEYS),
                    st.integers(min_value=-5, max_value=9),   # n partial (±)
                    st.integers(min_value=-8, max_value=8),   # v partial ×0.25
                    st.integers(min_value=0, max_value=99),   # lo candidate
                ),
                min_size=1, max_size=5,
            ))
            ops.append(("merge", rows))
        else:
            ops.append((kind,))
    return ops


@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(ops=additive_ops())
def test_additive_fold_matches_model(spark, ops):
    import tempfile

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from etl_rust_spark.lake.format import IceliteTable

    with tempfile.TemporaryDirectory(prefix="add_prop_") as root:
        schema = T.StructType([
            T.StructField("k", T.StringType()),
            T.StructField("n", T.LongType()),
            T.StructField("v", T.DoubleType()),
            T.StructField("lo", T.LongType()),
            T.StructField("last", T.StringType()),
            T.StructField("__lsn", T.LongType()),
        ])
        t = IceliteTable.create(
            spark, f"{root}/t", schema, key_cols=["k"], bucket_key="k",
            n_buckets=2, order_cols=["k"], seq_col="__lsn",
            agg_cols={"n": "sum", "v": "sum", "lo": "min"},
        )
        # model: k -> [n_sum, v_quarters, lo_min, (seq, last)]
        model: dict = {}
        snaps: dict = {}  # commit seq -> frozen model copy
        lsn = [0]
        batch_no = [0]
        last_batch = [None]  # (batch_key, rows) for redelivery

        def freeze():
            snaps[t.current_seq()] = {
                k: (m[0], m[1], m[2], m[3]) for k, m in model.items()
            }

        def state():
            return {
                r["k"]: (r["n"], round(r["v"] * 4), r["lo"], r["last"], r["__lsn"])
                for r in t.read().collect()
            }

        def expect(m):
            return {
                k: (n, vq, lo, last, seq)
                for k, (n, vq, lo, (seq, last)) in (
                    (kk, (mm[0], mm[1], mm[2], mm[3])) for kk, mm in m.items()
                )
            }

        def do_merge(rows, batch_key, apply_model):
            sdf = spark.createDataFrame(
                [(k, n, q * 0.25, lo, f"s{sl}", sl, "U")
                 for (k, n, q, lo, sl) in rows],
                "k string, n long, v double, lo long, last string, "
                "__lsn long, op string",
            )
            t.merge(sdf, batch_key=batch_key, seq_col="__lsn", mode="mor")
            if apply_model:
                for (k, n, q, lo, sl) in rows:
                    cur = model.get(k, [0, 0, None, (-1, None)])
                    cur = [
                        cur[0] + n, cur[1] + q,
                        lo if cur[2] is None else min(cur[2], lo),
                        max(cur[3], (sl, f"s{sl}")),
                    ]
                    model[k] = cur
                freeze()

        for op in ops:
            if op[0] == "merge":
                stamped = []
                for (k, n, q, lo) in op[1]:
                    lsn[0] += 1
                    stamped.append((k, n, q, lo, lsn[0]))
                batch_no[0] += 1
                bk = f"b{batch_no[0]}"
                do_merge(stamped, bk, apply_model=True)
                last_batch[0] = (bk, stamped)
            elif op[0] == "redeliver" and last_batch[0] is not None:
                bk, rows = last_batch[0]
                seq_before = t.current_seq()
                do_merge(rows, bk, apply_model=False)  # ledger no-op
                assert t.current_seq() == seq_before
            elif op[0] == "compact":
                t.compact()
            elif op[0] == "partial_compact":
                t.compact(min_files_per_bucket=1)

        assert state() == expect(model)
        # time travel folds at every recorded snapshot
        for s, frozen in snaps.items():
            got = {
                r["k"]: (r["n"], round(r["v"] * 4), r["lo"], r["last"], r["__lsn"])
                for r in t.read(seq=s).collect()
            }
            assert got == expect(frozen), f"seq={s}"


# ---------------------------------------------------------------------------
# SCD2 differential (round 5): for ANY batch sequence with LSNs shuffled
# across commits (late losing deliveries common), ChangeFeedScd2's
# read_history must equal the effective-delivery model — running-max LSN
# per key over commit order; losers open no interval — and as_of(s) must
# equal the model's reconstructed state. Guards the lsn-effectiveness
# filter: interval derivation by commit order alone passes clean fixtures
# and breaks exactly here.
# ---------------------------------------------------------------------------


@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(batches=preimage_workloads(), k=st.sampled_from([1, None]))
def test_scd2_history_matches_model(spark, batches, k):
    import tempfile

    from etl_rust_spark.streaming.scd2 import ChangeFeedScd2

    with tempfile.TemporaryDirectory(prefix="scd2_prop_") as root:
        t = create_transcript_table(spark, f"{root}/t", n_buckets=2)
        deliveries = []  # (commit_seq, key, lsn, text, deleted)
        for bi, batch in enumerate(batches):
            rows = [
                (lsn, op, key[0], key[1], "user",
                 None if op == "D" else f"v{lsn}", "",
                 pd.Timestamp("2025-01-01"))
                for (key, lsn, op) in batch
            ]
            sdf = spark.createDataFrame(
                pd.DataFrame(rows, columns=[
                    "lsn", "op", "conv_id", "turn_idx", "role", "text",
                    "tool", "ts"]),
                schema=CHANGELOG_SCHEMA,
            )
            apply_changes(t, sdf, batch_key=f"b{bi}", mode="mor")
            seq = t.current_seq()
            best = {}
            for (key, lsn, op) in batch:
                if key not in best or lsn > best[key][0]:
                    best[key] = (lsn, op)
            for key, (lsn, op) in best.items():
                deliveries.append(
                    (seq, key, lsn, None if op == "D" else f"v{lsn}",
                     op == "D")
                )

        ChangeFeedScd2.create_target(spark, f"{root}/h", f"{root}/t",
                                     n_buckets=2)
        ChangeFeedScd2(
            spark=spark, source_path=f"{root}/t", table_path=f"{root}/h",
            checkpoint_dir=f"{root}/ck", max_commits_per_batch=k,
        ).run_available()

        # model: per key, in commit order, a delivery is effective iff
        # its lsn beats the running max; lead over effective = intervals
        per_key = {}
        for d in sorted(deliveries, key=lambda d: (d[0], d[1])):
            per_key.setdefault(d[1], []).append(d)
        want_hist, eff_by_key = set(), {}
        for key, ds in per_key.items():
            eff, mx = [], None
            for (s, _, lsn, text, dead) in ds:
                if mx is None or lsn > mx:
                    eff.append((s, lsn, text, dead))
                    mx = lsn
            eff_by_key[key] = eff
            for i, (s, lsn, text, dead) in enumerate(eff):
                if dead:
                    continue
                nxt = eff[i + 1][0] if i + 1 < len(eff) else None
                want_hist.add((key[0], key[1], s, nxt, nxt is None, text))
        got_hist = {
            (r["conv_id"], r["turn_idx"], r["valid_from_seq"],
             r["valid_to_seq"], r["is_current"], r["text"])
            for r in ChangeFeedScd2.read_history(spark, f"{root}/h").collect()
        }
        assert got_hist == want_hist

        maxseq = t.current_seq()
        for s in sorted({1, maxseq // 2 or 1, maxseq}):
            want_state = {}
            for key, eff in eff_by_key.items():
                cur = None
                for (cs, lsn, text, dead) in eff:
                    if cs <= s:
                        cur = (text, dead)
                if cur and not cur[1]:
                    want_state[key] = cur[0]
            got_state = {
                (r["conv_id"], r["turn_idx"]): r["text"]
                for r in ChangeFeedScd2.as_of(spark, f"{root}/h", s).collect()
            }
            assert got_state == want_state, f"as_of({s})"


# ---------------------------------------------------------------------------
# Pruned-read differential (round 5): for ANY where spec — AND lists or
# DNF lists-of-lists, any mix of key (stats+bucket-prunable) and non-key
# columns, over a DELTA-carrying table and a COMPACTED one — read(where=)
# must equal the plain filter of the full read. A wrong file skip is
# SILENT row loss, so this is the armor over the stats/bucket/DNF pruning
# stack (the AND path, the per-group DNF path, hash-bucket =/IN pruning,
# and the MoR key-column restriction all get exercised by draw).
# ---------------------------------------------------------------------------

_PRUNE_CONVS = [f"conv-{i:03d}" for i in range(8)]


@st.composite
def where_specs(draw):
    def one_cond(draw):
        col = draw(st.sampled_from(["conv_id", "conv_id", "__lsn", "text"]))
        if col == "conv_id":
            op = draw(st.sampled_from(["=", "in", "between", "<", ">="]))
            if op == "in":
                return (col, op, draw(st.lists(
                    st.sampled_from(_PRUNE_CONVS), min_size=0, max_size=3)))
            if op == "between":
                a, b = sorted([draw(st.sampled_from(_PRUNE_CONVS)),
                               draw(st.sampled_from(_PRUNE_CONVS))])
                return (col, op, (a, b))
            return (col, op, draw(st.sampled_from(_PRUNE_CONVS)))
        if col == "__lsn":
            op = draw(st.sampled_from(["<", "<=", ">", ">=", "="]))
            return (col, op, draw(st.integers(-5, 40)))
        return (col, "=", draw(st.sampled_from(["t-3", "t-11", "zzz"])))

    n_groups = draw(st.integers(1, 3))
    groups = [
        [one_cond(draw) for _ in range(draw(st.integers(1, 2)))]
        for _ in range(n_groups)
    ]
    if n_groups == 1 and draw(st.booleans()):
        return groups[0]  # exercise the plain AND form too
    return groups


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(spec=where_specs(), compacted=st.booleans())
def test_pruned_read_matches_plain_filter(spark, tmp_path_factory, spec,
                                          compacted):
    from pyspark.sql import functions as F

    from etl_rust_spark.lake.format import _where_filter

    global _PRUNE_TABLES
    try:
        tables = _PRUNE_TABLES
    except NameError:
        tables = _PRUNE_TABLES = {}
    if not tables:
        import datetime as dt

        sch = ("lsn long, op string, conv_id string, turn_idx int, "
               "role string, text string, tool string, ts timestamp")
        for kind in ("mor", "compacted"):
            root = tmp_path_factory.mktemp(f"prune_{kind}")
            t = create_transcript_table(spark, str(root / "t"), n_buckets=4)
            lsn = 0
            for b in range(3):  # per-commit key locality + one delete
                rows = []
                for c in _PRUNE_CONVS[b * 3:(b + 1) * 3] or _PRUNE_CONVS[:2]:
                    for turn in range(3):
                        rows.append((lsn, "I", c, turn, "user",
                                     f"t-{lsn}", "", dt.datetime(2025, 1, 1)))
                        lsn += 1
                apply_changes(t, spark.createDataFrame(rows, sch),
                              batch_key=f"b{b}", mode="mor")
            apply_changes(
                t,
                spark.createDataFrame(
                    [(99, "D", _PRUNE_CONVS[0], 1, None, None, None, None)],
                    sch),
                batch_key="bdel", mode="mor")
            if kind == "compacted":
                t.compact()
            tables[kind] = t

    table = tables["compacted" if compacted else "mor"]
    got = table.read(where=spec)
    want = table.read().filter(_where_filter(spec))
    key = lambda r: (r["conv_id"], r["turn_idx"], r["__lsn"])  # noqa: E731
    g = sorted(map(key, got.collect()))
    w = sorted(map(key, want.collect()))
    assert g == w, f"spec={spec} compacted={compacted}\ngot={g}\nwant={w}"


# ---------------------------------------------------------------------------
# maintenance interleavings: ANY sequence of data batches, predicate
# deletes, and table-service ops (compact / minor compaction / manifest
# rewrite / expire / GC / rebucket) leaves the LIVE state equal to the
# pure-pandas oracle replay of the effective changelog. Maintenance is
# metadata+layout only BY CONTRACT — this sweep is the mechanical check
# that no service op can lose a winner, resurrect a tombstoned key, or
# double-apply a delete. (Example-based twins: tests/test_maintenance.py,
# test_minor_compaction.py, test_rewrite_manifests.py.)
# ---------------------------------------------------------------------------

_MAINT_CONVS = ["m0", "m1", "m2"]


@st.composite
def maintenance_scripts(draw):
    def batch_spec():
        n = draw(st.integers(min_value=1, max_value=5))
        return [
            (
                draw(st.sampled_from(_MAINT_CONVS)),
                draw(st.integers(min_value=0, max_value=2)),
                draw(st.sampled_from(["I", "U", "U", "D"])),
            )
            for _ in range(n)
        ]

    script = [("batch", batch_spec())]  # the table always sees data first
    for _ in range(draw(st.integers(min_value=4, max_value=7))):
        kind = draw(
            st.sampled_from(
                [
                    "batch",
                    "batch",
                    "compact",
                    "compact_deltas",
                    "rewrite_manifests",
                    "expire",
                    "remove_orphans",
                    "delete_where",
                    "update_where",
                    "rebucket",
                    "clone",
                    "sync",
                ]
            )
        )
        if kind == "batch":
            script.append(("batch", batch_spec()))
        elif kind == "sync":
            script.append(("sync", (draw(st.sampled_from(_MAINT_CONVS)),
                                    draw(st.sampled_from(_MAINT_CONVS)))))
        elif kind in ("delete_where", "update_where"):
            script.append((kind, draw(st.sampled_from(_MAINT_CONVS))))
        elif kind == "rebucket":
            script.append(("rebucket", draw(st.sampled_from([2, 8]))))
        else:
            script.append((kind, None))
    return script


@given(script=maintenance_scripts())
@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
def test_maintenance_interleavings_preserve_live_state(
    spark, tmp_path_factory, script
):
    path = tmp_path_factory.mktemp("maintprop")
    table = create_transcript_table(spark, str(path / "t"), n_buckets=4)
    eff = []  # the effective changelog the oracle replays
    clones = []  # (clone table, frozen expected state) pairs
    lsn, step = 0, 0

    def expected():
        return replay_oracle_pandas(pd.DataFrame(eff))

    def check():
        actual = read_transcripts(table).toPandas()
        exp = expected()
        if len(exp) == 0:
            assert len(actual) == 0
        else:
            assert_pdf_equal(actual, exp)
        # the metadata-first aggregates must stay exact through EVERY
        # interleaving — tombstones pending, deltas pending, folded,
        # rebucketed — because their metadata tier trusts manifest stats
        assert table.count_live() == len(exp)
        lo, hi = table.min_max("turn_idx")
        if len(exp) == 0:
            assert (lo, hi) == (None, None)
        else:
            assert (lo, hi) == (exp.turn_idx.min(), exp.turn_idx.max())
        n_m1 = int((exp.conv_id == "m1").sum()) if len(exp) else 0
        assert table.count_where([("conv_id", "=", "m1")]) == n_m1

    for kind, arg in script:
        step += 1
        if kind == "batch":
            rows = []
            for conv, turn, op in arg:
                is_del = op == "D"
                rows.append(
                    {
                        "lsn": lsn,
                        "op": op,
                        "conv_id": conv,
                        "turn_idx": np.int32(turn),
                        "role": None if is_del else "user",
                        "text": None if is_del else f"t-{lsn}",
                        "tool": None if is_del else "",
                        "ts": pd.NaT if is_del else
                        pd.Timestamp("2025-01-01") + pd.Timedelta(seconds=lsn),
                    }
                )
                lsn += 1
            apply_changes(
                table,
                spark.createDataFrame(pd.DataFrame(rows), schema=CHANGELOG_SCHEMA),
                batch_key=f"mb{step}",
                mode="mor",
            )
            eff.extend(rows)
        elif kind == "delete_where":
            live = expected()
            matched = live[live.conv_id == arg] if len(live) else live
            res = table.delete_where(
                [("conv_id", "=", arg)], batch_key=f"dw{step}"
            )
            if len(matched) == 0:
                assert res is None, "delete_where matched nothing yet committed"
            else:
                # the engine stamps tombstones at max(matched winner)+1;
                # winners are the per-key max-lsn rows, so that equals
                # max lsn over every effective row of the matched keys
                keys = set(zip(matched.conv_id, matched.turn_idx))
                t_lsn = (
                    max(
                        r["lsn"]
                        for r in eff
                        if (r["conv_id"], r["turn_idx"]) in keys
                    )
                    + 1
                )
                for conv_id, turn in sorted(keys):
                    eff.append(
                        {
                            "lsn": t_lsn,
                            "op": "D",
                            "conv_id": conv_id,
                            "turn_idx": np.int32(turn),
                            "role": None,
                            "text": None,
                            "tool": None,
                            "ts": pd.NaT,
                        }
                    )
                lsn = max(lsn, t_lsn + 1)
            check()
        elif kind == "update_where":
            # UPDATE ... SET text = text || '!' WHERE conv_id = arg: the
            # engine rewrites the matched LIVE winners at max(matched
            # winner lsn)+1; the model appends the same rewrite as
            # ordinary 'U' events, so every downstream op (compaction,
            # GC, delete_where stamping) sees it as plain history
            live = expected()
            matched = live[live.conv_id == arg] if len(live) else live
            res = table.update_where(
                [("conv_id", "=", arg)],
                {"text": "concat(text, '!')"},
                batch_key=f"uw{step}",
            )
            if len(matched) == 0:
                assert res is None, "update_where matched nothing yet committed"
            else:
                keys = set(zip(matched.conv_id, matched.turn_idx))
                t_lsn = (
                    max(
                        r["lsn"]
                        for r in eff
                        if (r["conv_id"], r["turn_idx"]) in keys
                    )
                    + 1
                )
                for _, m in matched.iterrows():
                    eff.append(
                        {
                            "lsn": t_lsn,
                            "op": "U",
                            "conv_id": m["conv_id"],
                            "turn_idx": np.int32(m["turn_idx"]),
                            "role": m["role"],
                            "text": None if m["text"] is None else m["text"] + "!",
                            "tool": m["tool"],
                            "ts": m["ts"],
                        }
                    )
                lsn = max(lsn, t_lsn + 1)
            check()
        elif kind == "sync":
            # snapshot-diff sync mid-script: upstream's "full state" is
            # the current live state with conv_del dropped, conv_edit's
            # texts suffixed, and one fresh key appended. The model
            # appends the SAME diff as ordinary events at the engine's
            # sync seq (1 + max stored lsn, tombstones included), so
            # every later op sees it as plain history.
            conv_del, conv_edit = arg
            live = expected()
            t_lsn = max(r["lsn"] for r in eff) + 1
            snap = live[live.conv_id != conv_del].copy() if len(live) else live
            if len(snap):
                snap.loc[snap.conv_id == conv_edit, "text"] = (
                    snap.loc[snap.conv_id == conv_edit, "text"] + "?"
                )
            new_row = {
                "conv_id": "m9", "turn_idx": np.int32(step % 3),
                "role": "user", "text": f"s-{t_lsn}", "tool": "",
                "ts": pd.Timestamp("2025-01-01")
                + pd.Timedelta(seconds=t_lsn),
            }
            snap_pdf = pd.concat(
                [snap, pd.DataFrame([new_row])], ignore_index=True
            ) if len(snap) else pd.DataFrame([new_row])
            # createDataFrame(pdf, schema) binds by POSITION: pin the order
            snap_pdf = snap_pdf[[f.name for f in TRANSCRIPT_SCHEMA.fields]]
            rep = sync_snapshot(
                table,
                spark.createDataFrame(snap_pdf, schema=TRANSCRIPT_SCHEMA),
                batch_key=f"sy{step}",
            )
            assert rep is not None  # the fresh key guarantees a diff
            # model: deletes for conv_del's live keys, updates for
            # conv_edit's (unless dropped), the new key as an upsert
            if len(live):
                for _, m in live[live.conv_id == conv_del].iterrows():
                    eff.append({
                        "lsn": t_lsn, "op": "D", "conv_id": m["conv_id"],
                        "turn_idx": np.int32(m["turn_idx"]), "role": None,
                        "text": None, "tool": None, "ts": pd.NaT,
                    })
                if conv_edit != conv_del:
                    for _, m in live[live.conv_id == conv_edit].iterrows():
                        eff.append({
                            "lsn": t_lsn, "op": "U",
                            "conv_id": m["conv_id"],
                            "turn_idx": np.int32(m["turn_idx"]),
                            "role": m["role"], "text": m["text"] + "?",
                            "tool": m["tool"], "ts": m["ts"],
                        })
            eff.append(dict(new_row, lsn=t_lsn, op="U"))
            lsn = max(lsn, t_lsn + 1)
            check()
        elif kind == "compact":
            table.compact()
            check()
        elif kind == "compact_deltas":
            table.compact_deltas(min_delta_files_per_bucket=1)
            check()
        elif kind == "rewrite_manifests":
            table.rewrite_manifests(target_files_per_manifest=2)
            check()
        elif kind == "expire":
            table.expire_snapshots(keep_last=2)
            check()
        elif kind == "remove_orphans":
            removed = table.remove_orphans(grace_sec=3600)
            assert removed == [], f"GC reclaimed live/in-grace files: {removed}"
            check()
        elif kind == "clone":
            # snapshot export mid-script: the clone must equal the live
            # state NOW and stay frozen while the source keeps mutating,
            # compacting, expiring, and GCing (hard-link liveness)
            cpath = str(path / f"clone{step}")
            clones.append((table.clone(cpath), expected()))
            check()
        elif kind == "rebucket":
            table.rebucket(arg)
            check()
    check()
    # every mid-script clone is still byte-equal to the state it froze
    for ct, exp in clones:
        got = read_transcripts(ct).toPandas()
        if len(exp) == 0:
            assert len(got) == 0
        else:
            assert_pdf_equal(got, exp)


# ---------------------------------------------------------------------------
# branch interleavings: ANY sequence of main commits, branch commits,
# publishes, abandons, compaction, expiry, and zero-grace GC keeps BOTH
# chains equal to their own oracle replays. The invariant under attack:
# branch chains are LIVE GC ROOTS — an expiry or orphan sweep that is
# blind to a branch destroys data a later publish would need — and
# fast_forward must refuse to publish over a diverged main.
# (Example-based twins: tests/test_branches.py.)
# ---------------------------------------------------------------------------


@st.composite
def branch_scripts(draw):
    ops = ["main_batch"]  # the table always sees data first
    for _ in range(draw(st.integers(min_value=5, max_value=9))):
        ops.append(
            draw(
                st.sampled_from(
                    [
                        "main_batch",
                        "branch_create",
                        "branch_batch",
                        "branch_batch",
                        "publish",
                        "branch_abandon",
                        "compact",
                        "expire",
                        "gc",
                    ]
                )
            )
        )
    return ops


@given(ops=branch_scripts())
@settings(max_examples=4, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
def test_branch_interleavings_keep_both_chains_oracle_equal(
    spark, tmp_path_factory, ops
):
    from etl_rust_spark.lake.format import ConcurrentCommitError

    path = tmp_path_factory.mktemp("branchprop")
    table = create_transcript_table(spark, str(path / "t"), n_buckets=4)
    main_eff: list[dict] = []
    branch_eff: list[dict] = []
    br = None
    main_moved_since_fork = False
    lsn = 0
    step = 0
    n_branches = 0

    def rows_for(n0, n):
        out = []
        for i in range(n):
            out.append(
                {
                    "lsn": n0 + i,
                    "op": ["I", "U", "U", "D"][(n0 + i) % 4],
                    "conv_id": f"b{(n0 + i) % 2}",
                    "turn_idx": np.int32((n0 + i) % 3),
                    "role": None if (n0 + i) % 4 == 3 else "user",
                    "text": None if (n0 + i) % 4 == 3 else f"t-{n0 + i}",
                    "tool": None if (n0 + i) % 4 == 3 else "",
                    "ts": pd.NaT if (n0 + i) % 4 == 3 else
                    pd.Timestamp("2025-01-01") + pd.Timedelta(seconds=n0 + i),
                }
            )
        return out

    def apply_to(handle, eff, n):
        nonlocal lsn, step
        rows = rows_for(lsn, n)
        lsn += n
        step += 1
        apply_changes(
            handle,
            spark.createDataFrame(pd.DataFrame(rows), schema=CHANGELOG_SCHEMA),
            batch_key=f"k{step}",
            mode="mor",
        )
        eff.extend(rows)

    def check():
        got = read_transcripts(table).toPandas()
        exp = replay_oracle_pandas(pd.DataFrame(main_eff))
        if len(exp) == 0:
            assert len(got) == 0
        else:
            assert_pdf_equal(got, exp)
        if br is not None:
            bgot = read_transcripts(br).toPandas()
            bexp = replay_oracle_pandas(pd.DataFrame(branch_eff))
            if len(bexp) == 0:
                assert len(bgot) == 0
            else:
                assert_pdf_equal(bgot, bexp)

    for op in ops:
        if op == "main_batch":
            apply_to(table, main_eff, 3)
            if br is not None:
                main_moved_since_fork = True
        elif op == "branch_create":
            if br is None:
                n_branches += 1
                br = table.create_branch(f"fix{n_branches}")
                branch_eff = list(main_eff)
                main_moved_since_fork = False
                branch_committed = False
        elif op == "branch_batch":
            if br is not None:
                apply_to(br, branch_eff, 3)
                branch_committed = True
        elif op == "publish":
            if br is not None:
                name = f"fix{n_branches}"
                if main_moved_since_fork and branch_committed:
                    # true divergence: BOTH chains moved since the fork
                    with pytest.raises(
                        ConcurrentCommitError, match="advanced past the fork"
                    ):
                        table.fast_forward(name)
                elif main_moved_since_fork:
                    # empty branch: nothing after the fork to publish —
                    # a no-op, NOT a conflict (divergence needs both
                    # sides to move); main must be untouched
                    seq_before = table.current_seq()
                    rep = table.fast_forward(name)
                    assert rep["published"] == 0
                    assert table.current_seq() == seq_before
                else:
                    table.fast_forward(name)
                    main_eff = list(branch_eff)
                table.delete_branch(name)
                br = None
        elif op == "branch_abandon":
            if br is not None:
                table.delete_branch(f"fix{n_branches}")
                br = None
        elif op == "compact":
            table.compact()
            if br is not None:
                main_moved_since_fork = True
        elif op == "expire":
            table.expire_snapshots(keep_last=1)
        elif op == "gc":
            table.remove_orphans(grace_sec=0.0)
        check()
