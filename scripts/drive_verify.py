"""spark-submit e2e drive: WAL ingest -> oracle equality, restart no-op,
time travel, pruning, change-feed replay, rename metadata-only, WAP, the
icelite streaming source, and the round-5 rewrite_manifests surface."""
import os
import shutil
import sys
import tempfile

import pandas as pd
from pyspark.sql import SparkSession, functions as F

from etl_rust_spark.changelog import (
    CHANGELOG_SCHEMA,
    ChangelogConfig,
    generate_changelog_pandas,
    replay_oracle_pandas,
    write_wal_segments,
)
from etl_rust_spark.lake.format import IceliteTable, _dedup_by_seq
from etl_rust_spark.operators.apply import (
    apply_changes,
    create_transcript_table,
    read_transcripts,
)
from etl_rust_spark.streaming.driver import ChangelogIngest

root = tempfile.mkdtemp(prefix="drive_verify_")
wal = os.path.join(root, "wal")
tbl = os.path.join(root, "t")
ck = os.path.join(root, "ck")

spark = SparkSession.builder.getOrCreate()
spark.conf.set("spark.sql.session.timeZone", "UTC")

log = generate_changelog_pandas(ChangelogConfig(
    n_events=1200, n_conversations=40, turns_per_conv=12,
    dup_fraction=0.05, delete_fraction=0.08, seed=7,
))
write_wal_segments(log, wal, 6, spark)
table = create_transcript_table(spark, tbl, n_buckets=8)
ChangelogIngest(
    spark=spark, wal_dir=wal, table_path=tbl, checkpoint_dir=ck,
    schema=CHANGELOG_SCHEMA, mode="mor",
).run_available()

got = read_transcripts(table).toPandas()
want = replay_oracle_pandas(log)
key = ["conv_id", "turn_idx"]
got = got.sort_values(key).reset_index(drop=True)[sorted(got.columns)]
want = want.sort_values(key).reset_index(drop=True)[sorted(want.columns)]
common = [c for c in want.columns if c in got.columns]
pd.testing.assert_frame_equal(got[common], want[common], check_dtype=False)
print("OK ingest == oracle", len(got))

# same-checkpoint restart with nothing new: metadata no-op
seq0 = table.current_seq()
ChangelogIngest(
    spark=spark, wal_dir=wal, table_path=tbl, checkpoint_dir=ck,
    schema=CHANGELOG_SCHEMA, mode="mor",
).run_available()
assert table.current_seq() == seq0, "restart was not a no-op"
print("OK restart no-op at seq", seq0)

# time travel + lineage accounting
assert table.read(seq=1).count() > 0
lin = table.lineage().toPandas().sort_values("commit_seq").reset_index(drop=True)
assert lin["commit_seq"].is_monotonic_increasing and lin["commit_seq"].max() == seq0, (len(lin), seq0, lin["commit_seq"].tolist())
print("OK time travel + lineage", len(lin))

# predicate file pruning
full = table.read()
some_conv = got["conv_id"].iloc[0]
pruned = table.read(where=[("conv_id", "=", some_conv)])
assert 0 < len(pruned.inputFiles()) < len(full.inputFiles())
assert pruned.count() == full.filter(F.col("conv_id") == some_conv).count()
print("OK pruning", len(pruned.inputFiles()), "/", len(full.inputFiles()))

# DNF (OR-of-ANDs) where: exact vs plain filter, pruning conservative
c_a, c_b = got["conv_id"].iloc[0], got["conv_id"].iloc[-1]
dnf = [[("conv_id", "=", c_a)], [("conv_id", "=", c_b)]]
got_dnf = table.read(where=dnf)
want_dnf = full.filter(
    (F.col("conv_id") == c_a) | (F.col("conv_id") == c_b)
)
assert got_dnf.exceptAll(want_dnf).count() == 0
assert want_dnf.exceptAll(got_dnf).count() == 0
print("OK DNF where", got_dnf.count())

# update_where: in-place rewrite as a CDC event (round-5e); the
# rewritten rows must land before the feed-replay probe below so the
# replay covers the update commit too
up_conv = got["conv_id"].iloc[2]
n_up = table.read(where=[("conv_id", "=", up_conv)]).filter(
    ~F.coalesce(F.col("__deleted"), F.lit(False))).count()
rec_u = table.update_where(
    [("conv_id", "=", up_conv)],
    {"text": "concat('[R] ', text)"}, batch_key="uw-1")
assert rec_u is not None and rec_u["n_upserts"] == n_up, (rec_u, n_up)
upd = read_transcripts(table).filter(F.col("conv_id") == up_conv)
assert upd.count() == n_up
assert upd.filter(~F.col("text").startswith("[R] ")).count() == 0
assert table.update_where([("conv_id", "=", up_conv)],
                          {"text": "'x'"}, batch_key="uw-1") is None
print("OK update_where rewrite", n_up)

# change feed replay == live state
ptr = table.pointer()
feed = table.read_changes(0)
replayed = _dedup_by_seq(
    feed.drop("_commit_seq"), ptr["key_cols"], ptr["seq_col"],
    table.schema,
)
live = table.read()
assert replayed.exceptAll(live).count() == 0
assert live.exceptAll(replayed).count() == 0
print("OK feed replay == live state", live.count())

# metadata-first aggregates (round-5g): count_live and min_max must
# equal full-scan answers in whatever delta/tombstone state the table
# is in right here, and again post-compaction (where the metadata tier
# should carry most files)
live_now = read_transcripts(table)
n_oracle = live_now.count()
cd = table.count_live(detail=True)
assert cd["count"] == n_oracle, (cd, n_oracle)
mm = table.min_max("turn_idx")
r = live_now.agg(F.min("turn_idx"), F.max("turn_idx")).first()
assert mm == (r[0], r[1]), (mm, r)
mt = table.min_max("ts")
rt = live_now.agg(F.min("ts"), F.max("ts")).first()
assert mt == (rt[0], rt[1]), (mt, rt)
cw_conv = got["conv_id"].iloc[0]
cw = table.count_where([("conv_id", "=", cw_conv)])
cw_oracle = live_now.filter(F.col("conv_id") == cw_conv).count()
assert cw == cw_oracle, (cw, cw_oracle)
print("OK metadata-first count/min_max/count_where", cd["count"], mm, cw)

# ---- round-5: rewrite_manifests through the deployed surface ----
n_manifests_before = table.describe()["n_manifests"]
files_before = sorted(e["path"] for e in table._files(table.pointer()))
live_before = live.toPandas().sort_values(key).reset_index(drop=True)
snap = table.rewrite_manifests()
assert len(snap["manifests"]) < n_manifests_before
assert sorted(e["path"] for e in table._files(table.pointer())) == files_before
after = table.read().toPandas().sort_values(key).reset_index(drop=True)
pd.testing.assert_frame_equal(
    live_before[sorted(live_before.columns)], after[sorted(after.columns)],
    check_dtype=False,
)
# feed across the rewrite commit: skipped, same rows
assert table.read_changes(0).count() == feed.count()
# pruning still works off carried-over stats
pruned2 = table.read(where=[("conv_id", "=", some_conv)])
assert 0 < len(pruned2.inputFiles()) < len(files_before)
print("OK rewrite_manifests", n_manifests_before, "->", len(snap["manifests"]))

# minor (delta-only) compaction: base untouched, reads identical
table.compact()
base_paths = sorted(
    e["path"] for e in table._files(table.pointer())
    if e.get("kind", "base") == "base"
)
extra_log = log.copy()
extra_log["lsn"] = extra_log["lsn"] + 1_000_000
for j in range(3):
    chunk = extra_log.iloc[j * 100 : (j + 1) * 100]
    apply_changes(table, spark.createDataFrame(chunk),
                  batch_key=f"mc-{j}", mode="mor")
pre = table.read().toPandas().sort_values(key).reset_index(drop=True)
table.compact_deltas(min_delta_files_per_bucket=0)
assert sorted(
    e["path"] for e in table._files(table.pointer())
    if e.get("kind", "base") == "base"
) == base_paths
post = table.read().toPandas().sort_values(key).reset_index(drop=True)
pd.testing.assert_frame_equal(
    pre[sorted(pre.columns)], post[sorted(post.columns)], check_dtype=False
)
print("OK minor compaction: base verbatim, reads identical")

# file-size-capped compaction: explicit files_per_bucket splits buckets
table.compact(files_per_bucket=3)
per_bucket = {}
for e in table._files(table.pointer()):
    per_bucket[e["bucket"]] = per_bucket.get(e["bucket"], 0) + 1
assert max(per_bucket.values()) > 1
post_split = table.read().toPandas().sort_values(key).reset_index(drop=True)
pd.testing.assert_frame_equal(
    pre[sorted(pre.columns)], post_split[sorted(post_split.columns)],
    check_dtype=False,
)
print("OK files_per_bucket split: buckets split, reads identical")

# post-compaction, count_live should answer mostly from metadata (no
# delta buckets left; only files still holding tombstone winners scan)
cd2 = table.count_live(detail=True)
assert cd2["count"] == read_transcripts(table).count(), cd2
assert cd2["dedup_scan_buckets"] == 0, cd2
assert cd2["metadata_files"] > 0, cd2
print("OK post-compaction metadata count", cd2["metadata_files"], "meta files")

# clone: snapshot export to a new independent table (round-5e)
cl = table.clone(os.path.join(root, "clone"))
cl_live, src_live = cl.read(), table.read()
assert cl_live.exceptAll(src_live).count() == 0
assert src_live.exceptAll(cl_live).count() == 0
assert cl.is_applied("mc-0")  # exactly-once ledger carried
assert cl.read_changes(0).count() == 0  # non-change bootstrap commit
n_cl = cl_live.count()
table.compact()  # source-side maintenance is invisible to the clone
assert cl.read().count() == n_cl
print("OK clone export", n_cl)

# fsck: backup-verify composition — both tables deep-clean
for t_chk, lbl in ((table, "source"), (cl, "clone")):
    rep = t_chk.fsck(deep=True)
    assert rep["ok"], (lbl, rep["errors"])
    assert rep["checked"]["files"] > 0 and rep["checked"]["footers"] > 0
print("OK fsck deep-clean on source + clone")

# rename is metadata-only; ingest after rename unions cleanly
files_pre = sorted(e["path"] for e in table._files(table.pointer()))
table.rename_column("text", "body")
assert sorted(e["path"] for e in table._files(table.pointer())) == files_pre
assert table.read().filter(F.col("body").isNotNull()).count() > 0
print("OK rename metadata-only")

# explicit ADD COLUMN DDL: metadata-only, null-backfill, feed-invisible
seq_pre = table.current_seq()
table.add_column("lang", "string")
assert sorted(e["path"] for e in table._files(table.pointer())) == files_pre
assert table.read().filter(F.col("lang").isNotNull()).count() == 0
assert table.read_changes(seq_pre, table.current_seq()).count() == 0
# age-based expiry with an ancient cutoff is a no-op (nothing that old)
assert table.expire_snapshots(keep_last=1, older_than=0.0) == []
print("OK add_column metadata-only + age-expire no-op")

# WAP: stage, audit, publish
extra = log.head(50).copy()
extra["lsn"] = extra["lsn"] + 10_000_000
batch = spark.createDataFrame(extra)
seq_b = table.current_seq()
apply_changes(table, batch.withColumnRenamed("text", "body"),
              batch_key="wap-1", mode="mor", stage_as="qa")
assert table.current_seq() == seq_b
assert table.read_staged("qa").count() > 0
table.publish_staged("qa")
assert table.current_seq() == seq_b + 1 and table.is_applied("wap-1")
print("OK WAP stage/audit/publish")

# icelite streaming source drains the commit log exactly once
from etl_rust_spark.sources.icelite_source import register_icelite_source

register_icelite_source(spark)
seen = []
q = (
    spark.readStream.format("icelite").option("path", tbl).load()
    .writeStream.foreachBatch(lambda df, eid: seen.append(df.count()))
    .option("checkpointLocation", os.path.join(root, "src_ck"))
    .trigger(availableNow=True).start()
)
q.awaitTermination(120)
total_feed = table.read_changes(0).count()
assert sum(seen) == total_feed, (seen, total_feed)
print("OK streaming source drained", sum(seen))

# sinceTimestamp start: pre-creation instant == the full feed; the
# commit-clock boundary matches the seq-based read
got_ts = (
    spark.read.format("icelite").option("path", tbl)
    .option("sinceTimestamp", "100.0").load().count()
)
assert got_ts == total_feed, (got_ts, total_feed)
print("OK sinceTimestamp start", got_ts)

# ---- round-5d: bidirectional join materialization (ChangeFeedJoin) ----
from pyspark.sql import types as T  # noqa: E402

from etl_rust_spark.streaming.join import ChangeFeedJoin  # noqa: E402

ja, jb = os.path.join(root, "ja"), os.path.join(root, "jb")
jt, jck = os.path.join(root, "jt"), os.path.join(root, "jck")
a_schema = T.StructType([
    T.StructField("user_id", T.StringType()),
    T.StructField("plan", T.StringType()),
    T.StructField("lsn", T.LongType()),
])
b_schema = T.StructType([
    T.StructField("user_id", T.StringType()),
    T.StructField("order_id", T.StringType()),
    T.StructField("amount", T.LongType()),
    T.StructField("lsn", T.LongType()),
])
a_t = IceliteTable.create(
    spark, ja, a_schema, key_cols=["user_id"], bucket_key="user_id",
    n_buckets=2, order_cols=["user_id"], seq_col="lsn")
b_t = IceliteTable.create(
    spark, jb, b_schema, key_cols=["user_id", "order_id"],
    bucket_key="user_id", n_buckets=2,
    order_cols=["user_id", "order_id"], seq_col="lsn")
a_t.merge(spark.createDataFrame(
    [("u1", "free", 1), ("u2", "pro", 1)], a_schema
).withColumn("op", F.lit("U")), batch_key="ja1", seq_col="lsn", mode="mor")
b_t.merge(spark.createDataFrame(
    [("u1", "o1", 10, 1), ("u2", "o2", 20, 1), ("u9", "ox", 0, 1)], b_schema
).withColumn("op", F.lit("U")), batch_key="jb1", seq_col="lsn", mode="mor")
ChangeFeedJoin.create_target(spark, jt, ja, jb, join_cols=["user_id"],
                             n_buckets=2)
jn = ChangeFeedJoin(spark=spark, a_path=ja, b_path=jb, table_path=jt,
                    checkpoint_dir=jck, join_cols=["user_id"])
jn.run_available()
jt_t = IceliteTable.load(spark, jt)
live_j = jt_t.read()
if "__deleted" in live_j.columns:
    live_j = live_j.filter(~F.coalesce(F.col("__deleted"), F.lit(False)))
rows_j = {(r["user_id"], r["order_id_b"], r["plan"], r["amount_b"])
          for r in live_j.collect()}
assert rows_j == {("u1", "o1", "free", 10), ("u2", "o2", "pro", 20)}, rows_j
seq_j = jt_t.current_seq()
jn.run_available()  # nothing new: metadata no-op
assert jt_t.current_seq() == seq_j
# B-side delete shrinks; late A insert back-fills — bidirectional
b_t.merge(spark.createDataFrame([("u2", "o2", 0, 2)], b_schema)
          .withColumn("op", F.lit("U"))
          .withColumn("__deleted", F.lit(True)),
          batch_key="jb2", seq_col="lsn", mode="mor")
a_t.merge(spark.createDataFrame([("u9", "new", 2)], a_schema)
          .withColumn("op", F.lit("U")), batch_key="ja2",
          seq_col="lsn", mode="mor")
jn.run_available()
live_j = jt_t.read().filter(~F.coalesce(F.col("__deleted"), F.lit(False)))
rows_j = {(r["user_id"], r["order_id_b"]) for r in live_j.collect()}
assert rows_j == {("u1", "o1"), ("u9", "ox")}, rows_j
print("OK feed-join bidirectional", sorted(rows_j))

shutil.rmtree(root, ignore_errors=True)
print("DRIVE VERIFY: ALL OK")
sys.exit(0)
