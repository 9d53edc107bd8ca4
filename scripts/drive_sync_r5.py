import sys, shutil, datetime as dt
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F
from etl_rust_spark.lake.format import IceliteTable
from etl_rust_spark.operators.apply import (apply_changes,
    create_transcript_table, read_transcripts, sync_snapshot)

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.shuffle.partitions", "8").getOrCreate())
TS = dt.datetime(2025, 1, 1)
DDL = ("lsn long, op string, conv_id string, turn_idx int, role string, "
       "text string, tool string, ts timestamp")
base = "/tmp/sync_drive"; shutil.rmtree(base, ignore_errors=True)
t = create_transcript_table(spark, base + "/t", n_buckets=4)
rows = [(i, "I", f"c{i%3}", i//3, "user", f"v{i}", "", TS) for i in range(9)]
apply_changes(t, spark.createDataFrame(rows, DDL), batch_key="seed", mode="mor")
# upstream full snapshot: drop one conv entirely, change one row, add one
snap = (read_transcripts(t).filter("conv_id <> 'c2'")
        .withColumn("text", F.when((F.col("conv_id")=="c0") & (F.col("turn_idx")==0),
                                   F.lit("EDITED")).otherwise(F.col("text"))))
extra = spark.createDataFrame([("c9", 0, "user", "new", "", TS)],
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp")
snap = snap.unionByName(extra)
rep = sync_snapshot(t, snap, batch_key="sync1")
print("counts:", rep["inserted"], rep["updated"], rep["deleted"])
assert (rep["inserted"], rep["updated"], rep["deleted"]) == (1, 1, 3)
live = read_transcripts(t).orderBy("conv_id", "turn_idx")
exp = snap.orderBy("conv_id", "turn_idx")
assert [r.asDict() for r in live.collect()] == [r.asDict() for r in exp.collect()], "live != snapshot"
print("OK live state == snapshot after sync")
assert sync_snapshot(t, snap, batch_key="sync2") is None
print("OK zero-diff re-sync commits nothing")
print("DRIVE SYNC: ALL OK")
