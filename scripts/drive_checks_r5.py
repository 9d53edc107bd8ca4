import sys, shutil, json
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F
from etl_rust_spark.lake.format import IceliteTable, CheckViolationError

spark = (SparkSession.builder.master("local[8]")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.shuffle.partitions", "8").getOrCreate())
t = "/tmp/chk_t"; shutil.rmtree(t, ignore_errors=True)
rows = [("c1", 0, "user", "hi", None, 1, "I"), ("c1", 1, "assistant", "yo", None, 2, "I")]
sch = "conv_id string, turn_idx int, role string, text string, tool string, __lsn long, op string"
df = spark.createDataFrame(rows, sch)
tab = IceliteTable.create(spark, t, df.drop("op").schema, key_cols=["conv_id", "turn_idx"], seq_col="__lsn", bucket_key="conv_id", n_buckets=4)
tab.merge(df, source="seed", batch_key="b0", mode="mor", seq_col="__lsn")
snap = tab.add_check("turn_nonneg", "turn_idx >= 0")
assert tab.pointer()["checks"] == {"turn_nonneg": "turn_idx >= 0"}, "check not in pointer"
# violating batch must fail BEFORE writing
bad = spark.createDataFrame([("c2", -1, "user", "bad", None, 3, "I")], sch)
seq0 = tab.current_seq()
try:
    tab.merge(bad, source="seed", batch_key="b1", mode="mor", seq_col="__lsn"); raise SystemExit("merge accepted violation")
except CheckViolationError as e:
    assert e.violations == {"turn_nonneg": 1}, e.violations
assert tab.current_seq() == seq0, "violation advanced seq"
print("OK check blocks bad merge, table untouched")
# NULL passes; delete of a bad row exempt; good batch lands
good = spark.createDataFrame([("c2", None, "user", "nullpass", None, 4, "I")], sch)
tab.merge(good, source="seed", batch_key="b2", mode="mor", seq_col="__lsn")
assert tab.read().filter("conv_id='c2'").count() == 1
print("OK NULL predicate passes (ANSI)")
# add_check validating existing rows refuses when data violates
try:
    tab.add_check("role_short", "length(role) <= 3"); raise SystemExit("validate missed existing violation")
except CheckViolationError: pass
assert "role_short" not in (tab.pointer().get("checks") or {})
print("OK add_check validates existing rows")
# rename guard
try:
    tab.rename_column("turn_idx", "ti"); raise SystemExit("rename broke check silently")
except ValueError as e: assert "turn_nonneg" in str(e)
print("OK rename guarded by check resolution")
tab.drop_check("turn_nonneg")
assert not (tab.pointer().get("checks") or {})
# clone carries checks
tab.add_check("again", "turn_idx is null or turn_idx >= 0")
shutil.rmtree("/tmp/chk_clone", ignore_errors=True)
tab.clone("/tmp/chk_clone")
c = IceliteTable.load(spark, "/tmp/chk_clone")
assert c.pointer().get("checks") == {"again": "turn_idx is null or turn_idx >= 0"}, "clone lost checks"
print("OK clone carries checks")
print("DRIVE CHECKS: ALL OK")
