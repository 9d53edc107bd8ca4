"""The reference's end-to-end workload, re-expressed: nested user
documents → 15 normalized relational tables, batched, idempotent.

The reference example streams Mongo user docs, flattens each into 15
row-groups, and bulk-inserts them into Postgres
(/root/reference/example/src/main.rs:60-639) — with NO replay safety (a
re-delivered batch aborts on PK violation, main.rs:489-493). Here the
same migration runs as: batch of nested docs → ``normalize_nested_users``
(15 child DataFrames, operators/flatten.py) → one idempotent Icelite
MERGE per table, all sharing the batch key. A replayed batch no-ops on
every table that already applied it and applies only the missing ones, so
a crash between table writes self-heals on redelivery — strictly stronger
than the reference's semantics, on its own workload.

Scale notes: the 15 merges are independent jobs over ONE cached flatten
of the batch; each child extraction is a narrow map (no shuffle), each
merge shuffles only that table's rows on its own id."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_rust_spark.lake.format import IceliteTable
from etl_rust_spark.operators.flatten import normalize_nested_users

# every target table upserts by its synthetic/own id (reference PKs,
# example/create_schema.sql)
MIGRATION_TABLES = [
    "users", "addresses", "profiles", "education", "experience",
    "preferences", "settings", "activity_log", "transactions",
    "messages", "attachments", "social_media", "posts", "groups",
    "large_data",
]


def create_migration_tables(
    spark: SparkSession, base_path: str, users_sample: DataFrame, n_buckets: int = 8
) -> dict[str, IceliteTable]:
    """Create the 15 sink tables (schemas derived from a sample flatten —
    the Spark analog of the reference's seaql migration DDL,
    example/src/migration.rs)."""
    out = {}
    for name, df in normalize_nested_users(users_sample.limit(1)).items():
        out[name] = IceliteTable.create(
            spark,
            f"{base_path}/{name}",
            df.schema,
            key_cols=["id"],
            bucket_key="id",
            n_buckets=n_buckets,
            order_cols=["id"],
            if_not_exists=True,
        )
    return out


def migrate_users_batch(
    tables: dict[str, IceliteTable],
    users_batch: DataFrame,
    batch_key: str,
) -> dict[str, dict | None]:
    """Apply one micro-batch of nested user docs to all 15 tables.

    Returns per-table lineage records (None where the batch key was
    already applied — idempotent redelivery heals partial failures)."""
    users_batch = users_batch.persist()
    try:
        results = {}
        for name, df in normalize_nested_users(users_batch).items():
            changes = df.withColumn("op", F.lit("U"))
            results[name] = tables[name].merge(
                changes, batch_key=batch_key, source=f"migrate:{name}"
            )
        return results
    finally:
        users_batch.unpersist()
