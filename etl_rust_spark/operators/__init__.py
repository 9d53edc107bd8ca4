from etl_rust_spark.operators.apply import apply_changes, dedup_max_lsn

__all__ = ["apply_changes", "dedup_max_lsn"]
