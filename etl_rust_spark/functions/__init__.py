from etl_rust_spark.functions.hashing import md5_long, knuth_hash, shingles

__all__ = ["md5_long", "knuth_hash", "shingles"]
