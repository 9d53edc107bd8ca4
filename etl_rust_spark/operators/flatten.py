"""Flatten/normalize: one nested document → N relational child tables.

Reference parity: the example's transform explodes a nested Mongo user
document into 15 normalized row-groups with synthesized child ids
``parent_id * 10000 + idx`` (/root/reference/example/src/main.rs:131-275,
id synthesis at :137,:152,:175). Here the same semantics are one
``posexplode`` + id expression per child table — declarative, codegen'd,
partition-parallel, no per-row code.

At scale each child extraction is a narrow map over the parent scan (no
shuffle at all); Catalyst prunes the parent scan to just the nested field
each child table needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHILD_ID_FACTOR = 10000  # parent_id*10000+idx, as the reference synthesizes


def explode_child(
    df: DataFrame,
    parent_id: str,
    array_col: str,
    child_cols: list[str] | None = None,
) -> DataFrame:
    """One child table: posexplode an array-of-struct column, synthesize
    the child PK, carry the FK."""
    exploded = df.select(
        F.col(parent_id).alias("parent_id"),
        F.posexplode(array_col).alias("idx", "item"),
    )
    out = exploded.select(
        (F.col("parent_id") * CHILD_ID_FACTOR + F.col("idx")).alias("id"),
        F.col("parent_id"),
        F.col("idx"),
        *(
            [F.col(f"item.{c}").alias(c) for c in child_cols]
            if child_cols
            else [F.col("item")]
        ),
    )
    return out


def explode_grandchild(
    df: DataFrame,
    parent_id: str,
    array_col: str,
    nested_array: str,
    child_cols: list[str],
) -> DataFrame:
    """Two-level nesting (messages → attachments in the reference,
    example/src/main.rs:212-242): explode twice, synthesize both ids."""
    mid = df.select(
        F.col(parent_id).alias("root_id"),
        F.posexplode(array_col).alias("mid_idx", "mid"),
    ).select(
        (F.col("root_id") * CHILD_ID_FACTOR + F.col("mid_idx")).alias("mid_id"),
        F.posexplode(f"mid.{nested_array}").alias("idx", "item"),
    )
    return mid.select(
        (F.col("mid_id") * CHILD_ID_FACTOR + F.col("idx")).alias("id"),
        F.col("mid_id").alias("parent_id"),
        F.col("idx"),
        *[F.col(f"item.{c}").alias(c) for c in child_cols],
    )


def normalize_nested_users(users: DataFrame) -> dict[str, DataFrame]:
    """The reference example's flatten, on its document shape
    (mongodb_model.rs:120-146): root row + child tables from each nested
    array, plus the struct-to-JSON encodings the sink stores
    (example/src/main.rs:117-128)."""
    root = users.select(
        F.col("user_id").alias("id"),
        "username",
        "email",
        F.concat_ws(" ", "first_name", "last_name").alias("full_name"),
        F.to_json(F.col("address.coordinates")).alias("coordinates_json"),
        F.to_json(F.col("profile.interests")).alias("interests_json"),
        F.col("created_at"),
    )
    return {
        "users": root,
        "education": explode_child(
            users, "user_id", "profile.education", ["school", "degree", "year"]
        ),
        "experience": explode_child(
            users, "user_id", "profile.experience", ["company", "title", "years"]
        ),
        "messages": explode_child(
            users, "user_id", "messages", ["content", "read"]
        ),
        "attachments": explode_grandchild(
            users, "user_id", "messages", "attachments", ["url", "size"]
        ),
    }
