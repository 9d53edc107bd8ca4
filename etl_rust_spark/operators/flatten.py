"""Flatten/normalize: one nested document → 15 relational child tables.

Reference parity: the example's transform explodes a nested Mongo user
document into 15 normalized row-groups — users, addresses, profiles,
education, experience, preferences, settings, activity_log, transactions,
messages, attachments, social_media, posts, groups, large_data
(/root/reference/example/src/main.rs:96-293, struct list at :37-53) —
with synthesized child ids ``parent_id * 10000 + idx``
(id synthesis at main.rs:137, :152, :175). Here the same semantics are one
``posexplode`` + id expression per child table — declarative, codegen'd,
partition-parallel, no per-row code.

One deliberate deviation: the reference synthesizes attachment ids as
``user_id * 10000 + idx`` with ``idx`` restarting per message
(main.rs:227-240), so attachments of two messages from the same user
COLLIDE on id. Here attachment ids are message-scoped
(``(user_id*10000+msg_idx)*10000 + att_idx``) so they are actually unique;
``message_id`` carries the message's own id as the reference does.

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
    fk_name: str = "parent_id",
) -> DataFrame:
    """One child table: posexplode an array-of-struct column, synthesize
    the child PK, carry the FK (named per target table, e.g. profile_id)."""
    exploded = df.select(
        F.col(parent_id).alias("__pid"),
        F.posexplode(array_col).alias("idx", "item"),
    )
    out = exploded.select(
        (F.col("__pid") * CHILD_ID_FACTOR + F.col("idx")).alias("id"),
        F.col("__pid").alias(fk_name),
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
    mid_id_col: str | None = None,
    fk_name: str = "parent_id",
) -> DataFrame:
    """Two-level nesting (messages → attachments in the reference,
    example/src/main.rs:212-242): explode twice, synthesize both ids.
    ``mid_id_col``: if the middle level has its OWN id field (messages do,
    main.rs:217), carry it as the FK instead of the synthesized one."""
    mid = df.select(
        F.col(parent_id).alias("root_id"),
        F.posexplode(array_col).alias("mid_idx", "mid"),
    ).select(
        (F.col("root_id") * CHILD_ID_FACTOR + F.col("mid_idx")).alias("mid_synth_id"),
        *( [F.col(f"mid.{mid_id_col}").alias("mid_own_id")] if mid_id_col else [] ),
        F.posexplode(f"mid.{nested_array}").alias("idx", "item"),
    )
    fk = F.col("mid_own_id") if mid_id_col else F.col("mid_synth_id")
    return mid.select(
        (F.col("mid_synth_id") * CHILD_ID_FACTOR + F.col("idx")).alias("id"),
        fk.alias(fk_name),
        F.col("idx"),
        *[F.col(f"item.{c}").alias(c) for c in child_cols],
    )


def _kv_log_table(users: DataFrame, array_col: str, fk_name: str) -> DataFrame:
    """The reference's recurring key/value/timestamp/metadata row-group
    shape (settings main.rs:169-182, activity_log :184-196,
    transactions :198-210, posts :250-263)."""
    return explode_child(
        users, "user_id", array_col,
        ["key", "value", "timestamp", "metadata"], fk_name=fk_name,
    )


def normalize_nested_users(users: DataFrame) -> dict[str, DataFrame]:
    """The reference example's full flatten on its document shape
    (mongodb_model.rs:120-146): ONE nested user document fans out into
    15 row-groups (TransformedUser, example/src/main.rs:37-53), plus the
    struct-to-JSON encodings the sink stores (main.rs:117-128,
    create_schema.sql:22,29-30)."""
    uid = F.col("user_id")
    return {
        # 1:1 tables keyed by the user id (main.rs:96-128, :161-167,
        # :243-247, :276-284)
        "users": users.select(
            uid.alias("id"), "username", "email", "first_name", "last_name",
            "age", "created_at", "updated_at",
        ),
        "addresses": users.select(
            uid.alias("id"), uid.alias("user_id"),
            F.col("address.street").alias("street"),
            F.col("address.city").alias("city"),
            F.col("address.state").alias("state"),
            F.col("address.zip_code").alias("zip_code"),
            F.col("address.country").alias("country"),
            F.to_json(F.col("address.coordinates")).alias("coordinates"),
        ),
        "profiles": users.select(
            uid.alias("id"), uid.alias("user_id"),
            F.col("profile.bio").alias("bio"),
            F.to_json(F.col("profile.interests")).alias("interests"),
            F.to_json(F.col("profile.skills")).alias("skills"),
        ),
        "preferences": users.select(
            uid.alias("id"), uid.alias("user_id"),
            F.col("preferences.language").alias("language"),
            F.col("preferences.timezone").alias("timezone"),
            F.to_json(F.col("preferences.notifications")).alias("notifications"),
        ),
        "social_media": users.select(
            uid.alias("id"), uid.alias("user_id"),
            F.to_json(F.col("social_media.connections")).alias("connections"),
        ),
        "large_data": users.select(
            uid.alias("id"), uid.alias("user_id"),
            F.col("large_data.blob1").alias("blob1"),
            F.col("large_data.blob2").alias("blob2"),
            F.col("large_data.blob3").alias("blob3"),
            F.col("large_data.blob4").alias("blob4"),
            F.col("large_data.blob5").alias("blob5"),
        ),
        # 1:N tables with synthesized ids (main.rs:131-158, :169-210,
        # :250-263)
        "education": explode_child(
            users, "user_id", "profile.education",
            ["institution", "degree", "year", "description"],
            fk_name="profile_id",
        ),
        "experience": explode_child(
            users, "user_id", "profile.experience",
            ["company", "position", "duration", "description"],
            fk_name="profile_id",
        ),
        "settings": _kv_log_table(users, "preferences.settings", "preference_id"),
        "activity_log": _kv_log_table(users, "activity_log", "user_id"),
        "transactions": _kv_log_table(users, "transactions", "user_id"),
        "posts": _kv_log_table(users, "social_media.posts", "social_media_id"),
        # 1:N tables whose rows carry their OWN ids (messages main.rs:217,
        # groups :265-274)
        "messages": users.select(
            uid.alias("user_id"), F.explode("messages").alias("m")
        ).select(
            F.col("m.id").alias("id"), "user_id",
            F.col("m.from").alias("from"), F.col("m.to").alias("to"),
            F.col("m.subject").alias("subject"), F.col("m.body").alias("body"),
            F.col("m.timestamp").alias("timestamp"), F.col("m.read").alias("read"),
        ),
        "attachments": explode_grandchild(
            users, "user_id", "messages", "attachments",
            ["name", "size", "file_type"],
            mid_id_col="id", fk_name="message_id",
        ),
        "groups": users.select(
            uid.alias("user_id"), F.explode("social_media.groups").alias("g")
        ).select(
            F.col("g.id").alias("id"),
            F.col("user_id").alias("social_media_id"),
            F.col("g.name").alias("name"),
            F.col("g.joined").alias("joined"),
        ),
    }
