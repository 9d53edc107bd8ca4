"""The reference's end-to-end workload on this engine: nested user docs →
15 normalized Icelite tables, batched, with idempotent redelivery that
the reference lacks (its replayed batch aborts on PK violation,
example/src/main.rs:489-493)."""

import datetime

from etl_rust_spark.operators.migrate import (
    MIGRATION_TABLES,
    create_migration_tables,
    migrate_users_batch,
)
from tests.test_operators import _reference_user_fixture


def _doc(uid, ts):
    kv = lambda k: {"key": k, "value": "v", "timestamp": ts, "metadata": "m"}  # noqa: E731
    return {
        "user_id": uid, "username": f"u{uid}", "email": f"u{uid}@x",
        "first_name": "A", "last_name": "B", "age": 20 + uid,
        "created_at": ts, "updated_at": ts,
        "address": {"street": "s", "city": "c", "state": "st",
                    "zip_code": "z", "country": "C",
                    "coordinates": {"lat": 1.0, "lng": 2.0}},
        "profile": {"bio": "b", "interests": ["i"], "skills": ["s"],
                    "education": [{"institution": f"e{uid}", "degree": "d",
                                   "year": 2000, "description": "x"}],
                    "experience": [{"company": "c", "position": "p",
                                    "duration": "1y", "description": "x"}]},
        "preferences": {"language": "en", "timezone": "UTC",
                        "notifications": {"email": True, "sms": False},
                        "settings": [kv("k")]},
        "activity_log": [kv("a")],
        "transactions": [kv("t")],
        "messages": [{"id": f"m-{uid}", "from": "f", "to": "t", "subject": "s",
                      "body": "b", "timestamp": ts, "read": True,
                      "attachments": [{"name": "a", "size": 1, "file_type": "png"}]}],
        "social_media": {"connections": {"x": "@"}, "posts": [kv("p")],
                         "groups": [{"id": f"g-{uid}", "name": "g", "joined": ts}]},
        "large_data": {f"blob{i}": "B" for i in range(1, 6)},
    }


def test_reference_migration_end_to_end(spark, tmp_path):
    sample = _reference_user_fixture(spark)
    schema = sample.schema
    ts = datetime.datetime(2025, 6, 1)
    tables = create_migration_tables(spark, str(tmp_path / "mig"), sample)
    assert set(tables) == set(MIGRATION_TABLES)

    b0 = spark.createDataFrame([_doc(1, ts), _doc(2, ts)], schema=schema)
    r0 = migrate_users_batch(tables, b0, batch_key="b0")
    assert all(rec is not None for rec in r0.values())

    # batch 1 updates user 2 (new email) and adds user 3 — upsert by id
    d2 = _doc(2, ts); d2["email"] = "new@x"
    b1 = spark.createDataFrame([d2, _doc(3, ts)], schema=schema)
    migrate_users_batch(tables, b1, batch_key="b1")

    users = {r.id: r for r in tables["users"].read().collect()}
    assert set(users) == {1, 2, 3}
    assert users[2].email == "new@x"
    # child tables carry FK-consistent rows for all three users
    edu = tables["education"].read().collect()
    assert {r.profile_id for r in edu} == {1, 2, 3}
    att = {r.message_id for r in tables["attachments"].read().collect()}
    assert att == {"m-1", "m-2", "m-3"}
    assert tables["groups"].read().count() == 3

    # idempotent redelivery across ALL 15 tables (the reference aborts here)
    state = {n: tables[n].read().count() for n in MIGRATION_TABLES}
    r_replay = migrate_users_batch(tables, b1, batch_key="b1")
    assert all(rec is None for rec in r_replay.values())
    assert state == {n: tables[n].read().count() for n in MIGRATION_TABLES}

    # partial-failure healing: pretend table 'posts' missed batch b2 while
    # others applied it — replay applies ONLY the missing one
    b2 = spark.createDataFrame([_doc(4, ts)], schema=schema)
    skip = dict(tables); posts = skip.pop("posts")
    from etl_rust_spark.operators.flatten import normalize_nested_users
    from pyspark.sql import functions as F
    for name, df in normalize_nested_users(b2).items():
        if name != "posts":
            tables[name].merge(df.withColumn("op", F.lit("U")), batch_key="b2")
    r_heal = migrate_users_batch(tables, b2, batch_key="b2")
    assert r_heal["posts"] is not None           # missing table applied
    assert all(v is None for k, v in r_heal.items() if k != "posts")
    assert posts.read().count() == 4


def test_generated_users_flatten_to_reference_shape(spark):
    """The bench generator (distributed, id-derived) must produce docs
    that flatten to the reference's exact per-user row multiset: 21 child
    rows across all 15 tables (2 education, 1 experience, 2 settings,
    1 activity, 3 transactions, 2 messages, 2 attachments, 1 post,
    1 group, 6 singletons)."""
    from etl_rust_spark.operators.flatten import normalize_nested_users
    from etl_rust_spark.operators.migrate import generate_nested_users_spark

    n = 64
    docs = generate_nested_users_spark(spark, n, start=5)
    tables = normalize_nested_users(docs)
    assert set(tables) == set(MIGRATION_TABLES)
    counts = {k: v.count() for k, v in tables.items()}
    per_user = {
        "users": 1, "addresses": 1, "profiles": 1, "education": 2,
        "experience": 1, "preferences": 1, "settings": 2, "activity_log": 1,
        "transactions": 3, "messages": 2, "attachments": 2,
        "social_media": 1, "posts": 1, "groups": 1, "large_data": 1,
    }
    assert counts == {k: n * v for k, v in per_user.items()}
    # deterministic across invocations (id-derived, no RNG)
    a = sorted(map(tuple, generate_nested_users_spark(spark, 8).select(
        "user_id", "email").collect()))
    b = sorted(map(tuple, generate_nested_users_spark(spark, 8).select(
        "user_id", "email").collect()))
    assert a == b
