"""Operator-surface tests: the driver-facing queries vs the DuckDB oracle
at sf0.001 (the driver's own gate runs sf0.01 — this keeps `pytest` fast
while covering every oracle), flatten parity (F5), multimodal plumbing."""

import datetime
import math

import duckdb
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm_rows(rows):
    clean = [
        tuple(None if (isinstance(x, float) and math.isnan(x)) else x for x in r)
        for r in rows
    ]
    return sorted(clean, key=lambda t: tuple((x is None, str(x)) for x in t))


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_query_matches_oracle(spark, duck, name):
    fn = entrymod.queries()[name]
    sdf = fn(spark, SF_DIR)
    scols = sorted(sdf.columns)
    srows = _norm_rows([tuple(row[c] for c in scols) for row in sdf.collect()])
    rel = duck.sql(entrymod.oracle_sql()[name])
    order = sorted(range(len(rel.columns)), key=lambda i: rel.columns[i])
    dcols = [rel.columns[i] for i in order]
    drows = _norm_rows([tuple(r[i] for i in order) for r in rel.fetchall()])
    assert scols == dcols
    assert len(srows) == len(drows)
    assert srows == drows


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) >= 4


def test_multimodal_plumbing(spark):
    df = entrymod.queries()["multimodal_features"](spark, SF_DIR)
    pdf = df.toPandas()
    assert len(pdf) > 0
    assert set(pdf.columns) == {"doc_id", "mime", "n_bytes", "width", "height", "checksum"}
    assert (pdf.n_bytes > 0).all()
    assert pdf.width.between(1, 640).all() and pdf.height.between(1, 480).all()


def _reference_user_fixture(spark):
    """The reference's full MongoUser document shape
    (mongodb_model.rs:120-146): every nested field the 15-table flatten
    consumes."""
    ts = datetime.datetime(2025, 3, 1)
    kv = lambda k: {"key": k, "value": "v", "timestamp": ts, "metadata": "m"}  # noqa: E731
    rows = [
        {
            "user_id": 7, "username": "u7", "email": "u7@x",
            "first_name": "Ada", "last_name": "L", "age": 30,
            "created_at": ts, "updated_at": ts,
            "address": {
                "street": "1 Main", "city": "X", "state": "ST",
                "zip_code": "12345", "country": "C",
                "coordinates": {"lat": 1.5, "lng": -2.5},
            },
            "profile": {
                "bio": "bio", "interests": ["a", "b"], "skills": ["s"],
                "education": [
                    {"institution": "s1", "degree": "d1", "year": 2001, "description": "e1"},
                    {"institution": "s2", "degree": "d2", "year": 2005, "description": "e2"},
                ],
                "experience": [
                    {"company": "c1", "position": "p1", "duration": "3y", "description": "x"}
                ],
            },
            "preferences": {
                "language": "en", "timezone": "UTC",
                "notifications": {"email": True, "sms": False},
                "settings": [kv("k0"), kv("k1")],
            },
            "activity_log": [kv("a0")],
            "transactions": [kv("t0"), kv("t1"), kv("t2")],
            "messages": [
                {"id": "m-0", "from": "f", "to": "t", "subject": "s0", "body": "b0",
                 "timestamp": ts, "read": True,
                 "attachments": [
                     {"name": "a0", "size": 10, "file_type": "png"},
                     {"name": "a1", "size": 20, "file_type": "pdf"},
                 ]},
                {"id": "m-1", "from": "f", "to": "t", "subject": "s1", "body": "b1",
                 "timestamp": ts, "read": False, "attachments": []},
            ],
            "social_media": {
                "connections": {"x": "@u7"},
                "posts": [kv("p0")],
                "groups": [{"id": "g-1", "name": "grp", "joined": ts}],
            },
            "large_data": {f"blob{i}": f"B{i}" for i in range(1, 6)},
        }
    ]
    kvs = "array<struct<key:string,value:string,timestamp:timestamp,metadata:string>>"
    schema = f"""
        user_id long, username string, email string, first_name string,
        last_name string, age int, created_at timestamp, updated_at timestamp,
        address struct<street:string,city:string,state:string,zip_code:string,
                       country:string,coordinates:struct<lat:double,lng:double>>,
        profile struct<bio:string, interests:array<string>, skills:array<string>,
                       education:array<struct<institution:string,degree:string,year:int,description:string>>,
                       experience:array<struct<company:string,position:string,duration:string,description:string>>>,
        preferences struct<language:string, timezone:string,
                           notifications:struct<email:boolean,sms:boolean>,
                           settings:{kvs}>,
        activity_log {kvs},
        transactions {kvs},
        messages array<struct<id:string, from:string, to:string, subject:string,
                              body:string, timestamp:timestamp, read:boolean,
                              attachments:array<struct<name:string,size:int,file_type:string>>>>,
        social_media struct<connections:struct<x:string>, posts:{kvs},
                            groups:array<struct<id:string,name:string,joined:timestamp>>>,
        large_data struct<blob1:string,blob2:string,blob3:string,blob4:string,blob5:string>
    """
    return spark.createDataFrame(rows, schema=schema)


def test_flatten_reference_parity(spark):
    """D3 parity: ONE nested doc → all 15 row-groups of the reference's
    TransformedUser (example/src/main.rs:37-53), with parent_id*10000+idx
    id synthesis (main.rs:137,152,175) and own-id carry for messages and
    groups (main.rs:217, :268)."""
    from etl_rust_spark.operators.flatten import normalize_nested_users

    tables = normalize_nested_users(_reference_user_fixture(spark))

    # the 1-doc → 15-row-groups invariant
    assert set(tables) == {
        "users", "addresses", "profiles", "education", "experience",
        "preferences", "settings", "activity_log", "transactions",
        "messages", "attachments", "social_media", "posts", "groups",
        "large_data",
    }
    counts = {name: df.count() for name, df in tables.items()}
    assert counts == {
        "users": 1, "addresses": 1, "profiles": 1, "education": 2,
        "experience": 1, "preferences": 1, "settings": 2, "activity_log": 1,
        "transactions": 3, "messages": 2, "attachments": 2,
        "social_media": 1, "posts": 1, "groups": 1, "large_data": 1,
    }

    root = tables["users"].collect()[0]
    assert (root.id, root.age) == (7, 30)
    addr = tables["addresses"].collect()[0]
    assert addr.id == addr.user_id == 7 and '"lat":1.5' in addr.coordinates
    prof = tables["profiles"].collect()[0]
    assert prof.interests == '["a","b"]'

    edu = {r.id: r for r in tables["education"].collect()}
    assert set(edu) == {70000, 70001} and edu[70001].institution == "s2"
    setts = {r.id: r for r in tables["settings"].collect()}
    assert set(setts) == {70000, 70001} and setts[70000].preference_id == 7
    txs = {r.id: r for r in tables["transactions"].collect()}
    assert set(txs) == {70000, 70001, 70002} and txs[70002].user_id == 7

    msgs = {r.id: r for r in tables["messages"].collect()}
    assert set(msgs) == {"m-0", "m-1"}  # own ids, not synthesized
    att = {r.id: r for r in tables["attachments"].collect()}
    # message-scoped synthesis: (uid*10000+msg_idx)*10000+att_idx;
    # FK carries the message's OWN id (deviation from the reference's
    # colliding user-scoped formula is documented in flatten.py)
    assert set(att) == {700000000, 700000001}
    assert att[700000001].name == "a1" and att[700000001].message_id == "m-0"

    grp = tables["groups"].collect()[0]
    assert grp.id == "g-1" and grp.social_media_id == 7
    blob = tables["large_data"].collect()[0]
    assert blob.blob5 == "B5"


def test_language_id_detects_four_languages(spark):
    """Semantic check (the oracle row only proves engine parity): the
    multi-language cascade must actually label en/es/fr/de sentences
    correctly and fall back to 'other' on stopword-free text."""
    from etl_rust_spark.operators.text import language_id
    from etl_rust_spark.queries import _LID_PROBES

    d = spark.createDataFrame(_LID_PROBES, "probe_id string, text string")
    got = {
        r["probe_id"]: r["pred"]
        for r in d.select("probe_id", language_id("text").alias("pred")).collect()
    }
    assert got == {
        "en1": "en", "en2": "en", "es1": "es", "es2": "es",
        "fr1": "fr", "fr2": "fr", "de1": "de", "de2": "de", "xx1": "other",
    }


def test_pii_scan_semantics(spark):
    """Counts/redactions must be RIGHT, not merely engine-identical."""
    from etl_rust_spark.operators.text import pii_scan
    from etl_rust_spark.queries import _PII_PROBES

    d = spark.createDataFrame(
        [(i, t) for i, (_, t) in enumerate(_PII_PROBES)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in pii_scan(d).collect()}
    assert (got[0]["n_email"], got[0]["n_phone"]) == (2, 0)
    assert (got[1]["n_phone"], got[1]["n_ssn"]) == (2, 1)
    assert got[2]["n_ipv4"] == 2
    assert all(got[3][f"n_{k}"] == 0 for k in ("email", "ssn", "phone", "ipv4"))
    assert got[0]["redacted"] == "contact me at [EMAIL] or [EMAIL] today"
    assert got[1]["redacted"] == "call [PHONE] or [PHONE] about ssn [SSN]"
    assert got[2]["redacted"] == "server at [IPV4] and [IPV4] responded fine"


def test_contamination_check_planted(spark):
    """A doc containing a benchmark item's 5-gram is flagged; clean docs
    are not; the benchmark never matches itself (cross-set only)."""
    from etl_rust_spark.operators.dedup import contamination_check

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        "bench_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "intro text then the quick brown fox jumps over everything"),
            (2, "completely unrelated words nothing shared at all here"),
        ],
        "doc_id long, text string",
    )
    got = contamination_check(docs, bench, shingle_n=5).collect()
    assert [(r["doc_id"], r["bench_id"]) for r in got] == [(1, 100)]
    assert got[0]["n_shared"] == 2  # two overlapping distinct 5-grams


def test_dedup_incremental_cross_set_only(spark):
    """Finds a planted new-vs-corpus near-dup; never reports
    corpus-vs-corpus (or new-vs-new) pairs."""
    from etl_rust_spark.operators.dedup import dedup_incremental

    base = " ".join(f"w{j}" for j in range(20))
    corpus = spark.createDataFrame(
        [(0, base + " tail one"), (2, base + " tail one")],  # corpus-internal dup
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, base + " tail two"), (3, "totally different content entirely here")],
        "doc_id long, text string",
    )
    got = dedup_incremental(new, corpus, jaccard_threshold=0.5).collect()
    pairs = {(r["new_id"], r["corpus_id"]) for r in got}
    assert pairs == {(1, 0), (1, 2)}  # the near-dup against BOTH corpus copies
