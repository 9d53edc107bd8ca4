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


def test_flatten_reference_parity(spark):
    """F5 fixture: nested doc → normalized child tables with
    parent_id*10000+idx ids (reference example/src/main.rs:137,152)."""
    from etl_rust_spark.operators.flatten import normalize_nested_users

    rows = [
        {
            "user_id": 7,
            "username": "u7",
            "email": "u7@x",
            "first_name": "Ada",
            "last_name": "L",
            "created_at": datetime.datetime(2025, 3, 1),
            "address": {"city": "X", "coordinates": {"lat": 1.5, "lng": -2.5}},
            "profile": {
                "interests": ["a", "b"],
                "education": [
                    {"school": "s1", "degree": "d1", "year": 2001},
                    {"school": "s2", "degree": "d2", "year": 2005},
                ],
                "experience": [{"company": "c1", "title": "t1", "years": 3}],
            },
            "messages": [
                {"content": "m0", "read": True,
                 "attachments": [{"url": "a0", "size": 10}, {"url": "a1", "size": 20}]},
                {"content": "m1", "read": False, "attachments": []},
            ],
        }
    ]
    schema = """
        user_id long, username string, email string, first_name string,
        last_name string, created_at timestamp,
        address struct<city:string, coordinates:struct<lat:double,lng:double>>,
        profile struct<interests:array<string>,
                       education:array<struct<school:string,degree:string,year:int>>,
                       experience:array<struct<company:string,title:string,years:int>>>,
        messages array<struct<content:string, read:boolean,
                              attachments:array<struct<url:string,size:int>>>>
    """
    users = spark.createDataFrame(rows, schema=schema)
    tables = normalize_nested_users(users)

    root = tables["users"].collect()[0]
    assert root.full_name == "Ada L"
    assert '"lat":1.5' in root.coordinates_json

    edu = {r.id: r for r in tables["education"].collect()}
    assert set(edu) == {70000, 70001} and edu[70001].school == "s2"

    msgs = {r.id: r for r in tables["messages"].collect()}
    assert set(msgs) == {70000, 70001}

    att = {r.id: r for r in tables["attachments"].collect()}
    # attachment id = message_id*10000 + idx (two-level synthesis)
    assert set(att) == {700000000, 700000001}
    assert att[700000001].url == "a1" and att[700000001].parent_id == 70000
