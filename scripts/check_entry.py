"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry and its ``oracle_sql()`` twin at a given sf, compare
row count, column names, and order-insensitive values (exact — floats must
match bit-for-bit, which the query surface is designed to guarantee).

Usage: python scripts/check_entry.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from etl_rust_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(rows, cols):
    out = []
    for r in rows:
        vals = []
        for c in cols:
            v = r[c] if isinstance(r, dict) else r[cols.index(c)]
            if isinstance(v, float):
                v = float(v)  # numpy → python
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("check-entry")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            sdf = fn(spark, sf_dir)
            scols = sorted(sdf.columns)
            srows = [tuple(row[c] for c in scols) for row in sdf.collect()]
            srows = sorted(
                ([None if (isinstance(x, float) and math.isnan(x)) else x for x in r] for r in srows),
                key=lambda t: tuple((x is None, str(x)) for x in t),
            )
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (no oracle — rows-only check)"
                  f" [{time.monotonic()-t0:.1f}s]")
            if len(srows) == 0:
                print(f"WARN  {name}: zero rows")
            continue
        try:
            rel = con.sql(oracles[name])
            dcols_raw = rel.columns
            didx = sorted(range(len(dcols_raw)), key=lambda i: dcols_raw[i])
            dcols = [dcols_raw[i] for i in didx]
            drows = sorted(
                ([None if (isinstance(r[i], float) and math.isnan(r[i])) else r[i] for i in didx] for r in rel.fetchall()),
                key=lambda t: tuple((x is None, str(x)) for x in t),
            )
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        status = []
        if scols != dcols:
            status.append(f"cols spark={scols} duck={dcols}")
        if len(srows) != len(drows):
            status.append(f"rowcount spark={len(srows)} duck={len(drows)}")
        elif not status:
            mism = sum(1 for a, b in zip(srows, drows) if list(a) != list(b))
            if mism:
                status.append(f"{mism}/{len(srows)} value mismatches")
                for a, b in zip(srows, drows):
                    if list(a) != list(b):
                        print(f"   spark: {a}\n   duck : {b}")
                        break
        if status:
            print(f"FAIL  {name}: {'; '.join(status)}")
            failures += 1
        else:
            print(f"OK    {name}: {len(srows)} rows [{time.monotonic()-t0:.1f}s]")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
