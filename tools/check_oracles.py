"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and, where an ``oracle_sql()`` entry
exists, the same query on DuckDB over the same parquet tables; compares row
count, column names, and an order-insensitive value multiset (columns sorted
by name, rows sorted, values stringified with float normalization).

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from pagerank_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm_val(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.9g}"
    return str(v)


def canon(rows: list[dict]) -> list[tuple]:
    if not rows:
        return []
    cols = sorted(rows[0].keys())
    return sorted(tuple(norm_val(r[c]) for c in cols) for r in rows)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir)
        srows = [r.asDict() for r in sdf.collect()]
        scols = sorted(sdf.columns)
        dt = time.time() - t0
        if name not in oracles:
            print(f"{name:28s} rows-only: {len(srows)} rows, cols={scols} ({dt:.1f}s)")
            if len(srows) == 0:
                failures.append((name, "zero rows"))
            continue
        od = con.sql(oracles[name]).fetchdf()
        orows = od.to_dict("records")
        ocols = sorted(od.columns.tolist())
        status = []
        if scols != ocols:
            status.append(f"SCHEMA spark={scols} oracle={ocols}")
        if len(srows) != len(orows):
            status.append(f"COUNT spark={len(srows)} oracle={len(orows)}")
        if not status:
            cs, co = canon(srows), canon(orows)
            if cs != co:
                diff = [(a, b) for a, b in zip(cs, co) if a != b][:3]
                status.append(f"VALUES differ, e.g. {diff}")
        if status:
            failures.append((name, "; ".join(status)))
            print(f"{name:28s} FAIL: {'; '.join(status)} ({dt:.1f}s)")
        else:
            print(f"{name:28s} OK ({len(srows)} rows, {dt:.1f}s)")

    print()
    if failures:
        print(f"{len(failures)} FAILURES:")
        for n, s in failures:
            print(f"  {n}: {s[:300]}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
