"""Driver-hash-stability sweep: compares every oracled gate's Spark output
against DuckDB under RAW stringification (no float normalization), on both
the fetchall (native types) and fetchdf (pandas) paths.

A gate can be value-correct (tools/check_oracles.py green) yet still fail
the driver's hash if the two engines render the same value differently
("5" vs "5.0", 1-ulp doubles after ROUND, DECIMAL/HUGEINT leakage). This
sweep finds those before the driver does.

Usage: python tools/strict_sweep.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb

import __spark_entry__ as entrymod
from pagerank_spark.session import get_spark

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("strict-sweep")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    fragile = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = [r.asDict() for r in sdf.collect()]
            cols = sorted(sdf.columns)
            s_can = sorted(tuple(str(r[c]) for c in cols) for r in srows)

            rel = con.sql(oracles[name])
            fa = [dict(zip(rel.columns, row)) for row in con.sql(oracles[name]).fetchall()]
            fa_can = sorted(tuple(str(r[c]) for c in cols) for r in fa)
            fd = con.sql(oracles[name]).fetchdf().to_dict("records")
            fd_can = sorted(tuple(str(r[c]) for c in cols) for r in fd)
        except Exception as e:  # noqa: BLE001 - report, keep sweeping
            fragile.append((name, f"ERR {e}"))
            print(f"{name:32s} ERR {str(e)[:200]}", flush=True)
            continue
        dt = time.time() - t0
        msgs = []
        for tag, oc in [("fetchall", fa_can), ("fetchdf", fd_can)]:
            if s_can != oc:
                diff = [(a, b) for a, b in zip(s_can, oc) if a != b][:2]
                extra = f" len {len(s_can)} vs {len(oc)}" if len(s_can) != len(oc) else ""
                msgs.append(f"{tag} DIFF{extra} e.g. {diff}")
        if msgs:
            fragile.append((name, "; ".join(msgs)))
            print(f"{name:32s} FRAGILE: {'; '.join(msgs)[:300]} ({dt:.1f}s)", flush=True)
        else:
            print(f"{name:32s} stable ({len(s_can)} rows, {dt:.1f}s)", flush=True)

    print(flush=True)
    if fragile:
        print(f"{len(fragile)} fragile gates:")
        for n, s in fragile:
            print(f"  {n}: {s[:400]}")
        sys.exit(1)
    print("all oracled gates are representation-stable")


if __name__ == "__main__":
    main()
