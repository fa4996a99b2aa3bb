"""spark-submit entry point: table profiling + robust outlier sweep.

The ingest-time data-quality job: profile every column of a parquet table
(one-pass null/distinct/min-max stats, `operators/profile.py`) and, when a
group/value pair is given, flag Hampel median/MAD outliers
(`operators/outliers.py`; the value column is truncated to BIGINT —
pre-scale fractional units, e.g. cents, upstream if that matters). Writes the profile (and flagged rows, if
requested) as parquet and prints a one-line JSON summary.

Usage:
  spark-submit --py-files pagerank_spark.zip jobs/run_profile.py \
      --input table.parquet --output out/ \
      [--approx] [--outlier-group g_col --outlier-value v_col \
       --outlier-id id_col [--outlier-k 3]]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pagerank_spark.operators.outliers import mad_outliers
from pagerank_spark.operators.profile import profile_table
from pagerank_spark.session import get_spark


def run(spark, args) -> dict:
    df = spark.read.parquet(args.input)
    prof = profile_table(df, exact=not args.approx)
    prof.write.mode("overwrite").parquet(os.path.join(args.output, "profile"))
    rows = spark.read.parquet(os.path.join(args.output, "profile")).collect()
    summary = {
        "columns": len(rows),
        "n_rows": rows[0].n_rows if rows else 0,
        "null_cells": sum(r.n_null for r in rows),
        "mode": "approx" if args.approx else "exact",
    }
    if args.outlier_group:
        flagged = mad_outliers(
            df, args.outlier_group, args.outlier_value, args.outlier_id, k=args.outlier_k
        )
        flagged.write.mode("overwrite").parquet(os.path.join(args.output, "outliers"))
        summary["outliers"] = spark.read.parquet(
            os.path.join(args.output, "outliers")
        ).count()
    return summary


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--approx", action="store_true",
                    help="approx_count_distinct profile (the 100-TB one-pass mode)")
    ap.add_argument("--outlier-group")
    ap.add_argument("--outlier-value")
    ap.add_argument("--outlier-id")
    ap.add_argument("--outlier-k", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    args = ap.parse_args()
    if args.outlier_group and not (args.outlier_value and args.outlier_id):
        ap.error("--outlier-group requires --outlier-value and --outlier-id")
    spark = get_spark("profile", master=f"local[{args.cpus}]", shuffle_partitions=args.cpus)
    print(json.dumps(run(spark, args)))


if __name__ == "__main__":
    main()
