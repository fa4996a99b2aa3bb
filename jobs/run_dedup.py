"""spark-submit entry point: document dedup pipeline.

Usage:
  spark-submit --py-files pagerank_spark.zip jobs/run_dedup.py \
      --documents docs.parquet --output out/ \
      [--method exact|fingerprint|minhash|simhash] [--threshold 0.8]

Writes ``(doc_id, canonical_id)`` assignments (or ``(doc_id, simhash)`` for
the simhash method) plus a one-line JSON summary on stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pagerank_spark.operators.dedup import exact_dedup, minhash_dedup, simhash
from pagerank_spark.operators.textops import fingerprint_dups
from pagerank_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--documents", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--method", choices=["exact", "fingerprint", "minhash", "simhash"], default="minhash")
    ap.add_argument("--threshold", type=float, default=0.8)
    args = ap.parse_args()

    spark = get_spark(f"dedup-{args.method}")
    docs = spark.read.parquet(args.documents)
    if args.method == "exact":
        out = exact_dedup(docs)
    elif args.method == "fingerprint":
        out = fingerprint_dups(docs)
    elif args.method == "simhash":
        out = simhash(docs)
    else:
        out = minhash_dedup(docs, threshold=args.threshold)
    out.write.mode("overwrite").parquet(args.output)

    summary = {"method": args.method, "docs": docs.count()}
    if args.method != "simhash":
        groups = out.filter(F.col("doc_id") != F.col("canonical_id")).count()
        summary["duplicates_found"] = groups
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
