"""spark-submit entry point: end-to-end training-corpus preparation.

Runs the composed pipeline (operators/trainprep.py:prepare_training_corpus):
quality filter -> exact dedup -> eval-set decontamination -> deterministic
train/val/test split -> per-split sequence packing — one declarative plan,
one write.

Usage:
  spark-submit --py-files pagerank_spark.zip jobs/run_prepare_corpus.py \
      --documents docs.parquet --eval eval_docs.parquet --output out/ \
      [--min-quality 0.7] [--ngram 13] [--budget 2048] \
      [--train-pct 90] [--val-pct 5]

Writes per-document placement rows partitioned by split (the layout a
trainer's data loader reads shard-parallel) and prints a one-line JSON
summary (per-split doc/chunk/token counts) on stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pagerank_spark.operators.trainprep import prepare_training_corpus
from pagerank_spark.session import get_spark


def run(spark, documents: str, eval_path: str, output: str, min_quality: float,
        ngram: int, budget: int, train_pct: int, val_pct: int) -> dict:
    docs = spark.read.parquet(documents)
    ev = spark.read.parquet(eval_path)
    packed = prepare_training_corpus(
        docs, ev, min_quality=min_quality, ngram=ngram, budget=budget,
        train_pct=train_pct, val_pct=val_pct,
    )
    packed = packed.localCheckpoint()
    packed.write.mode("overwrite").partitionBy("split").parquet(output)
    stats = {
        r["split"]: {"docs": r["docs"], "tokens": r["tokens"], "chunks": r["chunks"]}
        for r in packed.groupBy("split").agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum("n_tokens").alias("tokens"),
            (F.max("last_chunk") + 1).alias("chunks"),
        ).collect()
    }
    return {"input_docs": docs.count(), "kept_docs": packed.count(), "splits": stats}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--documents", required=True)
    ap.add_argument("--eval", dest="eval_path", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--min-quality", type=float, default=0.7)
    ap.add_argument("--ngram", type=int, default=13)
    ap.add_argument("--budget", type=int, default=2048)
    ap.add_argument("--train-pct", type=int, default=90)
    ap.add_argument("--val-pct", type=int, default=5)
    args = ap.parse_args()
    spark = get_spark("prepare-corpus")
    summary = run(spark, args.documents, args.eval_path, args.output,
                  args.min_quality, args.ngram, args.budget,
                  args.train_pct, args.val_pct)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
