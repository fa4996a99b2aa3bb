"""spark-submit entry point: corpus quality scoring + repeated-span cleanup.

Composes the round-4 quality operators into one pass over a documents
parquet:

1. ExactSubstr repeated-span removal (`trainprep.remove_repeated_spans`) —
   tokens inside any >=k-word span duplicated corpus-wide are excised.
2. CCNet-style bigram-LM surprisal (`operators/lm.py`) — a reference LM is
   trained on the trusted subset (default: lang == 'en') and every CLEANED
   document is scored; high average surprisal = unlike the reference.
3. Gopher repetition signals (`textops.repetition_signals`) on the cleaned
   text (zero-shuffle projection).

Writes one row per document (doc_id, n_tokens, n_removed, text_clean,
n_bigrams, surprisal_micro, avg_surprisal_micro, top_word_frac, ...) and
prints a one-line JSON summary.

Usage:
  spark-submit --py-files pagerank_spark.zip jobs/run_quality.py \
      --documents docs.parquet --output out/ \
      [--span-k 5] [--ref-lang en] [--add-k 1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pagerank_spark.operators.lm import lm_score, train_bigram_lm
from pagerank_spark.operators.textops import repetition_signals
from pagerank_spark.operators.trainprep import remove_repeated_spans
from pagerank_spark.session import get_spark


def run(spark, documents: str, output: str, span_k: int, ref_lang: str, add_k: int) -> dict:
    docs = spark.read.parquet(documents)
    cleaned = remove_repeated_spans(docs, k=span_k).localCheckpoint()
    clean_docs = cleaned.select("doc_id", F.col("text_clean").alias("text")).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    uni, bi, v = train_bigram_lm(clean_docs.filter(F.col("lang") == ref_lang))
    scored = lm_score(clean_docs, uni, bi, v, add_k=add_k)
    signals = repetition_signals(clean_docs)
    out = (
        cleaned.join(scored, "doc_id")
        .join(signals.select("doc_id", "top_word_frac", "top_bigram_frac", "dup_word_frac"), "doc_id")
    )
    out.write.mode("overwrite").parquet(output)
    written = spark.read.parquet(output)
    agg = written.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_removed").alias("tokens_removed"),
        F.sum("n_tokens").alias("tokens_in"),
        F.avg("avg_surprisal_micro").alias("mean_avg_surprisal_micro"),
    ).first()
    return {
        "docs": agg["docs"],
        "tokens_in": int(agg["tokens_in"]),
        "tokens_removed": int(agg["tokens_removed"]),
        "mean_avg_surprisal_micro": round(float(agg["mean_avg_surprisal_micro"]), 1),
        "lm_vocab": v,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--documents", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--span-k", type=int, default=5)
    ap.add_argument("--ref-lang", default="en")
    ap.add_argument("--add-k", type=int, default=1)
    args = ap.parse_args()
    spark = get_spark("corpus-quality")
    print(json.dumps(run(spark, args.documents, args.output, args.span_k, args.ref_lang, args.add_k)))


if __name__ == "__main__":
    main()
