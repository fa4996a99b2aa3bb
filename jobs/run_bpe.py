"""spark-submit entry point: BPE merge-rule learning + corpus tokenization.

Usage:
  spark-submit --py-files pagerank_spark.zip jobs/run_bpe.py \
      --docs docs.parquet --merges 32 --output out/
      [--text-col text] [--id-col doc_id] [--level word|byte]

``--level byte`` trains the char-alphabet (within-word, </w>-marked)
tokenizer over the weighted distinct-word vocabulary.

Writes ``out/merges.parquet`` (round, left, right, freq — learning order)
and ``out/tokens.parquet`` (doc_id, tokens, n_tokens), and prints one JSON
summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pagerank_spark.operators.bpe import (
    apply_bpe_merges,
    apply_bpe_merges_byte,
    learn_bpe_merges,
    learn_bpe_merges_byte,
)
from pagerank_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--merges", type=int, default=32)
    ap.add_argument("--output", required=True)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--level", choices=["word", "byte"], default="word")
    args = ap.parse_args()

    spark = get_spark("bpe-train")
    docs = spark.read.parquet(args.docs)
    learn = learn_bpe_merges_byte if args.level == "byte" else learn_bpe_merges
    apply_ = apply_bpe_merges_byte if args.level == "byte" else apply_bpe_merges
    merges = learn(docs, k=args.merges, id_col=args.id_col, text_col=args.text_col)
    rules = [(r["left"], r["right"]) for r in merges.orderBy("round").collect()]
    merges.write.mode("overwrite").parquet(os.path.join(args.output, "merges.parquet"))
    toks = apply_(docs, rules, id_col=args.id_col, text_col=args.text_col)
    toks.write.mode("overwrite").parquet(os.path.join(args.output, "tokens.parquet"))
    stats = toks.agg({"n_tokens": "sum"}).collect()[0][0]
    print(json.dumps({"level": args.level, "rules_learned": len(rules), "docs": docs.count(), "total_tokens": int(stats or 0)}))


if __name__ == "__main__":
    main()
