"""spark-submit entry point: unigram-LM tokenizer training + corpus apply.

Usage:
  spark-submit --py-files pagerank_spark.zip jobs/run_tokenizer.py \
      --docs docs.parquet --output out/ \
      [--max-len 4] [--min-count 2] [--text-col text] [--id-col doc_id]

The unigram-family sibling of jobs/run_bpe.py (operators/unigram.py):
trains the frequency-scored piece vocabulary, Viterbi-segments the
distinct-word vocabulary, and applies it per document.

Writes ``out/vocab.parquet`` (piece, cnt, score_nano),
``out/segments.parquet`` (w, cnt, n_tokens, score_nano, seg) and
``out/fertility.parquet`` (doc_id, n_words, n_pieces, fert_micro), and
prints one JSON summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pagerank_spark.operators.unigram import (
    unigram_fertility,
    unigram_segment,
    unigram_vocab,
)
from pagerank_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--max-len", type=int, default=4)
    ap.add_argument("--min-count", type=int, default=2)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--id-col", default="doc_id")
    args = ap.parse_args()

    spark = get_spark("run-tokenizer")
    docs = spark.read.parquet(args.docs)

    vocab = unigram_vocab(docs, args.text_col, args.max_len, args.min_count)
    vocab.write.mode("overwrite").parquet(os.path.join(args.output, "vocab.parquet"))

    seg = unigram_segment(docs, args.text_col, args.max_len, args.min_count)
    seg.write.mode("overwrite").parquet(os.path.join(args.output, "segments.parquet"))

    fert = unigram_fertility(
        docs, args.text_col, args.id_col, args.max_len, args.min_count
    )
    fert.write.mode("overwrite").parquet(
        os.path.join(args.output, "fertility.parquet")
    )

    stats = fert.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("n_words"),
        F.sum("n_pieces").alias("n_pieces"),
    ).collect()[0]
    n_pieces_vocab = vocab.count()
    n_distinct_words = seg.count()
    print(
        json.dumps(
            {
                "n_docs": stats["n_docs"],
                "n_words": stats["n_words"],
                "n_pieces": stats["n_pieces"],
                "vocab_size": n_pieces_vocab,
                "n_distinct_words": n_distinct_words,
                "fertility_micro": (
                    stats["n_pieces"] * 1_000_000 // stats["n_words"]
                    if stats["n_words"]
                    else 0
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
