"""spark-submit entry point: end-to-end entity resolution.

Usage:
  spark-submit --py-files pagerank_spark.zip jobs/run_er.py \
      --input table.parquet --id-col id --text-col name --output out/ \
      [--blocker edjoin|snm] [--k 1] [--q 3] [--window 4]

Pipeline: candidate pairs (Ed-Join prefix-filtered edit-distance join, or
sorted-neighborhood blocking + ngram-Jaccard verify) -> connected components
over the match graph with the FULL id universe as vertices -> canonical
entity = min id per cluster. Writes ``(id, entity)`` plus a one-line JSON
summary on stdout. Same composition as the ``er_parts`` oracle gate.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pagerank_spark.algos.components import connected_components
from pagerank_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--id-col", default="id")
    ap.add_argument("--text-col", default="s")
    ap.add_argument("--output", required=True)
    ap.add_argument("--blocker", choices=["edjoin", "snm"], default="edjoin")
    ap.add_argument("--k", type=int, default=1, help="max edit distance (edjoin)")
    ap.add_argument("--q", type=int, default=3, help="gram size (edjoin)")
    ap.add_argument("--window", type=int, default=4, help="SNM window")
    ap.add_argument(
        "--jaccard-pct", type=int, default=80, help="SNM verify threshold (percent)"
    )
    args = ap.parse_args()

    spark = get_spark(f"er-{args.blocker}")
    rows = spark.read.parquet(args.input).select(
        F.col(args.id_col).alias("id"), F.col(args.text_col).alias("s")
    )

    if args.blocker == "edjoin":
        from pagerank_spark.operators.stringjoin import edit_distance_join

        pairs = edit_distance_join(rows, k=args.k, q=args.q).select(
            F.col("a_id").alias("src"), F.col("b_id").alias("dst")
        )
    else:
        from pagerank_spark.operators.blocking import sorted_neighborhood_pairs
        from pagerank_spark.operators.dedup import ngram_jaccard

        cand = sorted_neighborhood_pairs(
            rows.withColumn("n_chars", F.length("s")),
            ["n_chars"],
            window=args.window,
            id_col="id",
        ).select("a", "b")
        scored = ngram_jaccard(
            rows.select(F.col("id").alias("doc_id"), F.col("s").alias("text")),
            cand,
        )
        pairs = scored.filter(
            F.col("jaccard") * 100 >= args.jaccard_pct
        ).select(F.col("a").alias("src"), F.col("b").alias("dst"))

    pairs = pairs.localCheckpoint()
    cc = connected_components(pairs, vertices=rows.select("id"))
    out = cc.select("id", F.col("component").alias("entity"))
    out.write.mode("overwrite").parquet(args.output)

    n = rows.count()
    n_entities = out.select("entity").distinct().count()
    print(
        json.dumps(
            {
                "blocker": args.blocker,
                "rows": n,
                "match_pairs": pairs.count(),
                "entities": n_entities,
                "merged": n - n_entities,
            }
        )
    )


if __name__ == "__main__":
    main()
