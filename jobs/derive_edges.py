"""spark-submit entry point: transcripts -> ids + edges + degrees tables.

The batch ETL leg (SURVEY.md §3.3): derives the link graph once; analytics
jobs read the derived tables instead of re-deriving per run.

Usage:
  spark-submit --py-files pagerank_spark.zip jobs/derive_edges.py \
      --transcripts t.parquet --output graph_dir/
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pagerank_spark.operators.degrees import degree_table
from pagerank_spark.operators.edges import transcripts_to_graph
from pagerank_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--transcripts", required=True)
    ap.add_argument("--output", required=True)
    args = ap.parse_args()

    spark = get_spark("derive-edges")
    t = spark.read.parquet(args.transcripts)
    ids, edges = transcripts_to_graph(t)
    ids.write.mode("overwrite").parquet(os.path.join(args.output, "ids"))
    edges.write.mode("overwrite").parquet(os.path.join(args.output, "edges"))
    deg = degree_table(edges, ids.selectExpr("vid as id"))
    deg.write.mode("overwrite").parquet(os.path.join(args.output, "degrees"))
    print(json.dumps({
        "vertices": ids.count(),
        "edges": edges.count(),
        "dangling": deg.filter("out_degree = 0").count(),
    }))


if __name__ == "__main__":
    main()
