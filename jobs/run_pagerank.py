"""spark-submit entry point: damped PageRank over a transcripts table.

Usage:
  spark-submit --py-files pagerank_spark.zip jobs/run_pagerank.py \
      --transcripts /path/to/transcripts.parquet \
      --output /path/to/ranks --checkpoint /path/to/ckpt \
      [--damping 0.85] [--tol 1e-9] [--max-iters 100] [--mode join|csr]

On a cluster the --transcripts path is an Iceberg table name; here the
Parquet path keeps the sandbox self-contained. Resumable: re-running with
the same --checkpoint continues from the last committed superstep.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pagerank_spark.algos.pagerank import pagerank
from pagerank_spark.operators.edges import transcripts_to_graph
from pagerank_spark.plans.checkpoint import Checkpointer
from pagerank_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--transcripts", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--damping", type=float, default=0.85)
    ap.add_argument("--tol", type=float, default=1e-9)
    ap.add_argument("--max-iters", type=int, default=100)
    ap.add_argument("--mode", choices=["join", "csr"], default="join")
    args = ap.parse_args()

    spark = get_spark("pagerank-run")
    t = spark.read.parquet(args.transcripts)
    ids, edges = transcripts_to_graph(t)
    verts = ids.selectExpr("vid as id")
    ck = Checkpointer(spark, args.checkpoint) if args.checkpoint else None
    res = pagerank(
        edges, vertices=verts, damping=args.damping, tol=args.tol,
        max_iters=args.max_iters, mode=args.mode, checkpointer=ck,
    )
    res.ranks.join(ids, res.ranks.id == ids.vid).select("conv_id", "turn_idx", "rank").write.mode(
        "overwrite"
    ).parquet(args.output)
    print(json.dumps({"iterations": res.iterations, "converged": res.converged, "l1": res.l1_history[-1:]}))


if __name__ == "__main__":
    main()
