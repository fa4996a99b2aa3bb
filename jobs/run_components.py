"""spark-submit entry point: connected components / label propagation /
strongly connected components / triangle count over a transcripts table.

Usage:
  spark-submit --py-files pagerank_spark.zip jobs/run_components.py \
      --transcripts t.parquet --algo cc|lpa|scc|triangles --output out/
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pagerank_spark.algos.components import connected_components
from pagerank_spark.algos.labelprop import label_propagation
from pagerank_spark.algos.scc import strongly_connected_components
from pagerank_spark.algos.triangles import triangle_count
from pagerank_spark.operators.edges import transcripts_to_graph
from pagerank_spark.plans.checkpoint import Checkpointer
from pagerank_spark.session import get_spark


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--transcripts", required=True)
    ap.add_argument("--algo", choices=["cc", "lpa", "scc", "triangles"], default="cc")
    ap.add_argument("--output", required=True)
    ap.add_argument("--checkpoint", default=None)
    args = ap.parse_args()

    spark = get_spark(f"graph-{args.algo}")
    t = spark.read.parquet(args.transcripts)
    ids, edges = transcripts_to_graph(t)
    verts = ids.selectExpr("vid as id")

    if args.algo == "triangles":
        os.makedirs(args.output, exist_ok=True)
        n = triangle_count(edges)
        with open(os.path.join(args.output, "triangles.json"), "w") as f:
            json.dump({"triangles": n}, f)
        print(json.dumps({"triangles": n}))
        return

    ck = Checkpointer(spark, args.checkpoint) if args.checkpoint else None
    extra = {}
    if args.algo == "cc":
        result = connected_components(edges, vertices=verts, checkpointer=ck)
    elif args.algo == "scc":
        # directed semantics on the reply graph (no symmetrization)
        scc = strongly_connected_components(edges, checkpointer=ck)
        result = scc.labels
        extra = {"rounds": scc.rounds, "converged": scc.converged}
    else:
        result = label_propagation(edges, vertices=verts, checkpointer=ck)
    result.join(ids, result.id == ids.vid).drop("vid").write.mode("overwrite").parquet(args.output)
    print(json.dumps({"algo": args.algo, "rows": result.count(),
                      "supersteps": ck.committed_supersteps()[-1] if ck else None, **extra}))


if __name__ == "__main__":
    main()
