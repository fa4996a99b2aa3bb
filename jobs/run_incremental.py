"""spark-submit entry point: streaming ingest + incremental PageRank refresh.

One invocation = one refresh cycle of a continuously-growing transcript
pipeline:

  1. drain pending transcript files into the append-only edge table
     (Structured Streaming availableNow; exactly-once per edge — see
     streaming/ingest.py),
  2. compact natural-key edges to dense vertex ids (operators/ids.py),
  3. run damped PageRank WARM-STARTED from the previous cycle's ranks —
     the damped iteration is a contraction with a unique fixed point, so
     the warm start converges to the exact same answer as a cold run, in
     far fewer supersteps when the graph grew incrementally
     (tests/test_pagerank.py::test_warm_start_incremental_refresh).

Usage (repeat per micro-batch arrival):
  spark-submit --py-files pagerank_spark.zip jobs/run_incremental.py \
      --in /path/transcripts_stream --workdir /path/state \
      [--tol 1e-9] [--max-iters 100]

``--workdir`` holds the stream checkpoint, the edge table, and the current
ranks; re-running resumes all three. On a cluster these are Iceberg tables;
Parquet paths keep the sandbox self-contained.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from pagerank_spark.algos.pagerank import pagerank
from pagerank_spark.operators.ids import assign_dense_ids
from pagerank_spark.session import get_spark
from pagerank_spark.sources.transcripts import TRANSCRIPTS_SCHEMA
from pagerank_spark.streaming.ingest import run_ingest


def refresh(spark, in_path: str, workdir: str, tol: float, max_iters: int) -> dict:
    edges_dir = os.path.join(workdir, "edges")
    ck_dir = os.path.join(workdir, "stream_ck")
    ranks_dir = os.path.join(workdir, "ranks")

    # 1. drain new transcript files into the edge table (natural keys)
    run_ingest(spark, in_path, edges_dir, ck_dir, TRANSCRIPTS_SCHEMA)

    raw = spark.read.parquet(edges_dir).dropDuplicates(["conv_id", "src_turn", "dst_turn"])
    # 2. dense ids over the union of endpoints (stable under growth only in
    # natural-key space — ids are re-derived per cycle, ranks are re-keyed)
    keys = (
        raw.select("conv_id", F.col("src_turn").alias("turn_idx"))
        .unionByName(raw.select("conv_id", F.col("dst_turn").alias("turn_idx")))
        .dropDuplicates()
    )
    ids = assign_dense_ids(keys, ["conv_id", "turn_idx"], id_col="vid")
    e = (
        raw.join(ids.withColumnRenamed("turn_idx", "src_turn").withColumnRenamed("vid", "src"),
                 ["conv_id", "src_turn"])
        .join(ids.withColumnRenamed("turn_idx", "dst_turn").withColumnRenamed("vid", "dst"),
              ["conv_id", "dst_turn"])
        .select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )

    # 3. warm start from the previous cycle's ranks (re-keyed via natural keys)
    init = None
    if os.path.isdir(ranks_dir):
        prev = spark.read.parquet(ranks_dir)
        init = prev.join(ids, ["conv_id", "turn_idx"]).select(F.col("vid").alias("id"), "rank")

    res = pagerank(e, tol=tol, max_iters=max_iters, check_every=3, init_ranks=init)
    out = res.ranks.join(ids, res.ranks.id == ids.vid).select("conv_id", "turn_idx", "rank")
    tmp = ranks_dir + "__new"
    out.write.mode("overwrite").parquet(tmp)
    # atomic-ish swap (a real deployment writes a new Iceberg snapshot)
    import shutil

    if os.path.isdir(ranks_dir):
        shutil.rmtree(ranks_dir)
    os.rename(tmp, ranks_dir)
    return {"iterations": res.iterations, "converged": res.converged,
            "warm": init is not None, "edges": e.count()}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="in_path", required=True)
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--tol", type=float, default=1e-9)
    ap.add_argument("--max-iters", type=int, default=100)
    args = ap.parse_args()

    spark = get_spark("incremental-pagerank")
    print(json.dumps(refresh(spark, args.in_path, args.workdir, args.tol, args.max_iters)))


if __name__ == "__main__":
    main()
