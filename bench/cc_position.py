"""connected_components suite-position probe (VERDICT r4 directive #2).

The driver bench's `connected_components` median drifted 7.2 -> 10.5s in
round 4 with NO code change on the path; idle re-runs sat at 7.9-8.3s. The
candidate explanations are VM contention and a suite-position/JVM-aging
effect (the entry runs third, after two 10-iteration PageRank workloads
have aged the heap and JIT state). This probe separates them: in fresh
JVMs, run the identical workload either FIRST (nothing before it) or MID
(after the two PageRank entries exactly as bench.py orders them), several
samples each, and report both distributions.

Usage: python bench/cc_position.py [--sf-dir DIR] [--runs 3]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pagerank_spark.session import get_spark
from pagerank_spark.sources.graphs import events_graph
from pagerank_spark.algos.components import connected_components
from pagerank_spark.algos.pagerank import pagerank

mode = sys.argv[1]; sf_dir = sys.argv[2]
spark = get_spark("cc-position")
spark.sparkContext.setLogLevel("ERROR")
edges = events_graph(spark, sf_dir).persist()
edges.count()
if mode == "mid":
    # replicate the suite prefix exactly as bench.py orders it (one pass
    # of each preceding entry; the real bench runs warmup+3 of each)
    from pyspark.sql import functions as F
    pagerank(edges, max_iters=10, tol=0.0, mode="join", check_every=3).ranks.count()
    pagerank(edges.withColumn("weight", (F.lit(1) + F.pmod(F.col("src") + F.col("dst"), F.lit(5))).cast("double")),
             max_iters=10, tol=0.0, weight_col="weight", check_every=3).ranks.count()
connected_components(edges).count()  # warmup of the path itself
t0 = time.time()
connected_components(edges).count()
print(json.dumps({{"mode": mode, "cc_seconds": time.time() - t0}}))
"""


def run_once(mode: str, sf_dir: str) -> float:
    out = subprocess.run(
        [sys.executable, "-c", WORKER.format(repo=REPO), mode, sf_dir],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])["cc_seconds"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    res = {}
    for mode in ("first", "mid"):
        samples = [round(run_once(mode, args.sf_dir), 2) for _ in range(args.runs)]
        res[mode] = {"median": round(statistics.median(samples), 2), "samples": samples}
    print(json.dumps(res))


if __name__ == "__main__":
    main()
