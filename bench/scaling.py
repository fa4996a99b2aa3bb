"""Two-parallelism scaling-efficiency harness (BASELINE.md protocol).

The north_rule's two-cluster-size criterion (N vs 4N executors) cannot use a
real cluster in this sandbox; per the driver protocol we run the IDENTICAL
PageRank workload on the IDENTICAL input at local[8] and local[32] in fresh
JVMs (one per run), shuffle partitions scaled proportionally, median of
``--runs`` runs after one warmup, and report throughput at both plus
efficiency (T_32/T_8)/4.

Usage: python bench/scaling.py [--sf-dir DIR] [--iters 10] [--runs 3]
Writes BENCH/BASELINE.md and prints one JSON line.
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
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pagerank_spark.session import get_spark
from pagerank_spark.sources.graphs import events_graph
from pagerank_spark.algos.pagerank import pagerank

cpus = int(sys.argv[1]); sf_dir = sys.argv[2]; iters = int(sys.argv[3])
spark = get_spark("scaling", master=f"local[{{cpus}}]", shuffle_partitions=cpus)
edges = events_graph(spark, sf_dir).persist()
e = edges.count()
t0 = time.time()
res = pagerank(edges, max_iters=iters, tol=0.0, mode="join", check_every=5)
res.ranks.count()
wall = time.time() - t0
print(json.dumps({{"cpus": cpus, "edges": e, "iters": iters, "wall": wall,
                  "edges_per_sec": e * iters / wall}}))
"""


def run_once(cpus: int, sf_dir: str, iters: int) -> dict:
    code = WORKER.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", code, str(cpus), sf_dir, str(iters)],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    results = {}
    for cpus in (8, 32):
        run_once(cpus, args.sf_dir, args.iters)  # warmup (JVM+codegen)
        walls, tputs = [], []
        for _ in range(args.runs):
            r = run_once(cpus, args.sf_dir, args.iters)
            walls.append(r["wall"])
            tputs.append(r["edges_per_sec"])
        results[cpus] = {
            "median_wall": statistics.median(walls),
            "median_edges_per_sec": statistics.median(tputs),
            "edges": r["edges"],
            "runs": walls,
        }

    eff = (results[32]["median_edges_per_sec"] / results[8]["median_edges_per_sec"]) / 4
    summary = {
        "edges": results[8]["edges"],
        "iters": args.iters,
        "local8_edges_per_sec": round(results[8]["median_edges_per_sec"], 1),
        "local32_edges_per_sec": round(results[32]["median_edges_per_sec"], 1),
        "scaling_efficiency": round(eff, 3),
        "sf_dir": args.sf_dir,
    }

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            "# BENCH/BASELINE — measured engine numbers\n\n"
            "Protocol (BASELINE.md): identical PageRank workload, identical input, fresh JVM per run,\n"
            f"local[8] vs local[32], shuffle partitions = cores, median of {args.runs} runs after 1 warmup.\n\n"
            f"| metric | local[8] | local[32] |\n|---|---|---|\n"
            f"| wall seconds ({args.iters} iters, E={summary['edges']}) | "
            f"{results[8]['median_wall']:.2f} | {results[32]['median_wall']:.2f} |\n"
            f"| edges/sec | {summary['local8_edges_per_sec']} | {summary['local32_edges_per_sec']} |\n\n"
            f"**Scaling efficiency (T_32/T_8)/4 = {summary['scaling_efficiency']}** (target >= 0.8 per BASELINE.json;\n"
            "note: a single-JVM local-mode substitute — per-core efficiency, not multi-node network scaling).\n\n"
            f"All runs: local8={results[8]['runs']}, local32={results[32]['runs']}\n"
        )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
