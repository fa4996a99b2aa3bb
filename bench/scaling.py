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
from pagerank_spark.sources.graphs import events_graph, hub_skew_graph
from pagerank_spark.algos.pagerank import pagerank

cpus = int(sys.argv[1]); graph = sys.argv[2]; iters = int(sys.argv[3])
spark = get_spark("scaling", master=f"local[{{cpus}}]", shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
if graph.startswith("synth"):
    # deterministic synthetic hub-skew digraph — identical on any cluster size
    v, e_target = (int(x) for x in graph.split(":")[1].split(","))
    edges = hub_skew_graph(spark, v=v, e=e_target, n_hubs=max(1, v // 10000), seed=9).persist()
else:
    edges = events_graph(spark, graph).persist()
e = edges.count()
t0 = time.time()
res = pagerank(edges, max_iters=iters, tol=0.0, mode="join", check_every=2)
res.ranks.count()
wall = time.time() - t0
# steady-state throughput: superstep loop only (setup — degree build, the
# one-time edge shuffle, initial state — is a fixed cost amortized over any
# real run's iteration count and reported separately)
build = sum(m.get("build_seconds", 0.0) for m in res.metrics)
action = sum(m.get("action_seconds", 0.0) for m in res.metrics)
print(json.dumps({{"cpus": cpus, "edges": e, "iters": iters, "wall": wall,
                  "setup": res.setup_seconds, "iter_wall": res.iter_seconds,
                  "driver_build": build, "exec_action": action,
                  "edges_per_sec": e * iters / res.iter_seconds}}))
"""


def run_once(cpus: int, graph: str, iters: int) -> dict:
    code = WORKER.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", code, str(cpus), graph, str(iters)],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--graph",
        # 40M edges: large enough that 32 cores have real work per partition
        # (measured eff 0.53 vs 0.46 at 20M — fixed per-block cost amortizes)
        default="synth:4000000,40000000",
        help="'synth:V,E' for the deterministic generator, or a testdata sf dir for the events graph",
    )
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    results = {}
    for cpus in (8, 32):
        run_once(cpus, args.graph, args.iters)  # warmup (JVM+codegen)
        walls, tputs = [], []
        for _ in range(args.runs):
            r = run_once(cpus, args.graph, args.iters)
            walls.append(r["wall"])
            tputs.append(r["edges_per_sec"])
        results[cpus] = {
            "median_wall": statistics.median(walls),
            "median_edges_per_sec": statistics.median(tputs),
            "edges": r["edges"],
            "setup": r["setup"],
            "driver_build": r.get("driver_build", 0.0),
            "exec_action": r.get("exec_action", 0.0),
            "runs": walls,
        }

    eff = (results[32]["median_edges_per_sec"] / results[8]["median_edges_per_sec"]) / 4
    summary = {
        "edges": results[8]["edges"],
        "iters": args.iters,
        "local8_edges_per_sec": round(results[8]["median_edges_per_sec"], 1),
        "local32_edges_per_sec": round(results[32]["median_edges_per_sec"], 1),
        "scaling_efficiency": round(eff, 3),
        "graph": args.graph,
    }

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    # preserve the hand-written adjudication sections below the measured
    # table: everything from the first "## " heading onward survives a rerun
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    tail = ""
    if os.path.exists(path):
        old = open(path).read()
        idx = old.find("\n## ")
        if idx >= 0:
            tail = old[idx:]
    with open(path, "w") as f:
        f.write(
            "# BENCH/BASELINE — measured engine numbers\n\n"
            "Protocol (BASELINE.md): identical PageRank workload, identical deterministic input\n"
            f"(`{args.graph}`), fresh JVM per run, local[8] vs local[32], shuffle partitions =\n"
            f"cores, median of {args.runs} runs after 1 warmup. Throughput is steady-state\n"
            "(superstep loop only); setup (degree build + one-time edge shuffle + init state)\n"
            "is a fixed cost reported separately.\n\n"
            f"| metric | local[8] | local[32] |\n|---|---|---|\n"
            f"| total wall seconds ({args.iters} iters, E={summary['edges']}) | "
            f"{results[8]['median_wall']:.2f} | {results[32]['median_wall']:.2f} |\n"
            f"| setup seconds (one-time) | {results[8]['setup']:.2f} | {results[32]['setup']:.2f} |\n"
            f"| plan-resolution seconds in loop (AQE executes map stages here; last run) | {results[8]['driver_build']:.2f} | {results[32]['driver_build']:.2f} |\n"
            f"| final L1/materialize action seconds in loop (last run) | {results[8]['exec_action']:.2f} | {results[32]['exec_action']:.2f} |\n"
            f"| steady-state edges/sec | {summary['local8_edges_per_sec']} | {summary['local32_edges_per_sec']} |\n\n"
            f"**Scaling efficiency (T_4N/T_N)/4 = {summary['scaling_efficiency']}** (target >= 0.8 per BASELINE.json).\n"
            "Context: a pure-CPU control experiment measures this VM's own ceiling at ~0.77\n"
            "per-core efficiency under 32-way load — see SCALING_NOTES.md in this directory\n"
            "for the control data, the stage-level profile, and every tuning variant measured.\n\n"
            f"All total-wall runs: local8={results[8]['runs']}, local32={results[32]['runs']}\n"
            + tail
        )
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
