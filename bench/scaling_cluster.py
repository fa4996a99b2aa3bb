"""Multi-JVM scaling experiment: local-cluster[N,c,m] vs local[N*c].

Round-4 left one BASELINE.json target unmet: PageRank throughput scaling
efficiency >= 0.8 from N to 4N executors (measured 0.51 at local[8] ->
local[32], with every in-JVM lever exhausted — SCALING_NOTES §9/§11). The
residual diagnosis was "single-JVM shared-heap GC + memory bandwidth".
This harness tests the shared-heap HALF of that claim directly on this
box: ``local-cluster[K,c,m]`` runs K real, separate executor JVMs (own
heaps, own GC, real shuffle transport between them) — the closest
available stand-in for K executors of a real cluster.

Protocol is IDENTICAL to bench/scaling.py (same deterministic hub-skew
graph, fresh JVM(s) per run, shuffle partitions = total cores, median of
--runs after one warmup); only the master string varies:

* ``local[8]``  vs ``local[32]``                — shared heap (the r1-r4 series)
* ``local-cluster[1,8,m]`` vs ``local-cluster[4,8,m]`` — N vs 4N separate
  executor JVMs, c=8 cores each (the north_rule's literal shape)

Interpretation: if the separate-JVM pair scales materially better than
the shared-heap pair on the same silicon, the 0.51 is a single-JVM
artifact and the ~0.77 pure-CPU VM ceiling (SCALING_NOTES §1) bounds what
any measurement on this box can show; if it scales the same or worse,
the shared-heap hypothesis is refuted and the bottleneck is elsewhere
(memory bandwidth / CPU contention), which the control experiment
already estimates.

Usage: python bench/scaling_cluster.py [--graph synth:V,E] [--iters 10]
       [--runs 3] [--mem-mb 8192]
Prints one JSON line; appends a dated section to BENCH/SCALING_NOTES.md
with --write-notes.
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
from pagerank_spark.sources.graphs import events_graph, hub_skew_graph
from pagerank_spark.algos.pagerank import pagerank

master = sys.argv[1]; cores = int(sys.argv[2]); graph = sys.argv[3]
iters = int(sys.argv[4]); mem_mb = int(sys.argv[5])
extra = {{}}
if master.startswith("local-cluster"):
    # executor memory must fit inside the per-worker budget; leave the
    # Python workers headroom. Serializing a zipped repo is unnecessary —
    # local-cluster executors share this filesystem, so sys.path suffices.
    extra["spark.executor.memory"] = f"{{max(1024, mem_mb - 1024)}}m"
    extra["spark.executorEnv.PYTHONPATH"] = {repo!r}
spark = get_spark("scaling-mjvm", master=master, shuffle_partitions=cores,
                  extra_conf=extra)
spark.sparkContext.setLogLevel("ERROR")
if graph.startswith("synth"):
    v, e_target = (int(x) for x in graph.split(":")[1].split(","))
    edges = hub_skew_graph(spark, v=v, e=e_target, n_hubs=max(1, v // 10000), seed=9).persist()
else:
    edges = events_graph(spark, graph).persist()
e = edges.count()
t0 = time.time()
res = pagerank(edges, max_iters=iters, tol=0.0, mode="join", check_every=2)
res.ranks.count()
wall = time.time() - t0
build = sum(m.get("build_seconds", 0.0) for m in res.metrics)
action = sum(m.get("action_seconds", 0.0) for m in res.metrics)
print(json.dumps({{"master": master, "cores": cores, "edges": e, "iters": iters,
                  "wall": wall, "setup": res.setup_seconds,
                  "iter_wall": res.iter_seconds, "driver_build": build,
                  "exec_action": action,
                  "edges_per_sec": e * iters / res.iter_seconds}}))
"""


def run_once(master: str, cores: int, graph: str, iters: int, mem_mb: int) -> dict:
    code = WORKER.format(repo=REPO)
    out = subprocess.run(
        [sys.executable, "-c", code, master, str(cores), graph, str(iters), str(mem_mb)],
        capture_output=True, text=True, check=True,
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def median_of(master: str, cores: int, graph: str, iters: int, runs: int, mem_mb: int) -> dict:
    run_once(master, cores, graph, iters, mem_mb)  # warmup JVM(s) + codegen
    walls, tputs = [], []
    last = None
    for _ in range(runs):
        last = run_once(master, cores, graph, iters, mem_mb)
        walls.append(last["wall"])
        tputs.append(last["edges_per_sec"])
    return {
        "median_wall": statistics.median(walls),
        "median_edges_per_sec": statistics.median(tputs),
        "edges": last["edges"],
        "setup": last["setup"],
        "runs": [round(w, 2) for w in walls],
        "tputs": [round(t) for t in tputs],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--graph", default="synth:4000000,40000000")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--mem-mb", type=int, default=8192)
    ap.add_argument("--write-notes", action="store_true")
    ap.add_argument("--skip-local", action="store_true",
                    help="only run the local-cluster pair")
    args = ap.parse_args()

    m = args.mem_mb
    pairs = [] if args.skip_local else [("local[8]", 8), ("local[32]", 32)]
    pairs += [(f"local-cluster[1,8,{m}]", 8), (f"local-cluster[4,8,{m}]", 32)]

    results = {}
    for master, cores in pairs:
        results[master] = median_of(master, cores, args.graph, args.iters, args.runs, m)
        print(json.dumps({master: results[master]}), file=sys.stderr)

    def eff(lo: str, hi: str) -> float | None:
        if lo in results and hi in results:
            return round(
                results[hi]["median_edges_per_sec"]
                / results[lo]["median_edges_per_sec"] / 4, 3)
        return None

    summary = {
        "graph": args.graph,
        "iters": args.iters,
        "tput": {k: round(v["median_edges_per_sec"], 1) for k, v in results.items()},
        "eff_shared_heap": eff("local[8]", "local[32]"),
        "eff_separate_jvms": eff(f"local-cluster[1,8,{m}]", f"local-cluster[4,8,{m}]"),
    }
    print(json.dumps(summary))

    if args.write_notes:
        lines = [
            "\n## §14 local-cluster experiment: shared-heap vs separate executor JVMs\n\n",
            f"Protocol: identical to §1 ({args.graph}, {args.iters} iters, median of "
            f"{args.runs} after 1 warmup, fresh JVM(s) per run); local-cluster workers "
            f"get {m} MB each, executor memory {max(1024, m - 1024)} MB.\n\n",
            "| master | cores | steady edges/sec | walls |\n|---|---|---|---|\n",
        ]
        for master, cores in pairs:
            r = results[master]
            lines.append(
                f"| `{master}` | {cores} | {r['median_edges_per_sec']:.0f} | {r['runs']} |\n"
            )
        lines.append(
            f"\nEfficiency (T_4N/T_N)/4: shared heap = **{summary['eff_shared_heap']}**, "
            f"separate JVMs (1x8 -> 4x8) = **{summary['eff_separate_jvms']}**.\n"
        )
        with open(os.path.join(REPO, "BENCH", "SCALING_NOTES.md"), "a") as f:
            f.writelines(lines)


if __name__ == "__main__":
    main()
