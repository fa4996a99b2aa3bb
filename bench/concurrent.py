"""Concurrent-workload benchmark — the reference's multi-instance axis.

The reference benchmarks 4 concurrent accelerator instances sharing one
host (scripts/benchmark/pagerank.cpp:54-70 spawns 4 `pagerank` processes;
scripts/run.py:18-19 drives them). The Spark analogue is M identical
PageRank jobs sharing ONE SparkSession/cluster under the FAIR scheduler:
each job runs in its own scheduler pool from its own driver thread, so
stages interleave instead of queueing FIFO behind each other.

Reported: serial wall (M jobs back-to-back), concurrent wall (M jobs in
M threads/pools), aggregate edges/sec for both, and the concurrency
efficiency `serial_wall / concurrent_wall` (ideal = up to M when the
cluster has idle slack, ~1.0 when a single job already saturates it —
the interesting signal is that it must not drop BELOW ~0.9, i.e. FAIR
interleaving must not cost throughput).

Usage: python bench/concurrent.py [--jobs 4] [--v 400000] [--e 4000000]
                                  [--iters 5] [--cpus 32]
Prints one JSON line; appends a section to BENCH/BASELINE.md with --write.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pagerank_spark.algos.pagerank import pagerank  # noqa: E402
from pagerank_spark.session import get_spark  # noqa: E402
from pagerank_spark.sources.graphs import hub_skew_graph  # noqa: E402


def _run_job(spark, edges, iters: int, pool: str | None, out: dict, key: str) -> None:
    if pool is not None:
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", pool)
    t0 = time.time()
    res = pagerank(edges, max_iters=iters, tol=0.0, mode="join", check_every=2)
    res.ranks.count()
    out[key] = time.time() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--jobs", type=int, default=4)
    ap.add_argument("--v", type=int, default=400_000)
    ap.add_argument("--e", type=int, default=4_000_000)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--write", action="store_true", help="append results to BENCH/BASELINE.md")
    args = ap.parse_args()

    spark = get_spark(
        "concurrent-bench",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
        extra_conf={"spark.scheduler.mode": "FAIR"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # one deterministic graph per job (distinct seeds: no shared cache luck)
    graphs = [
        hub_skew_graph(spark, v=args.v, e=args.e, n_hubs=max(1, args.v // 10000), seed=9 + j).persist()
        for j in range(args.jobs)
    ]
    n_edges = [g.count() for g in graphs]

    # warmup (codegen, JVM) on the first graph
    pagerank(graphs[0], max_iters=2, tol=0.0, check_every=2).ranks.count()

    # serial: M jobs back-to-back on the default FIFO-equivalent single pool
    t0 = time.time()
    walls_serial: dict = {}
    for j, g in enumerate(graphs):
        _run_job(spark, g, args.iters, None, walls_serial, f"job{j}")
    serial_wall = time.time() - t0

    # concurrent: M driver threads, one FAIR pool each
    walls_conc: dict = {}
    threads = [
        threading.Thread(
            target=_run_job, args=(spark, graphs[j], args.iters, f"pool{j}", walls_conc, f"job{j}")
        )
        for j in range(args.jobs)
    ]
    t0 = time.time()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    conc_wall = time.time() - t0

    total_work = sum(n_edges) * args.iters
    out = {
        "jobs": args.jobs,
        "edges_per_job": n_edges[0],
        "iters": args.iters,
        "cpus": args.cpus,
        "serial_wall": round(serial_wall, 2),
        "concurrent_wall": round(conc_wall, 2),
        "serial_agg_edges_per_sec": round(total_work / serial_wall, 1),
        "concurrent_agg_edges_per_sec": round(total_work / conc_wall, 1),
        "concurrency_efficiency": round(serial_wall / conc_wall, 3),
        "per_job_walls_concurrent": {k: round(v, 2) for k, v in sorted(walls_conc.items())},
    }
    if args.write:
        with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
            f.write(
                f"\n## Concurrent-workload axis ({args.jobs} jobs, FAIR pools)\n\n"
                f"The reference's 4-instance benchmark re-expressed: {args.jobs} independent\n"
                f"{n_edges[0]}-edge PageRank jobs on one local[{args.cpus}] session, serial vs\n"
                f"{args.jobs} driver threads in separate FAIR scheduler pools.\n\n"
                f"| | serial | concurrent |\n|---|---|---|\n"
                f"| wall seconds | {out['serial_wall']} | {out['concurrent_wall']} |\n"
                f"| aggregate edges/sec | {out['serial_agg_edges_per_sec']} | {out['concurrent_agg_edges_per_sec']} |\n\n"
                f"**Concurrency efficiency serial/concurrent = {out['concurrency_efficiency']}**"
                f" (>= ~0.9 means FAIR interleaving costs nothing; > 1 means the jobs\n"
                f"recover scheduling slack a single job leaves idle).\n"
            )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
