"""Batched multi-seed personalized PageRank.

Computes PPR for MANY seeds in one pass by keying the iteration state with
the seed: ``state = (seed, id, rank)``, one row per (seed, vertex-reached).
This is the batch pattern that matters at scale — a recommender or
similar-node service needs PPR vectors for thousands of query vertices, and
running :func:`..algos.pagerank.pagerank` per seed pays the full edge scan
per seed; here ALL seeds share each superstep's single gather join, and the
state stays SPARSE (mass only exists where it has actually propagated, so
iteration t holds at most sum over seeds of |t-hop neighborhood| rows, not
seeds x V).

Recurrence per seed s (same as pagerank.py's personalized mode with
teleport set {s}; matching to allclose is tested):

    r_0 = e_s
    r_{t+1}(v) = (1-d) e_s(v) + d * gather(r_t)(v) + d * dang(r_t) e_s(v)

Per superstep: one co-partitioned gather join + grouped sum keyed
(seed, dst); the dangling mass is a per-seed aggregate (n_seeds rows —
tiny relation joined back onto the seed base rows, not a broadcast scalar
per seed); base rows ride the SAME grouped sum via a union, so the
superstep is two shuffles total regardless of seed count.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .pagerank import _num_partitions


@dataclass
class MultiPPRResult:
    ranks: DataFrame          # (seed, id, rank) sparse — absent rows are 0
    iterations: int


def multi_ppr(
    edges: DataFrame,
    seeds: DataFrame,
    damping: float = 0.85,
    iters: int = 5,
    num_partitions: int | None = None,
) -> MultiPPRResult:
    """Run ``iters`` synchronized PPR supersteps for every seed in
    ``seeds`` (an ``(id)`` or ``(seed)`` single-column DataFrame; ids
    absent from the graph raise, mirroring pagerank's personalized
    contract)."""
    p = num_partitions or max(4, _num_partitions(edges))
    d = float(damping)

    e = edges.select("src", "dst").repartition(p, "src").localCheckpoint()
    deg = e.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("outdeg"))
    ec = (
        e.join(deg, e.src == deg.id)
        .select("src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("coef"))
        .repartition(p, "src")
        .localCheckpoint()
    )
    vertices = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .dropDuplicates()
    )
    sd = (
        seeds.selectExpr(f"{seeds.columns[0]} as seed")
        .dropDuplicates()
        .localCheckpoint()
    )
    n_seeds = sd.count()
    n_known = sd.join(vertices, sd.seed == vertices.id, "left_semi").count()
    if n_known != n_seeds:
        raise ValueError(f"{n_seeds - n_known} seed(s) are not graph vertices")
    # dangling vertices: appear as dst but never as src
    dangl = (
        vertices.join(deg.hint("shuffle_hash"), "id", "left_anti")
        .repartition(p, "id")
        .localCheckpoint()
    )

    state = sd.select("seed", F.col("seed").alias("id"), F.lit(1.0).alias("rank")).localCheckpoint()
    t0 = time.monotonic()
    for _ in range(iters):
        contrib = (
            ec.join(state.hint("shuffle_hash"), ec.src == state.id)
            .select("seed", F.col("dst").alias("id"), (F.lit(d) * F.col("rank") * F.col("coef")).alias("val"))
        )
        dm = (
            state.join(dangl.hint("shuffle_hash"), "id", "left_semi")
            .groupBy("seed")
            .agg(F.sum("rank").alias("__dm"))
        )
        base = sd.join(dm, "seed", "left").select(
            "seed",
            F.col("seed").alias("id"),
            (F.lit(1.0 - d) + F.lit(d) * F.coalesce(F.col("__dm"), F.lit(0.0))).alias("val"),
        )
        state = (
            contrib.unionByName(base)
            .groupBy("seed", "id")
            .agg(F.sum("val").alias("rank"))
            .localCheckpoint(eager=False)
        )
        state.count()
    return MultiPPRResult(ranks=state.select("seed", "id", "rank"), iterations=iters)
