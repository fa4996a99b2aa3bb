"""Betweenness centrality via Brandes' dependency accumulation, from a
landmark source set, k-hop bounded — the standard scalable estimator (exact
betweenness needs all-sources BFS; landmark subsets with bounded depth are
the production approximation, and the bound makes the computation an exact,
SQL-replayable function of (graph, seeds, k)).

Forward phase (per seed, all seeds batched in one DataFrame keyed by
``seed``): unweighted BFS levels with shortest-path counts

    sigma(s, v) = number of shortest s->v paths,
    accumulated level by level: sigma(v @ level t) = sum of sigma(u @ t-1)
    over in-edges (u, v) — vertices first reached at t (anti-join against
    the already-reached set).

Backward phase: in a BFS DAG every shortest-path edge goes level t -> t+1,
so the dependency

    delta(s, v) = sum over successors w of sigma(v)/sigma(w) * (1 + delta(w))

is computed by one join per level, walking t = depth-1 .. 1. Betweenness of
v is the sum of delta(s, v) over seeds s != v.

Scale shape: edges are shuffled ONCE by src (forward gathers) and once by
dst-as-key for the backward joins; each level is one co-partitioned hash
join + one grouped sum, eager-localCheckpointed (lineage discipline).
Per-level state is (seed, id, sigma|delta) — |seeds| x frontier rows, the
same budget as :func:`pagerank_spark.algos.paths.landmark_distances`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .pagerank import _num_partitions


def betweenness_landmark(
    edges: DataFrame,
    seeds: DataFrame,
    max_depth: int = 6,
    num_partitions: int | None = None,
) -> DataFrame:
    """k-hop-bounded Brandes betweenness from ``seeds`` over the directed
    graph. Returns ``(id, betweenness)`` for every vertex (0.0 where no
    shortest path from the landmark set passes through).

    ``seeds``: one column ``id``. Deterministic — no sampling; callers pick
    the landmark set (e.g. ``id % m == 0``).
    """
    p = num_partitions or _num_partitions(edges)
    e = edges.select("src", "dst").dropDuplicates().repartition(p, "src").localCheckpoint()

    # ---- forward: levels[t] = (seed, id, sigma) first reached at depth t
    lvl0 = (
        seeds.select(F.col("id").alias("seed"), F.col("id").alias("id"), F.lit(1.0).alias("sigma"))
        .repartition(p, "id")
        .localCheckpoint()
    )
    levels = [lvl0]
    reached = lvl0.select("seed", "id").localCheckpoint(eager=False)
    for _t in range(1, max_depth + 1):
        prev = levels[-1]
        cand = (
            e.join(prev.withColumnRenamed("id", "src"), "src")
            .groupBy("seed", F.col("dst").alias("id"))
            .agg(F.sum("sigma").alias("sigma"))
        )
        nxt = (
            cand.join(reached.hint("shuffle_hash"), ["seed", "id"], "left_anti")
            .repartition(p, "id")
            .localCheckpoint()
        )
        if nxt.limit(1).count() == 0:
            break
        levels.append(nxt)
        reached = reached.unionByName(nxt.select("seed", "id")).localCheckpoint(eager=False)

    # ---- backward: delta per level, deepest first (no successors in bound)
    depth = len(levels) - 1
    delta_next = levels[depth].select("seed", "id", F.lit(0.0).alias("delta"))
    acc = [delta_next]
    for t in range(depth - 1, -1, -1):
        w = delta_next.join(
            levels[t + 1].hint("shuffle_hash"), ["seed", "id"], "inner"
        ).select("seed", F.col("id").alias("wid"), "sigma", "delta")
        contrib = (
            e.join(w.hint("shuffle_hash"), e.dst == w.wid, "inner")
            .select("seed", F.col("src").alias("id"), "sigma", "delta")
        )
        u = levels[t].select("seed", "id", F.col("sigma").alias("__su"))
        delta_t = (
            u.join(
                contrib.withColumnRenamed("sigma", "__sw").hint("shuffle_hash"),
                ["seed", "id"],
                "left",
            )
            .groupBy("seed", "id")
            .agg(
                F.coalesce(
                    F.sum((F.col("__su") / F.col("__sw")) * (1.0 + F.col("delta"))), F.lit(0.0)
                ).alias("delta")
            )
            .repartition(p, "id")
            .localCheckpoint()
        )
        acc.append(delta_t)
        delta_next = delta_t

    deltas = acc[0]
    for d in acc[1:]:
        deltas = deltas.unionByName(d)
    verts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .dropDuplicates()
    )
    bc = (
        deltas.filter(F.col("seed") != F.col("id"))
        .groupBy("id")
        .agg(F.sum("delta").alias("betweenness"))
    )
    return verts.join(bc.hint("shuffle_hash"), "id", "left").select(
        "id", F.coalesce("betweenness", F.lit(0.0)).alias("betweenness")
    )


def edge_betweenness_landmark(
    edges: DataFrame,
    seeds: DataFrame,
    max_depth: int = 6,
    num_partitions: int | None = None,
) -> DataFrame:
    """k-hop-bounded Brandes EDGE betweenness from ``seeds``: per seed s,
    every shortest-path-DAG edge (u, v) accumulates
    ``sigma(s,u)/sigma(s,v) * (1 + delta(s,v))`` — the per-edge form of the
    dependency recursion (Brandes 2001 §4; the Girvan-Newman splitting
    signal). Returns ``(src, dst, edge_betweenness)`` for every distinct
    edge (0.0 where no bounded shortest path from the landmark set uses it).

    Same forward phase as :func:`betweenness_landmark`; the backward phase
    materializes the per-level DAG-edge terms BEFORE the vertex grouping,
    so the vertex recursion and the edge credit come out of the same join
    (no second pass over the levels).
    """
    p = num_partitions or _num_partitions(edges)
    e = edges.select("src", "dst").dropDuplicates().repartition(p, "src").localCheckpoint()

    lvl0 = (
        seeds.select(F.col("id").alias("seed"), F.col("id").alias("id"), F.lit(1.0).alias("sigma"))
        .repartition(p, "id")
        .localCheckpoint()
    )
    levels = [lvl0]
    reached = lvl0.select("seed", "id").localCheckpoint(eager=False)
    for _t in range(1, max_depth + 1):
        prev = levels[-1]
        cand = (
            e.join(prev.withColumnRenamed("id", "src"), "src")
            .groupBy("seed", F.col("dst").alias("id"))
            .agg(F.sum("sigma").alias("sigma"))
        )
        nxt = (
            cand.join(reached.hint("shuffle_hash"), ["seed", "id"], "left_anti")
            .repartition(p, "id")
            .localCheckpoint()
        )
        if nxt.limit(1).count() == 0:
            break
        levels.append(nxt)
        reached = reached.unionByName(nxt.select("seed", "id")).localCheckpoint(eager=False)

    depth = len(levels) - 1
    delta_next = levels[depth].select("seed", "id", F.lit(0.0).alias("delta"))
    edge_parts = []
    for t in range(depth - 1, -1, -1):
        w = delta_next.join(
            levels[t + 1].hint("shuffle_hash"), ["seed", "id"], "inner"
        ).select("seed", F.col("id").alias("__wid"), F.col("sigma").alias("__sw"), "delta")
        cand = e.join(w.hint("shuffle_hash"), e.dst == w.__wid, "inner").select(
            "seed", "src", "dst", "__sw", "delta"
        )
        terms = (
            levels[t]
            .select("seed", F.col("id").alias("src"), F.col("sigma").alias("__su"))
            .join(cand.hint("shuffle_hash"), ["seed", "src"], "inner")
            .select(
                "seed",
                "src",
                "dst",
                ((F.col("__su") / F.col("__sw")) * (1.0 + F.col("delta"))).alias("term"),
            )
            .localCheckpoint()
        )
        edge_parts.append(terms)
        delta_next = (
            levels[t]
            .select("seed", "id")
            .join(
                terms.groupBy("seed", F.col("src").alias("id")).agg(F.sum("term").alias("delta")),
                ["seed", "id"],
                "left",
            )
            .select("seed", "id", F.coalesce("delta", F.lit(0.0)).alias("delta"))
            .repartition(p, "id")
            .localCheckpoint()
        )

    if edge_parts:
        allt = edge_parts[0]
        for part in edge_parts[1:]:
            allt = allt.unionByName(part)
        eb = allt.groupBy("src", "dst").agg(F.sum("term").alias("edge_betweenness"))
    else:
        eb = e.select("src", "dst", F.lit(0.0).alias("edge_betweenness")).limit(0)
    return e.join(eb.hint("shuffle_hash"), ["src", "dst"], "left").select(
        "src", "dst", F.coalesce("edge_betweenness", F.lit(0.0)).alias("edge_betweenness")
    )
