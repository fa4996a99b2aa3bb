"""Minimum spanning forest — distributed Borůvka over DataFrame supersteps.

The classic parallel MST algorithm (Borůvka 1926; the GraphX/Pregel MSF
shape): every component picks its lightest outgoing edge under one GLOBAL
total edge order, the picked edges join the forest, touched components
contract, repeat. Components at least halve per round, so the outer loop is
O(log V) rounds on any graph.

Determinism without distinct weights: edges are totally ordered by
``(weight, a, b)`` with ``a < b`` the normalized endpoints. Under a total
order the lightest-outgoing-edge rule cannot close a cycle (the standard
Borůvka argument: the heaviest edge of any would-be cycle is nobody's
minimum), and the resulting forest is THE minimum spanning forest of that
order — identical to Kruskal's output with the same tie-break, which is what
the pure-Python oracle test replays.

Scale shape per round: one join of the edge table against the component
labels per endpoint (both co-partitioned equi-joins), one map-side-combined
``min_by`` per component, and a contraction. Contraction reuses
:func:`~pagerank_spark.algos.components.connected_components` on the
SELECTION graph only — at most one edge per component, so the CC input is
components-sized, not edge-sized, and its pointer-jumping converges in
O(log) supersteps. The surviving cross-component edge set shrinks
monotonically and is re-checkpointed each round (lineage discipline,
SURVEY.md §7).

Reference parity: the reference engine is PageRank-only (SURVEY §2); MSF is
link-graph mandate breadth (same §2b family as connected components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .components import connected_components
from .pagerank import _num_partitions

__all__ = ["minimum_spanning_forest"]


def minimum_spanning_forest(
    edges: DataFrame,
    weight_col: str = "weight",
    num_partitions: int | None = None,
    max_rounds: int = 30,
) -> DataFrame:
    """``(a, b, weight)`` — the minimum spanning forest of the undirected
    graph (parallel edges collapse to their min weight; self-loops dropped).

    ``max_rounds`` is a safety bound; components halve per round, so 30
    covers any graph below 2^30 vertices.
    """
    p = num_partitions or _num_partitions(edges)
    e = (
        edges.select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
            F.col(weight_col).cast("long").alias("w"),
        )
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(F.min("w").alias("w"))
        .repartition(p, "a")
        .localCheckpoint()
    )
    comp = (
        e.select(F.col("a").alias("id"))
        .union(e.select("b"))
        .dropDuplicates()
        .select("id", F.col("id").alias("comp"))
        .repartition(p, "id")
        .localCheckpoint()
    )
    forest = None
    for _ in range(max_rounds):
        ca = comp.select(F.col("id").alias("a"), F.col("comp").alias("__ca"))
        cb = comp.select(F.col("id").alias("b"), F.col("comp").alias("__cb"))
        cross = (
            e.join(ca, "a")
            .join(cb, "b")
            .filter(F.col("__ca") != F.col("__cb"))
            .localCheckpoint()
        )
        if cross.isEmpty():
            break
        e = cross.select("a", "b", "w")  # intra-component edges never return
        # each component's lightest outgoing edge under the (w, a, b) order
        cand = cross.select(
            F.col("__ca").alias("c"), F.col("__cb").alias("oc"), "a", "b", "w"
        ).unionByName(
            cross.select(
                F.col("__cb").alias("c"), F.col("__ca").alias("oc"), "a", "b", "w"
            )
        )
        sel = (
            cand.groupBy("c")
            .agg(
                F.min_by(
                    F.struct("a", "b", "w", "oc"), F.struct("w", "a", "b")
                ).alias("m")
            )
            .select("c", "m.a", "m.b", "m.w", "m.oc")
            .localCheckpoint()
        )
        picked = sel.select("a", "b", "w").dropDuplicates(["a", "b"])
        forest = picked if forest is None else forest.unionByName(picked).localCheckpoint()
        # contract: CC over the (component -> component) selection graph
        cgraph = sel.select(F.col("c").alias("src"), F.col("oc").alias("dst"))
        cc = connected_components(cgraph, num_partitions=p)
        relabel = cc.select(F.col("id").alias("comp"), F.col("component").alias("__nc"))
        comp = (
            comp.join(relabel, "comp", "left")
            .select("id", F.coalesce("__nc", "comp").alias("comp"))
            .repartition(p, "id")
            .localCheckpoint()
        )
    if forest is None:
        return e.select("a", "b", F.col("w").alias("weight")).limit(0)
    return forest.select("a", "b", F.col("w").alias("weight"))
