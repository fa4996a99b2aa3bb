"""Hierarchy (tree) rollup — subtree aggregation over a parent-pointer
table, the BOM-explosion / org-chart / category-tree OLAP primitive.

Given ``nodes(id, parent, value)`` (roots carry ``parent IS NULL`` or
``parent = id``), compute for every node the SUM of ``value`` over its
entire subtree (self included) and the subtree size — the recursive-CTE
workload every warehouse runs on hierarchies, re-expressed as synchronized
bottom-up supersteps so it distributes:

    s_0(v)     = value(v)
    s_{k+1}(v) = value(v) + sum over children c of s_k(c)

After ``depth`` rounds ``s`` is exact: a node at height h stabilizes at
round h (induction — its children stabilized at h-1), so ``max_rounds``
bounds the TREE HEIGHT, not the node count. Each round is ONE
co-partitioned child-sum join + group (the PageRank gather shape on the
child->parent edge layout, reference pagerank.v gather/group-sum core) and
the edge table is shuffled once up front; convergence is detected
in-state (round sums stop changing — for a tree, sum stability at the
root equals global stability since every node's sum is monotone
non-decreasing and bounded).

Values must be exact integers (pre-scale currency to cents) so every
superstep is overflow-checked BIGINT arithmetic and the result is
hash-stable by construction.

Reference parity: none (single-query reference); relational/OLAP mandate
breadth (the iterative sibling of the rollup/cube gates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["tree_rollup"]


def tree_rollup(
    nodes: DataFrame,
    id_col: str = "id",
    parent_col: str = "parent",
    value_col: str = "value",
    max_rounds: int = 40,
    num_partitions: int | None = None,
) -> DataFrame:
    """``(id, subtree_sum, n_desc)`` — exact BIGINT subtree aggregates.

    ``n_desc`` counts the subtree INCLUDING the node itself. ``max_rounds``
    must be at least the tree height; rounds stop early once sums
    stabilize (one lightweight count action per round, the iteration-
    driver contract shared with the rank kernels).
    """
    par = num_partitions or max(
        4, nodes.sparkSession.sparkContext.defaultParallelism
    )
    base = nodes.select(
        F.col(id_col).cast("long").alias("id"),
        F.col(parent_col).cast("long").alias("parent"),
        F.col(value_col).cast("long").alias("value"),
    )
    # child -> parent edge layout, shuffled once, self-parents dropped
    edges = (
        base.filter(
            F.col("parent").isNotNull() & (F.col("parent") != F.col("id"))
        )
        .select(F.col("id").alias("child"), "parent")
        .repartition(par, "child")
        .localCheckpoint()
    )
    state = (
        base.select("id", "value", F.col("value").alias("s"), F.lit(1).cast("long").alias("n"))
        .repartition(par, "id")
        .localCheckpoint()
    )
    for _ in range(int(max_rounds)):
        child_sums = (
            edges.join(
                state.hint("shuffle_hash"), edges.child == state.id, "inner"
            )
            .groupBy("parent")
            .agg(F.sum("s").alias("cs"), F.sum("n").alias("cn"))
        )
        nxt = (
            state.join(
                child_sums.hint("shuffle_hash"),
                state.id == child_sums.parent,
                "left",
            )
            .select(
                "id",
                "value",
                (F.col("value") + F.coalesce(F.col("cs"), F.lit(0))).alias("s"),
                (F.lit(1) + F.coalesce(F.col("cn"), F.lit(0))).cast("long").alias("n"),
            )
            .localCheckpoint()
        )
        changed = (
            nxt.join(state.select("id", F.col("n").alias("pn")), "id")
            .filter(F.col("n") != F.col("pn"))
            .count()
        )
        state = nxt
        if changed == 0:
            break
    return state.select("id", F.col("s").alias("subtree_sum"), F.col("n").alias("n_desc"))
