"""Truncated SimRank: structural vertex similarity by in-neighbor recursion.

Jeh & Widom 2002 ("SimRank: A Measure of Structural-Context Similarity" —
public methodology): two vertices are similar when their in-neighbors are
similar, ``s(a,b) = C / (|I(a)||I(b)|) * Σ_{i∈I(a), j∈I(b)} s(i,j)`` with
``s(a,a) = 1`` and decay ``C < 1``. The reference accelerator
(estherlyoon/pagerank) hard-wires only rank propagation; SimRank extends the
engine's link-analysis family (PageRank/HITS/Katz/linkpred) with the classic
pair-recursive similarity.

Execution model (Spark-first, not the naive O(V²) matrix):

* State is the SPARSE pair table ``(a, b, s)`` — only pairs with nonzero
  similarity exist, exactly like :mod:`.ppr`'s seed-keyed sparse state. On
  iteration k the support is contained in {pairs reachable by equal-length
  reverse walks ≤ k}, which on sparse graphs is far below V².
* A superstep is two hash joins against the out-edge table (expand (i,j) to
  every (a,b) with i→a, j→b) and one map-side-combined grouped sum — the
  same gather/sum shape as one PageRank superstep, run on pairs instead of
  vertices. Per-superstep ``localCheckpoint`` truncates lineage (repo-wide
  iterative discipline).
* Hub hazard, named: a pair (i,j) emits outdeg(i)·outdeg(j) contribution
  rows, so two co-cited hubs explode quadratically — ``max_out_degree``
  removes the out-edges of vertices above the cap BEFORE the joins, i.e.
  computes exact truncated SimRank on the hub-capped subgraph (the same
  pre-join cap discipline as ``graphstats.bipartite_project``; capped
  vertices keep their in-edges and still receive similarity).
  ``None`` = exact truncated SimRank on the full graph.

Determinism: pure DataFrame arithmetic, no RNG; with ``c`` an exact binary
fraction (default 3/4) every contribution is a ratio of exact integers
scaled by powers of two, and the only cross-engine wobble is the 1-ulp
reduction-order class shared by every floating aggregate gate in the repo.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["simrank"]


def simrank(
    edges: DataFrame,
    iters: int = 3,
    c: float = 0.75,
    max_out_degree: int | None = None,
) -> DataFrame:
    """Truncated SimRank scores after ``iters`` in-neighbor recursions.

    ``edges`` is a directed ``(src, dst)`` table (duplicates collapse).
    Returns the sparse symmetric pair table ``(a, b, s)`` for a < b with
    s > 0 — the diagonal (s = 1 by definition) and zero pairs are omitted.
    """
    if not 0.0 < c < 1.0:
        raise ValueError(f"decay c must be in (0, 1), got {c}")
    if iters < 1:
        raise ValueError(f"iters must be >= 1, got {iters}")

    e = edges.select("src", "dst").dropDuplicates().localCheckpoint(eager=False)
    if max_out_degree is not None:
        keep = (
            e.groupBy("src")
            .agg(F.count(F.lit(1)).alias("od"))
            .filter(F.col("od") <= max_out_degree)
            .select("src")
        )
        e = e.join(keep, "src", "left_semi")
    indeg = e.groupBy(F.col("dst").alias("v")).agg(F.count(F.lit(1)).alias("ind"))

    # state: off-diagonal pairs only; the diagonal is implicit (s = 1) and
    # re-injected into every expansion below. Only vertices with out-edges
    # can be expansion sources, so the diagonal support is the src set.
    state = None  # iteration 0: S = I, no off-diagonal mass
    diag = (
        e.select(F.col("src").alias("i"))
        .dropDuplicates()
        .withColumn("j", F.col("i"))
        .withColumn("s", F.lit(1.0))
    )

    ea = e.select(F.col("src").alias("i"), F.col("dst").alias("a"))
    eb = e.select(F.col("src").alias("j"), F.col("dst").alias("b"))

    for _ in range(iters):
        support = diag if state is None else state.unionByName(diag)
        contrib = (
            support.join(ea, "i")
            .join(eb, "j")
            .filter(F.col("a") != F.col("b"))
            .groupBy("a", "b")
            .agg(F.sum("s").alias("raw"))
        )
        state = (
            contrib.join(indeg.withColumnRenamed("v", "a").withColumnRenamed("ind", "da"), "a")
            .join(indeg.withColumnRenamed("v", "b").withColumnRenamed("ind", "db"), "b")
            .select(
                F.col("a").alias("i"),
                F.col("b").alias("j"),
                (F.lit(c) * F.col("raw") / (F.col("da") * F.col("db"))).alias("s"),
            )
            .localCheckpoint()
        )

    return state.filter(F.col("i") < F.col("j")).select(
        F.col("i").alias("a"), F.col("j").alias("b"), "s"
    )
