"""Triangle counting via degree-ordered edge orientation + pair intersection.

Standard scalable recipe (north_star): symmetrize/dedup to undirected edges,
orient every edge from the lower-(degree, id) endpoint to the higher one —
each triangle then appears exactly once as a directed wedge a->b, a->c with
b->c, and the out-degree of any vertex in the oriented graph is O(sqrt(E)),
which bounds the wedge-join's intermediate size (this orientation is the
whole scaling trick; without it a hub vertex of degree D generates D^2
wedges).

Two physical strategies with identical results:
- :func:`triangle_count` — pure Catalyst: two self-joins (wedge build +
  wedge close). AQE handles skew splitting.
- :func:`triangle_count_csr` — per-src sorted-neighbor intersection inside
  ``applyInPandas`` (NumPy set intersection per wedge batch), the reference
  SURVEY.md §2b shape; cuts the wedge materialization.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .pagerank import _num_partitions


def _oriented(edges: DataFrame) -> DataFrame:
    """Undirected dedup + degree orientation.

    Returns ``(u, v, ku, kv)`` with ku < kv where k = struct(deg, id) — the
    total order used for orientation. The order keys are carried so the
    wedge join can deduplicate pairs in the SAME order (filtering wedges by
    raw id order while orienting by degree order silently drops the
    triangles where the two orders disagree).
    """
    und = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .unionByName(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("deg_b"))
    j = und.join(da, "a").join(db, "b")
    ka = F.struct(F.col("deg_a").alias("d"), F.col("a").alias("i"))
    kb = F.struct(F.col("deg_b").alias("d"), F.col("b").alias("i"))
    lower_first = ka < kb
    return j.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
        F.when(lower_first, ka).otherwise(kb).alias("ku"),
        F.when(lower_first, kb).otherwise(ka).alias("kv"),
    )


def _triangle_rows(o: DataFrame) -> DataFrame:
    """Rows (a, b, c): one per triangle, wedge-pivoted at the orientation-
    minimal vertex; wedge pairs ordered by the orientation key."""
    e1 = o.select(F.col("u").alias("a"), F.col("v").alias("b"), F.col("kv").alias("key_b"))
    e2 = o.select(F.col("u").alias("a"), F.col("v").alias("c"), F.col("kv").alias("key_c"))
    wedges = e1.join(e2, "a").filter(F.col("key_b") < F.col("key_c"))
    closer = o.select(F.col("u").alias("b"), F.col("v").alias("c"))
    return wedges.join(closer, ["b", "c"], "inner").select("a", "b", "c")


def triangle_count(edges: DataFrame) -> int:
    """Total triangle count (Catalyst joins)."""
    o = _oriented(edges).persist()
    n = _triangle_rows(o).count()
    o.unpersist()
    return n


def triangles_per_vertex(edges: DataFrame) -> DataFrame:
    """``(id, triangles)`` — number of triangles each vertex participates in.

    Two recompute traps avoided:

    - The oriented edge set is referenced three times by the wedge join
      (e1, e2, closer), and the returned DataFrame is evaluated by the
      CALLER — so the orientation subtree (2 joins + degree agg) is
      materialized here with an eager ``localCheckpoint`` and every
      downstream reference reads the RDD leaf. (A persist/unpersist pair
      around a lazily-returned frame would recompute the subtree 3x: the
      unpersist fires before the caller's action.)
    - Per-corner attribution uses ``explode(array(a, b, c))``, not a 3-way
      union of projections — a union references the triangle-rows subtree
      three times and re-runs BOTH wedge joins per branch.
    """
    o = _oriented(edges).localCheckpoint()
    return (
        _triangle_rows(o)
        .select(F.explode(F.array("a", "b", "c")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )


def triangle_count_csr(edges: DataFrame) -> int:
    """Triangle count via per-partition sorted-neighbor intersection.

    Oriented adjacency lists are grouped per src; for each oriented edge
    (u, v) the kernel intersects adj[u] with adj[v] using NumPy
    ``intersect1d`` over sorted arrays. The adjacency map is shipped per
    hash bucket of u with the closing edges co-grouped on the same bucket.
    """
    o = _oriented(edges)
    p = _num_partitions(edges)
    # adjacency rows grouped by bucket of the wedge pivot u
    adj = o.groupBy("u").agg(F.sort_array(F.collect_list("v")).alias("nbrs"))
    adj = adj.withColumn("bucket", F.pmod(F.xxhash64("u"), F.lit(p)).cast("int"))
    # closing edges must be visible to every bucket that may probe them ->
    # instead intersect adj[u] (pivot) with adj[b]: triangle (u,b,c) needs
    # c in adj[u] ∩ adj[b]. Join adj to itself along oriented edges (u->b).
    eb = o.select("u", F.col("v").alias("b"))
    pair = (
        eb.join(adj.select(F.col("u"), F.col("nbrs").alias("nbrs_u")), "u")
        .join(adj.select(F.col("u").alias("b"), F.col("nbrs").alias("nbrs_b")), "b")
    )

    def intersect(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0:
            return pd.DataFrame({"n": np.array([], dtype=np.int64)})
        counts = [
            np.intersect1d(np.asarray(x, dtype=np.int64), np.asarray(y, dtype=np.int64), assume_unique=True).size
            for x, y in zip(batch["nbrs_u"], batch["nbrs_b"])
        ]
        return pd.DataFrame({"n": np.asarray(counts, dtype=np.int64)})

    counted = pair.select("nbrs_u", "nbrs_b").mapInPandas(
        lambda it: (intersect(b) for b in it), schema="n long"
    )
    row = counted.agg(F.sum("n").alias("total")).first()
    return int(row["total"] or 0)


def clustering_coefficients(edges: DataFrame) -> DataFrame:
    """Local clustering coefficients over the undirected simple graph.

    Returns ``(id, triangles, deg, coef)`` for every vertex of the
    symmetrized, deduplicated, loop-free graph, where
    ``coef = 2 * T(v) / (deg(v) * (deg(v) - 1))`` and vertices of degree < 2
    get ``coef = 0.0`` (they close no wedge).

    Plan shape: ONE orientation pass (the degree-orientation subtree is
    materialized with an eager ``localCheckpoint`` — it is referenced three
    times by the wedge join and twice more for degree recovery), one wedge
    join, one explode/count. Degrees are recovered from the orientation
    keys (``ku.d`` / ``kv.d``) that :func:`_oriented` already carries — no
    second degree aggregation over the edge set.
    """
    o = _oriented(edges).localCheckpoint()
    tri = (
        _triangle_rows(o)
        .select(F.explode(F.array("a", "b", "c")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    degs = (
        o.select(F.col("u").alias("id"), F.col("ku.d").alias("deg"))
        .unionByName(o.select(F.col("v").alias("id"), F.col("kv.d").alias("deg")))
        .dropDuplicates(["id"])
    )
    t = F.coalesce(F.col("triangles"), F.lit(0))
    return degs.join(tri.hint("shuffle_hash"), "id", "left").select(
        "id",
        t.alias("triangles"),
        "deg",
        F.when(
            F.col("deg") >= 2,
            2.0 * t / (F.col("deg").cast("double") * (F.col("deg") - 1)),
        )
        .otherwise(F.lit(0.0))
        .alias("coef"),
    )


def approx_triangle_count(edges: DataFrame, pct: int = 50, salt: int = 0) -> tuple[int, float]:
    """Sampled triangle estimate in the DOULION family (Tsourakakis et al.,
    KDD'09 — public methodology; vertex-induced variant): count triangles
    on the deterministic ``pct``% vertex-induced subgraph
    (operators/graphstats.py::sample_subgraph) and scale by (100/pct)^3 —
    a triangle survives iff all 3 vertices are kept, so the estimator is
    unbiased under the hash-uniformity assumption. Returns
    ``(sampled_triangles, estimate)``.

    At 100-TB scale this runs the full triangle machinery on a q^2 fraction
    of the edges (q = pct/100) — an 8x-64x edge reduction for q = 1/2..1/4
    — and, being hash-deterministic, the estimate is reproducible and
    SQL-replayable (no RNG)."""
    from ..operators.graphstats import sample_subgraph

    n = triangle_count(sample_subgraph(edges, pct, salt))
    return n, n * (100.0 / pct) ** 3


def square_count(edges: DataFrame, max_degree: int | None = None) -> DataFrame:
    """Global 4-cycle (square) count of the undirected simple graph.

    Identity: every square has exactly two diagonals, and a vertex pair
    {u, w} with c common neighbors closes C(c, 2) squares through its
    diagonal — so ``squares = (1/2) * sum over pairs C(common, 2)``.
    The common-neighbor pair table IS the one-mode projection of the
    (center, neighbor) incidence, so this reuses
    ``graphstats.bipartite_project`` — including its pre-join hub cap
    (``max_degree`` here): a degree-d hub contributes d^2/2 wedge rows,
    the one quadratic hazard at scale. With a cap the result is a
    documented lower bound (capped vertices' wedges are dropped, count
    what survives); ``None`` is exact.

    Returns one row ``(n_pairs, squares)`` — connected-pair count and the
    square total, both exact BIGINTs.
    """
    from ..operators.graphstats import bipartite_project

    und = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
    )
    incidence = und.select(F.col("a").alias("c"), F.col("b").alias("n")).unionByName(
        und.select(F.col("b").alias("c"), F.col("a").alias("n"))
    )
    pairs = bipartite_project(incidence, "c", "n", max_group_size=max_degree)
    # sum(c*(c-1)) = 2 * sum C(c,2) and every square adds 2 to sum C(c,2),
    # so the total is always divisible by 4; integer `div` keeps it exact
    # where a double division would round above 2^53
    return pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.expr("sum(weight * (weight - 1)) div 4").alias("squares"),
    )


def four_cliques_per_vertex(edges: DataFrame) -> DataFrame:
    """``(id, cliques4)`` — number of 4-cliques each vertex belongs to.

    Extends the degree-oriented triangle machinery one level: a 4-clique
    with vertices in orientation order a < b < c < d (k = struct(deg, id))
    is a triangle (a, b, c) plus oriented edges a->d, b->d, c->d — the
    orientation makes each clique materialize exactly ONCE, and the
    candidate-d fan-out per triangle is bounded by the oriented out-degree
    O(sqrt(E)), the same bound that keeps the wedge join linear-ish
    (Chiba–Nishizeki / Ortmann–Brandes edge orientation, public method).

    The oriented edge set is referenced six times (two wedge legs, the
    closer, and the three d-legs), so it is eagerly localCheckpoint-ed —
    the triad_census lesson: multi-referenced subtrees re-execute per
    reference otherwise.
    """
    o = _oriented(edges).localCheckpoint()
    tri = _triangle_rows(o)
    ead = o.select(F.col("u").alias("a"), F.col("v").alias("d"))
    ebd = o.select(F.col("u").alias("b"), F.col("v").alias("d"))
    ecd = o.select(F.col("u").alias("c"), F.col("v").alias("d"))
    quads = tri.join(ead, "a").join(ebd, ["b", "d"]).join(ecd, ["c", "d"])
    return (
        quads.select(F.explode(F.array("a", "b", "c", "d")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("cliques4"))
    )
