"""Link prediction scores — common-neighbors / Adamic-Adar / Jaccard over
non-adjacent vertex pairs at distance 2.

Same wedge-enumeration dataflow family as triangle counting (SURVEY.md §2b;
:mod:`.triangles`): symmetrize, join the adjacency with itself on the wedge
center, aggregate per endpoint pair — but keeping the OPEN wedges (pairs NOT
already adjacent) that triangle counting throws away.

Scores for a candidate pair (u, v), N(x) = undirected neighbor set:

    cn      = |N(u) ∩ N(v)|                       (common neighbors)
    aa      = Σ_{z ∈ N(u) ∩ N(v)} 1 / ln(deg(z))  (Adamic-Adar)
    jaccard = cn / (deg(u) + deg(v) - cn)

Scale shape (the 100-TB story):

  * the wedge join is keyed by the center ``z`` — one shuffle of the
    symmetrized adjacency, co-partitioned self-join (no broadcast of an
    E-sized side). Wedge count is Σ_z deg(z)·(deg(z)−1)/2, so hub centers
    dominate cost quadratically: ``max_center_degree`` drops super-hub
    centers BEFORE the join (the standard frequent-item cap — a hub shared
    by millions of pairs carries ~no signal, 1/ln(deg) → 0, while costing
    deg² wedges).
  * the pair aggregate shuffles once on (u, v) with map-side combine; cn
    and the aa sum ride the same HashAggregate.
  * the adjacency-exclusion is a left-anti join on the canonical (u < v)
    pair key; degree attachment is two V-sized joins after aggregation (the
    pair frame is already far smaller than the wedge frame).

Everything is built-in Catalyst operators — no UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def undirected_adjacency(edges: DataFrame) -> DataFrame:
    """Symmetrized, deduplicated, loop-free adjacency ``(a, b)`` from a
    directed ``(src, dst)`` edge list (each undirected edge appears in both
    orientations)."""
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    return (
        e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .union(e.select(F.col("dst").alias("a"), F.col("src").alias("b")))
        .dropDuplicates()
    )


def link_prediction_scores(
    edges: DataFrame,
    min_common: int = 1,
    max_center_degree: int | None = None,
) -> DataFrame:
    """Score all non-adjacent distance-2 pairs. Returns
    ``(a, b, cn, aa, jaccard)`` with ``a < b``; ``cn >= min_common``.

    ``max_center_degree`` caps which vertices may act as wedge CENTERS
    (bounding the quadratic wedge blow-up at hubs); pair degrees in the
    jaccard denominator are always the full uncapped degrees.
    """
    adj = undirected_adjacency(edges).localCheckpoint()  # referenced 4x below
    deg = adj.groupBy(F.col("a").alias("id")).agg(F.count(F.lit(1)).alias("deg"))

    centers = adj
    if max_center_degree is not None:
        ok = deg.filter(F.col("deg") <= max_center_degree).select("id")
        centers = adj.join(ok.hint("shuffle_hash"), adj.a == ok.id, "left_semi")

    x = centers.select(F.col("a").alias("z"), F.col("b").alias("u"))
    y = centers.select(F.col("a").alias("z2"), F.col("b").alias("v"))
    wedges = (
        x.join(y.hint("shuffle_hash"), (x.z == y.z2) & (x.u < y.v))
        .join(deg.hint("shuffle_hash"), F.col("z") == deg.id)
        .select("u", "v", (F.lit(1.0) / F.log(F.col("deg").cast("double"))).alias("w"))
    )
    pairs = (
        wedges.groupBy("u", "v")
        .agg(F.count(F.lit(1)).alias("cn"), F.sum("w").alias("aa"))
        .filter(F.col("cn") >= min_common)
    )
    # drop pairs that are already edges (canonical a<b orientation suffices:
    # u < v by construction and adj holds both orientations)
    cand = pairs.join(
        adj, (pairs.u == adj.a) & (pairs.v == adj.b), "left_anti"
    )
    du = deg.select(F.col("id").alias("__ua"), F.col("deg").alias("deg_a"))
    dv = deg.select(F.col("id").alias("__vb"), F.col("deg").alias("deg_b"))
    return (
        cand.join(du.hint("shuffle_hash"), cand.u == du.__ua)
        .join(dv.hint("shuffle_hash"), cand.v == dv.__vb)
        .select(
            F.col("u").alias("a"),
            F.col("v").alias("b"),
            "cn",
            "aa",
            (F.col("cn").cast("double") / (F.col("deg_a") + F.col("deg_b") - F.col("cn"))).alias("jaccard"),
        )
    )
