"""k-clique percolation communities (k = 3), Palla et al. 2005 (public
methodology: two k-cliques are adjacent iff they share a (k-1)-clique; a
community is a connected set of cliques under that adjacency, and vertices
may belong to SEVERAL communities — the overlapping-communities property
that modularity/label-propagation methods cannot express).

Spark-first shape, k = 3 (triangles; shared edge = adjacency):

1. Triangles come from the degree-oriented wedge join already powering
   triangle counting (:mod:`.triangles` — reference parity:
   estherlyoon/pagerank has a single hard-wired kernel; this is engine
   breadth mandated by SURVEY §2b).
2. The triangle-adjacency graph is NEVER built as a pairwise self-join on
   the shared edge: an edge shared by ``g`` triangles would emit ``g²``
   pairs (the LSH hot-bucket hazard). Instead each edge key contributes a
   STAR — every incident triangle pairs with the per-edge minimum triangle
   id — which is connectivity-equivalent (``O(g)`` pairs) and is the same
   cap-free pattern as ``graphstats.bipartite_project``'s hub treatment.
3. Communities = :func:`~pagerank_spark.algos.components.connected_components`
   over the star graph (min-label + pointer jumping — string labels are
   fine: the superstep only needs a total order, and zero-padded ids make
   lexicographic == numeric).

Scale: two shuffles to orient + wedge-join (degree-bounded), one explode
(3 rows per triangle), one map-side-combined min per edge key, then the CC
fixpoint whose frontier is triangle-count-sized. No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .components import connected_components
from .triangles import _oriented, _triangle_rows

__all__ = ["clique_percolation3"]

_PAD = 12


def _tid(x, y, z):
    return F.concat_ws(
        "_",
        F.lpad(x.cast("string"), _PAD, "0"),
        F.lpad(y.cast("string"), _PAD, "0"),
        F.lpad(z.cast("string"), _PAD, "0"),
    )


def _ek(u, v):
    return F.concat_ws(
        "_", F.lpad(u.cast("string"), _PAD, "0"), F.lpad(v.cast("string"), _PAD, "0")
    )


def clique_percolation3(
    edges: DataFrame, num_partitions: int | None = None, max_iters: int = 40
) -> DataFrame:
    """``(id, community)`` — one row per (vertex, k=3 community) membership;
    overlapping vertices appear once per community. ``community`` is the
    lexicographic-minimum member-triangle id (deterministic, zero-padded
    ``x_y_z`` with x < y < z), so labels are stable across runs and
    partitioning. Edges in no triangle contribute nothing.
    """
    o = _oriented(edges).localCheckpoint()
    raw = _triangle_rows(o)
    x = F.least("a", "b", "c")
    z = F.greatest("a", "b", "c")
    y = F.col("a") + F.col("b") + F.col("c") - x - z
    # triangles are enumerated once, feed the incidence explode AND the
    # final membership join -> materialize (same discipline as
    # triangles_per_vertex: a lazily shared wedge join re-runs per branch)
    tris = raw.select(
        x.alias("x"), y.alias("y"), z.alias("z"), _tid(x, y, z).alias("tid")
    ).localCheckpoint()

    inc = tris.select(
        F.col("tid"),
        F.explode(
            F.array(
                _ek(F.col("x"), F.col("y")),
                _ek(F.col("x"), F.col("z")),
                _ek(F.col("y"), F.col("z")),
            )
        ).alias("ek"),
    )
    hubs = inc.groupBy("ek").agg(F.min("tid").alias("hub"))
    pairs = (
        inc.join(hubs, "ek")
        .filter(F.col("tid") != F.col("hub"))
        .select(F.col("hub").alias("src"), F.col("tid").alias("dst"))
    )
    labels = connected_components(
        pairs,
        vertices=tris.select(F.col("tid").alias("id")),
        max_iters=max_iters,
        num_partitions=num_partitions,
    ).select(F.col("id").alias("tid"), F.col("component").alias("community"))

    members = tris.select(
        "tid", F.explode(F.array("x", "y", "z")).alias("id")
    )
    return (
        members.join(labels, "tid")
        .select("id", "community")
        .dropDuplicates(["id", "community"])
    )
