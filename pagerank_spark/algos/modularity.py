"""Newman modularity of a vertex partition — the standard quality score for
the communities that :mod:`.labelprop` (SURVEY.md §2b) produces.

Over the undirected simple graph (symmetrized, deduplicated, loop-free;
m = edge count), a community c with e_c internal edges and total degree d_c
contributes

    q_c = e_c / m - (d_c / (2m))^2

and Q = Σ_c q_c. Everything is built-in Catalyst operators: m is an in-plan
one-row aggregate broadcast into the projection (never a driver action),
the label attachment is two hash joins against the V-sized label table, and
both the internal-edge count and the degree sum are single map-side-combined
aggregates keyed by label — at 100 TB the only shuffles are the two
label-attachment joins (key: vertex id) and the two per-community aggregates
(key: label, community count << V).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def modularity_by_community(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Per-community modularity contributions.

    ``edges`` is a directed ``(src, dst)`` frame (symmetrized/deduped here);
    ``labels`` maps ``(id, label)`` — e.g. the output of
    :func:`pagerank_spark.algos.labelprop.label_propagation`. Returns
    ``(label, internal_edges, degree_sum, q_contrib)``, one row per
    community that owns at least one vertex of the simple graph;
    ``Q = sum(q_contrib)``.
    """
    und = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
        .localCheckpoint()  # referenced by m, the degree agg, and the pair join
    )
    m = und.agg(F.count(F.lit(1)).cast("double").alias("__m"))

    deg = (
        und.select(F.col("a").alias("id"))
        .unionByName(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    la = labels.select(F.col("id").alias("a"), F.col("label").alias("__la"))
    lb = labels.select(F.col("id").alias("b"), F.col("label").alias("__lb"))
    internal = (
        und.join(la.hint("shuffle_hash"), "a")
        .join(lb.hint("shuffle_hash"), "b")
        .filter(F.col("__la") == F.col("__lb"))
        .groupBy(F.col("__la").alias("label"))
        .agg(F.count(F.lit(1)).alias("internal_edges"))
    )
    dtot = (
        deg.join(labels.hint("shuffle_hash"), "id")
        .groupBy("label")
        .agg(F.sum("deg").alias("degree_sum"))
    )
    return (
        dtot.join(internal.hint("shuffle_hash"), "label", "left")
        .crossJoin(F.broadcast(m))
        .select(
            "label",
            F.coalesce(F.col("internal_edges"), F.lit(0)).alias("internal_edges"),
            "degree_sum",
            (
                F.coalesce(F.col("internal_edges"), F.lit(0)) / F.col("__m")
                - F.pow(F.col("degree_sum") / (2.0 * F.col("__m")), F.lit(2.0))
            ).alias("q_contrib"),
        )
    )


def modularity(edges: DataFrame, labels: DataFrame) -> float:
    """Scalar Q = Σ_c q_contrib."""
    row = modularity_by_community(edges, labels).agg(F.sum("q_contrib").alias("q")).first()
    return float(row["q"] or 0.0)


def conductance_by_community(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """Per-community conductance ``phi(c) = cut(c) / min(vol(c), 2m - vol(c))``
    — the complementary community-quality score to modularity (low phi =
    few boundary edges relative to volume; the standard sweep objective in
    spectral/seed-set community detection).

    Same undirected-simple-graph convention and shuffle shape as
    :func:`modularity_by_community`: two vertex-keyed label-attachment
    joins, then label-keyed aggregates (communities << V). A boundary edge
    (la != lb) contributes to BOTH endpoint communities' cuts, so boundary
    rows are exploded once into two (label, 1) rows — at most 2|E| narrow
    rows, map-side combined. Every emitted statistic is an exact BIGINT;
    ``phi_micro = (10^6 * cut) div min(vol, 2m - vol)`` (floor on
    non-negative ints — engine-identical), 0 when the community owns the
    whole volume.

    Returns ``(label, n_vertices, volume, cut, phi_micro)``.
    """
    und = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
        .localCheckpoint()  # referenced by m, the degree agg, and the pair join
    )
    m = und.agg(F.count(F.lit(1)).alias("__m"))

    deg = (
        und.select(F.col("a").alias("id"))
        .unionByName(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    la = labels.select(F.col("id").alias("a"), F.col("label").alias("__la"))
    lb = labels.select(F.col("id").alias("b"), F.col("label").alias("__lb"))
    boundary = (
        und.join(la.hint("shuffle_hash"), "a")
        .join(lb.hint("shuffle_hash"), "b")
        .filter(F.col("__la") != F.col("__lb"))
    )
    cut = (
        boundary.select(F.explode(F.array("__la", "__lb")).alias("label"))
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("cut"))
    )
    vol = (
        deg.join(labels.hint("shuffle_hash"), "id")
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n_vertices"), F.sum("deg").alias("volume"))
    )
    return (
        vol.join(cut.hint("shuffle_hash"), "label", "left")
        .crossJoin(F.broadcast(m))
        .select(
            "label",
            "n_vertices",
            F.col("volume").cast("long").alias("volume"),
            F.coalesce(F.col("cut"), F.lit(0)).cast("long").alias("cut"),
            F.expr(
                "CASE WHEN least(volume, 2 * __m - volume) > 0"
                " THEN CAST(COALESCE(cut, 0) * 1000000 DIV least(volume, 2 * __m - volume) AS BIGINT)"
                " ELSE CAST(0 AS BIGINT) END"
            ).alias("phi_micro"),
        )
    )
