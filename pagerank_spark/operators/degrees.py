"""Degree tables — the engine analogue of the reference's offline degree
precomputation (graphgen.cpp:38 accumulates out-degree at load time; the
hardware never computes degrees).

Computed once per graph and persisted by callers; every algorithm reuses the
same DataFrame, so the groupBy shuffle happens once, not per iteration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def out_degrees(edges: DataFrame) -> DataFrame:
    """``(id, out_degree)`` for every vertex with outdeg >= 1."""
    return edges.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("out_degree"))


def in_degrees(edges: DataFrame) -> DataFrame:
    """``(id, in_degree)`` for every vertex with indeg >= 1."""
    return edges.groupBy(F.col("dst").alias("id")).agg(F.count(F.lit(1)).alias("in_degree"))


def vertices_from_edges(edges: DataFrame) -> DataFrame:
    """Distinct vertex ids appearing in the edge list: ``(id,)``."""
    return (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .dropDuplicates()
    )


def degree_table(edges: DataFrame, vertices: DataFrame | None = None) -> DataFrame:
    """``(id, out_degree, in_degree)`` over all vertices (0 where absent).

    ``vertices`` may be supplied (e.g. the full id table, covering isolated
    vertices); otherwise vertices are inferred from the edge list.
    """
    if vertices is None:
        vertices = vertices_from_edges(edges)
    else:
        vertices = vertices.select("id")
    return (
        vertices.join(out_degrees(edges), on="id", how="left")
        .join(in_degrees(edges), on="id", how="left")
        .select(
            "id",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
    )
