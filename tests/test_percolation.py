"""Targeted-attack robustness pieces used by the percolation gate: the
engine's CC over anti-joined survivors keeps isolated vertices."""

from pagerank_spark.algos.components import connected_components
from pyspark.sql import functions as F


def test_hub_removal_splits_lcc(spark):
    # two triangles bridged by hub 9: removing it splits the graph
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (0, 9), (3, 9)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    full = connected_components(df)
    sizes = sorted(
        r["cs"] for r in full.groupBy("component").agg(F.count(F.lit(1)).alias("cs")).collect()
    )
    assert sizes == [7]
    survivors = df.where((F.col("src") != 9) & (F.col("dst") != 9))
    verts = spark.createDataFrame([(i,) for i in range(6)], ["id"])
    split = connected_components(survivors, vertices=verts)
    sizes = sorted(
        r["cs"] for r in split.groupBy("component").agg(F.count(F.lit(1)).alias("cs")).collect()
    )
    assert sizes == [3, 3]


def test_isolated_survivor_is_singleton(spark):
    # vertex 2's only edge goes to the removed hub 0 -> singleton component
    edges = [(0, 2), (1, 3)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    survivors = df.where((F.col("src") != 0) & (F.col("dst") != 0))
    verts = spark.createDataFrame([(1,), (2,), (3,)], ["id"])
    labels = {r["id"]: r["component"] for r in connected_components(survivors, vertices=verts).collect()}
    assert labels[2] == 2
    assert labels[1] == labels[3] == 1
