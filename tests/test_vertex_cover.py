"""Vertex cover via maximal matching endpoints (2-approx, Gavril)."""

from pagerank_spark.algos.matching import maximal_matching
from pyspark.sql import functions as F


def _cover(spark, edges):
    df = spark.createDataFrame(edges, ["src", "dst"]).localCheckpoint()
    m = maximal_matching(df).matching
    return {r["id"] for r in m.select(F.explode(F.array("a", "b")).alias("id")).distinct().collect()}


def test_cover_covers_every_edge(spark):
    edges = [((i * 7) % 19, (i * 5 + 2) % 19) for i in range(40)]
    cover = _cover(spark, edges)
    for a, b in edges:
        if a != b:
            assert a in cover or b in cover, (a, b)


def test_cover_is_within_2x_optimum_on_star(spark):
    # star: optimum cover = {hub}; matching picks 1 edge -> cover size 2
    edges = [(0, i) for i in range(1, 8)]
    cover = _cover(spark, edges)
    assert len(cover) == 2 and 0 in cover
