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


def test_coarsening_step_shrinks_and_conserves(spark):
    from pagerank_spark.operators.graphstats import contract_graph

    edges = [((i * 7) % 23, (i * 5 + 2) % 23) for i in range(60)]
    df = (
        spark.createDataFrame(edges, ["src", "dst"])
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .localCheckpoint()
    )
    m = maximal_matching(df).matching
    verts = df.select(F.col("src").alias("id")).unionByName(
        df.select(F.col("dst").alias("id"))
    ).distinct()
    pair_map = m.select(F.col("a").alias("id"), F.least("a", "b").alias("group")).unionByName(
        m.select(F.col("b").alias("id"), F.least("a", "b").alias("group"))
    )
    mapping = verts.join(pair_map, "id", "left").select(
        "id", F.coalesce("group", F.col("id")).alias("group")
    )
    coarse = contract_graph(df, mapping).collect()
    n_orig = verts.count()
    n_matched = m.count()
    n_coarse = len({r["src"] for r in coarse} | {r["dst"] for r in coarse})
    # every matched pair removes exactly one vertex (isolated supervertices
    # can drop out of the edge list, hence <=)
    assert n_coarse <= n_orig - n_matched
    # edge mass conserved: contracted weights == original inter-group edges
    groups = {r["id"]: r["group"] for r in mapping.collect()}
    inter = sum(1 for r in df.collect() if groups[r["src"]] != groups[r["dst"]])
    assert sum(r["w"] for r in coarse) == inter
