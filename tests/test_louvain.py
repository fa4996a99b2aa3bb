"""Louvain community detection (algos/louvain.py): planted-structure
recovery, weighted semantics, determinism, monotone-Q guard, edge cases."""

from pyspark.sql import functions as F

from pagerank_spark.algos.labelprop import label_propagation
from pagerank_spark.algos.louvain import louvain
from pagerank_spark.algos.modularity import modularity
from pagerank_spark.sources.graphs import clique_ring, er_graph


def _comms(rows):
    out = {}
    for r in rows:
        out.setdefault(r["community"], set()).add(r["id"])
    return {frozenset(v) for v in out.values()}


def test_recovers_planted_cliques(spark):
    edges = clique_ring(spark, n_cliques=8, size=6)
    got = sorted((r["id"], r["community"]) for r in louvain(edges).collect())
    assert got == [(i, 6 * (i // 6)) for i in range(48)]


def test_labels_are_min_member(spark):
    edges = clique_ring(spark, n_cliques=5, size=4)
    for r in louvain(edges).collect():
        assert r["community"] == 4 * (r["id"] // 4)


def test_weighted_splits_on_heavy_edges(spark):
    # 4-cycle with heavy opposite edges: optimum is the two heavy pairs
    edges = spark.createDataFrame(
        [(0, 1, 10), (2, 3, 10), (1, 2, 1), (3, 0, 1)], "src long, dst long, w long"
    )
    got = _comms(louvain(edges, weight_col="w").collect())
    assert got == {frozenset({0, 1}), frozenset({2, 3})}


def test_self_loops_tolerated(spark):
    edges = clique_ring(spark, n_cliques=4, size=5).unionByName(
        spark.createDataFrame([(0, 0), (7, 7)], "src long, dst long")
    )
    got = sorted((r["id"], r["community"]) for r in louvain(edges).collect())
    assert got == [(i, 5 * (i // 5)) for i in range(20)]


def test_repartition_stable(spark):
    edges = er_graph(spark, v=200, e=800, seed=7)
    a = sorted(map(tuple, louvain(edges).collect()))
    b = sorted(map(tuple, louvain(edges.repartition(13)).collect()))
    assert a == b


def test_beats_or_ties_labelprop_modularity(spark):
    edges = clique_ring(spark, n_cliques=6, size=5)
    q_louvain = modularity(edges, louvain(edges).withColumnRenamed("community", "label"))
    q_lp = modularity(edges, label_propagation(edges))
    assert q_louvain >= q_lp - 1e-12
    assert q_louvain > 0.5  # planted structure: strong modularity


def test_empty_graph(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    assert louvain(edges).count() == 0


def test_single_edge(spark):
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    got = _comms(louvain(edges).collect())
    assert got == {frozenset({1, 2})}
