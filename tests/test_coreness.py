"""Coreness decomposition (algos/coreness.py): H-index fixpoint vs exact peel."""

from pyspark.sql import functions as F

from pagerank_spark.algos.coreness import CorenessResult, coreness, py_coreness
from pagerank_spark.algos.kcore import k_core
from pagerank_spark.sources.graphs import er_graph


def _edge_list(df):
    return [(r.src, r.dst) for r in df.collect()]


def test_coreness_matches_exact_peel_on_er(spark):
    e = er_graph(spark, 250, 800, seed=11)
    exact = py_coreness(_edge_list(e))
    res = coreness(e)
    assert isinstance(res, CorenessResult) and res.converged
    got = {r.id: r.coreness for r in res.vertices.collect()}
    assert got == exact


def test_fixed_rounds_at_fixpoint_is_noop(spark):
    e = er_graph(spark, 150, 450, seed=3)
    conv = coreness(e)
    fixed = coreness(e, rounds=conv.rounds_run + 3)
    a = {r.id: r.coreness for r in conv.vertices.collect()}
    b = {r.id: r.coreness for r in fixed.vertices.collect()}
    assert a == b


def test_coreness_consistent_with_k_core_membership(spark):
    e = er_graph(spark, 200, 700, seed=5)
    res = coreness(e)
    kmax = res.vertices.agg(F.max("coreness")).first()[0]
    # vertices with coreness >= k are exactly the k-core, for a mid k
    k = max(2, kmax)
    core_members = {r.id for r in k_core(e, k=k, rounds=None).collect()}
    by_coreness = {
        r.id for r in res.vertices.filter(F.col("coreness") >= k).collect()
    }
    assert core_members == by_coreness


def test_py_coreness_triangle_plus_tail():
    # triangle (coreness 2) with a pendant path (coreness 1)
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)]
    assert py_coreness(edges) == {0: 2, 1: 2, 2: 2, 3: 1, 4: 1}
