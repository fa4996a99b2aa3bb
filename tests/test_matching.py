"""Parallel maximal matching (algos/matching.py)."""

from pagerank_spark.algos.matching import maximal_matching, py_maximal_matching
from pagerank_spark.sources.graphs import er_graph


def _collect(res):
    return {(r["a"], r["b"]): r["round"] for r in res.matching.collect()}


def test_bit_identical_to_python_replay(spark):
    edges = er_graph(spark, 200, 800, seed=31)
    el = [(r["src"], r["dst"]) for r in edges.collect()]
    res = maximal_matching(edges)
    want, rounds, conv = py_maximal_matching(el)
    assert _collect(res) == want
    assert res.rounds == rounds
    assert res.converged and conv


def test_is_a_valid_maximal_matching(spark):
    edges = er_graph(spark, 300, 1500, seed=8)
    el = {tuple(sorted((r["src"], r["dst"]))) for r in edges.collect() if r["src"] != r["dst"]}
    res = maximal_matching(edges)
    got = _collect(res)
    # matching: no vertex appears twice
    seen = set()
    for a, b in got:
        assert a not in seen and b not in seen
        seen.update((a, b))
        assert (a, b) in el
    # maximal: every graph edge touches a matched vertex
    for a, b in el:
        assert a in seen or b in seen
    assert res.converged


def test_path_graph_and_empty(spark):
    # path 0-1-2-3-4: any maximal matching has 2 edges
    edges = spark.createDataFrame([(i, i + 1) for i in range(4)], "src long, dst long")
    res = maximal_matching(edges)
    assert len(_collect(res)) == 2
    empty = spark.createDataFrame([], "src long, dst long")
    res2 = maximal_matching(empty)
    assert res2.converged and res2.matching.count() == 0


def test_self_loops_and_duplicates_ignored(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 1), (3, 4), (3, 4)], "src long, dst long"
    )
    got = _collect(maximal_matching(edges))
    assert set(got) == {(1, 2), (3, 4)}
