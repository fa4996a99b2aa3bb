"""Borůvka MSF (algos/msf.py): exact equality with Kruskal under the same
(w, a, b) total edge order, multi-component forests, tie handling."""

from pagerank_spark.algos.msf import minimum_spanning_forest
from pagerank_spark.sources.graphs import er_edges_numpy


def _kruskal(edges):
    """Pure-Python Kruskal over normalized (a, b, w) with (w, a, b) order."""
    norm = {}
    for s, d, w in edges:
        a, b = (s, d) if s < d else (d, s)
        if a == b:
            continue
        norm[(a, b)] = min(norm.get((a, b), w), w)
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    out = set()
    for (a, b), w in sorted(norm.items(), key=lambda kv: (kv[1], kv[0])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            out.add((a, b, w))
    return out


def _df(spark, triples):
    return spark.createDataFrame(
        [(int(s), int(d), int(w)) for s, d, w in triples], "src long, dst long, weight long"
    )


def _got(spark, triples):
    return {
        (r["a"], r["b"], r["weight"])
        for r in minimum_spanning_forest(_df(spark, triples)).collect()
    }


def test_msf_matches_kruskal_er(spark):
    arr = er_edges_numpy(80, 320, seed=41)
    triples = [(s, d, (s * 7919 + d * 104729) % 997) for s, d in arr]  # dup weights likely
    assert _got(spark, triples) == _kruskal(triples)


def test_forest_spans_multiple_components(spark):
    # two disjoint triangles + an isolated edge
    triples = [
        (0, 1, 5), (1, 2, 3), (0, 2, 4),
        (10, 11, 7), (11, 12, 1), (10, 12, 2),
        (20, 21, 9),
    ]
    got = _got(spark, triples)
    assert got == _kruskal(triples)
    assert len(got) == 2 + 2 + 1  # |component| - 1 edges per component


def test_parallel_edges_and_self_loops(spark):
    triples = [(1, 2, 9), (2, 1, 4), (1, 2, 6), (1, 1, 0), (2, 3, 5)]
    got = _got(spark, triples)
    assert got == {(1, 2, 4), (2, 3, 5)}


def test_equal_weights_break_by_endpoint_order(spark):
    # 3-cycle, all weight 7: (1,2) and (1,3) win, (2,3) is the cycle's
    # "heaviest" under the (w, a, b) total order
    triples = [(1, 2, 7), (2, 3, 7), (1, 3, 7)]
    assert _got(spark, triples) == {(1, 2, 7), (1, 3, 7)}


def test_single_edge_and_empty(spark):
    assert _got(spark, [(4, 9, 3)]) == {(4, 9, 3)}
    assert _got(spark, [(5, 5, 1)]) == set()  # only a self-loop: empty forest
