"""Truncated SimRank (algos/simrank.py) vs a dense pure-Python oracle."""

import pytest


def _python_simrank(edge_list, iters, c=0.75):
    """Dense textbook iteration: S_0 = I, S_{k+1}(a,b) = c/(|Ia||Ib|) Σ S_k."""
    verts = sorted({v for e in edge_list for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    inn = [[] for _ in range(n)]
    for s, d in set(edge_list):
        inn[idx[d]].append(idx[s])
    S = [[1.0 if i == j else 0.0 for j in range(n)] for i in range(n)]
    for _ in range(iters):
        N = [[0.0] * n for _ in range(n)]
        for a in range(n):
            for b in range(n):
                if a == b:
                    N[a][b] = 1.0
                    continue
                if not inn[a] or not inn[b]:
                    continue
                tot = sum(S[i][j] for i in inn[a] for j in inn[b])
                N[a][b] = c * tot / (len(inn[a]) * len(inn[b]))
        S = N
    return {
        (verts[a], verts[b]): S[a][b]
        for a in range(n)
        for b in range(a + 1, n)
        if S[a][b] > 0
    }


def _run(spark, edge_list, iters, **kw):
    from pagerank_spark.algos.simrank import simrank

    df = spark.createDataFrame(edge_list, "src long, dst long")
    return {(r["a"], r["b"]): r["s"] for r in simrank(df, iters=iters, **kw).collect()}


def test_two_citers_closed_form(spark):
    # 1 -> 3, 2 -> 3, 1 -> 4, 2 -> 4: classic co-citation.
    # s1(3,4) = c/(2*2) * (s0(1,1)+s0(1,2)+s0(2,1)+s0(2,2)) = c*2/4 = c/2
    got = _run(spark, [(1, 3), (2, 3), (1, 4), (2, 4)], iters=1)
    assert got == {(3, 4): pytest.approx(0.375)}


def test_matches_python_on_random_digraph(spark):
    # deterministic pseudo-random digraph, hashes not RNG
    edges = [((i * 7919 + 13) % 23, (i * 104729 + 7) % 23) for i in range(60)]
    edges = [(a, b) for a, b in edges if a != b]
    for iters in (1, 2, 3):
        got = _run(spark, edges, iters=iters)
        want = _python_simrank(edges, iters=iters)
        assert set(got) == set(want)
        for k in want:
            assert got[k] == pytest.approx(want[k], rel=1e-12), (k, iters)


def test_symmetric_and_bounded(spark):
    edges = [(1, 3), (2, 3), (1, 4), (2, 4), (3, 5), (4, 5), (5, 1)]
    got = _run(spark, edges, iters=3)
    for (a, b), s in got.items():
        assert a < b
        assert 0.0 < s <= 0.75  # off-diagonal SimRank is bounded by c


def test_out_degree_cap_is_subgraph_simrank(spark):
    edges = [(0, i) for i in range(1, 8)] + [(8, 1), (9, 1), (8, 2), (9, 2)]
    capped = _run(spark, edges, iters=2, max_out_degree=3)
    # vertex 0 (out-degree 7) is dropped as a source; the result equals
    # exact SimRank on the subgraph without 0's out-edges
    sub = [(a, b) for a, b in edges if a != 0]
    want = _python_simrank(sub, iters=2)
    assert set(capped) == set(want)
    for k in want:
        assert capped[k] == pytest.approx(want[k], rel=1e-12)


def test_validation(spark):
    from pagerank_spark.algos.simrank import simrank

    df = spark.createDataFrame([(1, 2)], "src long, dst long")
    with pytest.raises(ValueError):
        simrank(df, iters=0)
    with pytest.raises(ValueError):
        simrank(df, c=1.5)
