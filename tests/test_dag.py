"""DAG critical path / topo levels: Python DP replay, cycles, sources."""

import pytest

from pagerank_spark.algos.dag import critical_path, topo_levels


def _dp(edges):
    """Longest weighted path into each vertex, pure-Python fixpoint."""
    verts = {v for e in edges for v in e[:2]}
    cp = {v: 0 for v in verts}
    for _ in range(len(verts) + 1):
        nxt = dict(cp)
        for s, d, w in edges:
            nxt[d] = max(nxt[d], cp[s] + w)
        if nxt == cp:
            return cp
        cp = nxt
    raise AssertionError("cycle in test fixture")


def test_critical_path_matches_dp(spark):
    # diamond with a skip edge and uneven weights; includes a late source (9)
    edges = [(0, 1, 3), (0, 2, 1), (1, 3, 1), (2, 3, 5), (0, 3, 2), (3, 4, 2), (9, 3, 10)]
    df = spark.createDataFrame(edges, "src long, dst long, w long")
    got = {r.id: r.cp for r in critical_path(df, "w", max_iters=12).collect()}
    assert got == _dp(edges)
    assert got[3] == 10  # via the late source, not the diamond
    assert got[4] == 12


def test_topo_levels_chain_and_diamond(spark):
    edges = [(0, 1), (1, 2), (2, 3), (0, 3)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.id: r.lvl for r in topo_levels(df, max_iters=12).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}


def test_cycle_raises_unless_allowed(spark):
    df = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "src long, dst long")
    with pytest.raises(ValueError, match="cyclic|fixpoint"):
        critical_path(df, max_iters=8)
    # allow_unconverged returns the (divergent, capped) state without raising
    out = critical_path(df, max_iters=8, allow_unconverged=True)
    assert out.count() == 3
