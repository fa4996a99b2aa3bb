"""Landmark k-bounded Brandes betweenness vs a pure-Python oracle."""

import pytest

from pagerank_spark.algos.betweenness import betweenness_landmark
from pagerank_spark.sources.graphs import er_edges_numpy


def _edges_df(spark, pairs):
    return spark.createDataFrame([(int(s), int(d)) for s, d in pairs], "src long, dst long")


def _brute(pairs, seeds, k):
    adj = {}
    verts = set()
    for s, d in pairs:
        s, d = int(s), int(d)
        adj.setdefault(s, set()).add(d)
        verts.update((s, d))
    bc = {v: 0.0 for v in verts}
    for src in seeds:
        dist = {src: 0}
        sigma = {src: 1.0}
        levels = {0: [src]}
        t = 0
        while levels.get(t) and t < k:
            t += 1
            lvl = []
            for u in levels[t - 1]:
                for v in adj.get(u, ()):
                    if v not in dist:
                        dist[v] = t
                        sigma[v] = 0.0
                        lvl.append(v)
                    if dist[v] == t:
                        sigma[v] += sigma[u]
            if lvl:
                levels[t] = lvl
        delta = {v: 0.0 for v in dist}
        for t in sorted((x for x in levels if x > 0), reverse=True):
            for u in levels[t - 1]:
                for v in adj.get(u, ()):
                    if dist.get(v) == t:
                        delta[u] += sigma[u] / sigma[v] * (1.0 + delta[v])
        for v, dv in delta.items():
            if v != src:
                bc[v] += dv
    return bc


def test_betweenness_path_fixture(spark):
    # path 1->2->3->4, seed {1}: exact Brandes gives delta(2)=2, delta(3)=1
    df = _edges_df(spark, [(1, 2), (2, 3), (3, 4)])
    seeds = spark.createDataFrame([(1,)], "id long")
    rows = {r["id"]: r["betweenness"] for r in betweenness_landmark(df, seeds, max_depth=5).collect()}
    assert rows[1] == 0.0
    assert rows[2] == pytest.approx(2.0)
    assert rows[3] == pytest.approx(1.0)
    assert rows[4] == pytest.approx(0.0)


def test_betweenness_diamond_split_paths(spark):
    # 1->2->4, 1->3->4, 4->5: two shortest 1->4 paths, sigma splits 0.5/0.5
    df = _edges_df(spark, [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5)])
    seeds = spark.createDataFrame([(1,)], "id long")
    rows = {r["id"]: r["betweenness"] for r in betweenness_landmark(df, seeds, max_depth=5).collect()}
    assert rows[2] == pytest.approx(1.0)  # 0.5*(1+delta(4)); delta(4)=1 -> 1.0
    assert rows[3] == pytest.approx(1.0)
    assert rows[4] == pytest.approx(1.0)
    assert rows[5] == pytest.approx(0.0)


@pytest.mark.parametrize("k", [3, 6])
def test_betweenness_matches_bruteforce(spark, k):
    arr = er_edges_numpy(60, 300, seed=41)
    ids = sorted({int(x) for x in arr.ravel()})
    seed_ids = [v for v in ids if v % 6 == 0]
    seeds = spark.createDataFrame([(v,) for v in seed_ids], "id long")
    got = {
        r["id"]: r["betweenness"]
        for r in betweenness_landmark(_edges_df(spark, arr), seeds, max_depth=k).collect()
    }
    exp = _brute(arr, seed_ids, k)
    assert set(got) == set(exp)
    for v in exp:
        assert got[v] == pytest.approx(exp[v], abs=1e-9), v
