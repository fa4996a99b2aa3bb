"""Landmark k-bounded Brandes EDGE betweenness vs a pure-Python oracle."""

import pytest

from pagerank_spark.algos.betweenness import edge_betweenness_landmark
from pagerank_spark.sources.graphs import er_edges_numpy


def _edges_df(spark, pairs):
    return spark.createDataFrame([(int(s), int(d)) for s, d in pairs], "src long, dst long")


def _brute_edges(pairs, seeds, k):
    adj = {}
    eb = {}
    for s, d in pairs:
        s, d = int(s), int(d)
        adj.setdefault(s, set()).add(d)
        eb[(s, d)] = 0.0
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
                        term = sigma[u] / sigma[v] * (1.0 + delta[v])
                        delta[u] += term
                        eb[(u, v)] += term
    return eb


def test_edge_betweenness_path_fixture(spark):
    # path 1->2->3->4, seed {1}: edge (1,2) carries 1+delta(2)=3, (2,3) 2, (3,4) 1
    df = _edges_df(spark, [(1, 2), (2, 3), (3, 4)])
    seeds = spark.createDataFrame([(1,)], "id long")
    rows = {
        (r["src"], r["dst"]): r["edge_betweenness"]
        for r in edge_betweenness_landmark(df, seeds, max_depth=5).collect()
    }
    assert rows[(1, 2)] == pytest.approx(3.0)
    assert rows[(2, 3)] == pytest.approx(2.0)
    assert rows[(3, 4)] == pytest.approx(1.0)


def test_edge_betweenness_diamond_split(spark):
    # 1->2->4, 1->3->4, 4->5: sigma splits over the two middle routes
    df = _edges_df(spark, [(1, 2), (1, 3), (2, 4), (3, 4), (4, 5)])
    seeds = spark.createDataFrame([(1,)], "id long")
    rows = {
        (r["src"], r["dst"]): r["edge_betweenness"]
        for r in edge_betweenness_landmark(df, seeds, max_depth=5).collect()
    }
    # delta(4)=1 (edge 4->5); each route edge into 4 carries 0.5*(1+1)=1
    assert rows[(2, 4)] == pytest.approx(1.0)
    assert rows[(3, 4)] == pytest.approx(1.0)
    # source edges: 1*(1+delta(2))=2 with delta(2)=1 (its share of edge (2,4))
    assert rows[(1, 2)] == pytest.approx(2.0)
    assert rows[(1, 3)] == pytest.approx(2.0)
    assert rows[(4, 5)] == pytest.approx(1.0)


def test_edge_betweenness_sum_identity(spark):
    # per seed, sum over out-edges of u of edge terms == delta(u):
    # total edge credit == total vertex delta (Brandes dependency identity)
    arr = er_edges_numpy(40, 160, seed=13)
    seeds_ids = [v for v in sorted({int(x) for x in arr.ravel()}) if v % 5 == 0]
    seeds = spark.createDataFrame([(v,) for v in seeds_ids], "id long")
    got = edge_betweenness_landmark(_edges_df(spark, arr), seeds, max_depth=4).collect()
    exp = _brute_edges(arr, seeds_ids, 4)
    total_got = sum(r["edge_betweenness"] for r in got)
    total_exp = sum(exp.values())
    assert total_got == pytest.approx(total_exp, abs=1e-9)


@pytest.mark.parametrize("k", [3, 6])
def test_edge_betweenness_matches_bruteforce(spark, k):
    arr = er_edges_numpy(60, 300, seed=41)
    ids = sorted({int(x) for x in arr.ravel()})
    seed_ids = [v for v in ids if v % 6 == 0]
    seeds = spark.createDataFrame([(v,) for v in seed_ids], "id long")
    got = {
        (r["src"], r["dst"]): r["edge_betweenness"]
        for r in edge_betweenness_landmark(_edges_df(spark, arr), seeds, max_depth=k).collect()
    }
    exp = _brute_edges(arr, seed_ids, k)
    assert set(got) == set(exp)
    for key in exp:
        assert got[key] == pytest.approx(exp[key], abs=1e-9), key
