"""Landmark distances, harmonic closeness, degree assortativity — NumPy
brute-force oracles on seeded random graphs plus hand fixtures."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pagerank_spark.algos.paths import harmonic_closeness, landmark_distances
from pagerank_spark.operators.graphstats import degree_assortativity
from pagerank_spark.sources.graphs import er_edges_numpy


def _edges_df(spark, pairs):
    return spark.createDataFrame([(int(s), int(d)) for s, d in pairs], "src long, dst long")


def _brute_dists(pairs, seeds, k):
    """Directed unit-weight BFS per seed, capped at k rounds."""
    adj = {}
    for s, d in pairs:
        adj.setdefault(int(s), set()).add(int(d))
    out = {}
    for sd in seeds:
        dist = {sd: 0.0}
        frontier = {sd}
        for r in range(1, k + 1):
            nxt = set()
            for u in frontier:
                for v in adj.get(u, ()):
                    if v not in dist:
                        dist[v] = float(r)
                        nxt.add(v)
            frontier = nxt
            if not frontier:
                break
        for v, dv in dist.items():
            out[(sd, v)] = dv
    return out


def test_landmark_distances_matches_bruteforce(spark):
    arr = er_edges_numpy(100, 500, seed=13)
    ids = sorted({int(x) for x in arr.ravel()})
    seed_ids = [v for v in ids if v % 7 == 0]
    seeds = spark.createDataFrame([(v,) for v in seed_ids], "id long")
    got = {
        (r["seed"], r["id"]): r["dist"]
        for r in landmark_distances(_edges_df(spark, arr), seeds, max_iters=5).collect()
    }
    exp = _brute_dists(arr, seed_ids, 5)
    assert got == exp


def test_harmonic_closeness_chain(spark):
    # directed chain 0->1->2->3, landmark {0}: closeness(v) = 1/dist(0,v)
    df = _edges_df(spark, [(0, 1), (1, 2), (2, 3)])
    seeds = spark.createDataFrame([(0,)], "id long")
    rows = {r["id"]: r["closeness"] for r in harmonic_closeness(df, seeds, max_iters=10).collect()}
    assert rows[0] == 0.0  # landmark itself: no other landmark reaches it
    assert rows[1] == pytest.approx(1.0)
    assert rows[2] == pytest.approx(0.5)
    assert rows[3] == pytest.approx(1.0 / 3.0)


def test_harmonic_closeness_matches_bruteforce(spark):
    arr = er_edges_numpy(80, 400, seed=21)
    ids = sorted({int(x) for x in arr.ravel()})
    seed_ids = [v for v in ids if v % 5 == 0]
    seeds = spark.createDataFrame([(v,) for v in seed_ids], "id long")
    d = _brute_dists(arr, seed_ids, 6)
    exp = {v: 0.0 for v in ids}
    for (sd, v), dv in d.items():
        if dv > 0:
            exp[v] += 1.0 / dv
    got = {
        r["id"]: r["closeness"]
        for r in harmonic_closeness(_edges_df(spark, arr), seeds, max_iters=6).collect()
    }
    assert set(got) == set(exp)
    for v in ids:
        assert got[v] == pytest.approx(exp[v], abs=1e-9), v


def test_assortativity_star_is_negative_one(spark):
    # star: every edge joins the hub (deg L) to a leaf (deg 1) — perfect
    # disassortativity, r = -1
    df = _edges_df(spark, [(0, i) for i in range(1, 6)])
    r = degree_assortativity(df).collect()[0]["assortativity"]
    assert r == pytest.approx(-1.0, abs=1e-9)


def test_assortativity_matches_numpy(spark):
    arr = er_edges_numpy(60, 300, seed=17)
    und = {(min(int(s), int(d)), max(int(s), int(d))) for s, d in arr if s != d}
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    xs, ys = [], []
    for a, b in und:
        xs += [deg[a], deg[b]]
        ys += [deg[b], deg[a]]
    exp = np.corrcoef(np.array(xs, dtype=float), np.array(ys, dtype=float))[0, 1]
    r = degree_assortativity(_edges_df(spark, arr)).collect()[0]["assortativity"]
    assert r == pytest.approx(round(exp, 6), abs=2e-6)
