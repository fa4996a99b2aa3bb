"""Fiedler vector: exact NumPy replay of the deflated power iteration, plus
spectral-bisection semantics on a planted two-cluster graph."""

import numpy as np
import pytest

from pagerank_spark.algos.spectral import _ID_MOD, _LCG_A, _LCG_C, _LCG_M, fiedler_vector
from pagerank_spark.sources.graphs import er_edges_numpy


def _edges_df(spark, pairs):
    return spark.createDataFrame([(int(s), int(d)) for s, d in pairs], "src long, dst long")


def _numpy_replay(pairs, iters):
    und = {(min(a, b), max(a, b)) for a, b in ((int(s), int(d)) for s, d in pairs) if a != b}
    ids = sorted({v for e in und for v in e})
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    deg = np.zeros(n)
    for a, b in und:
        deg[idx[a]] += 1
        deg[idx[b]] += 1
    sd = np.sqrt(deg)
    d_tot = deg.sum()
    x = np.array(
        [((v % _ID_MOD) * _LCG_A + _LCG_C) % _LCG_M / _LCG_M - 0.5 for v in ids]
    )
    for _ in range(iters):
        s = np.zeros(n)
        for a, b in und:
            i, j = idx[a], idx[b]
            coef = 1.0 / (sd[i] * sd[j])
            s[i] += coef * x[j]
            s[j] += coef * x[i]
        y = (x + s) / 2.0
        c = float((sd * y).sum() / d_tot)
        x = y - c * sd
    nrm = np.linalg.norm(x)
    if nrm > 0:
        x = x / nrm
    return {v: x[idx[v]] for v in ids}


def _two_cliques(k):
    # clique {0..k-1}, clique {k..2k-1}, one bridge edge (k-1, k)
    pairs = []
    for lo in (0, k):
        for i in range(lo, lo + k):
            for j in range(i + 1, lo + k):
                pairs.append((i, j))
    pairs.append((k - 1, k))
    return pairs


@pytest.mark.parametrize("iters", [1, 7])
def test_fiedler_matches_numpy_replay(spark, iters):
    arr = er_edges_numpy(50, 220, seed=23)
    got = {
        r["id"]: r["fiedler"]
        for r in fiedler_vector(_edges_df(spark, arr), max_iters=iters).scores.collect()
    }
    exp = _numpy_replay(arr, iters)
    assert set(got) == set(exp)
    for v in exp:
        assert got[v] == pytest.approx(exp[v], abs=1e-9), v


def test_fiedler_bisects_two_cliques(spark):
    pairs = _two_cliques(8)
    res = fiedler_vector(_edges_df(spark, pairs), max_iters=60)
    vals = {r["id"]: r["fiedler"] for r in res.scores.collect()}
    left = [vals[v] for v in range(8)]
    right = [vals[v] for v in range(8, 16)]
    # signs separate the two planted cliques exactly
    assert all(np.sign(v) == np.sign(left[0]) for v in left)
    assert all(np.sign(v) == np.sign(right[0]) for v in right)
    assert np.sign(left[0]) != np.sign(right[0])
    # and the iterate aligns with the true second eigenvector of N
    exp = _numpy_replay(pairs, 60)
    ids = sorted(exp)
    und = {(min(a, b), max(a, b)) for a, b in pairs}
    n = len(ids)
    idx = {v: i for i, v in enumerate(ids)}
    A = np.zeros((n, n))
    for a, b in und:
        A[idx[a], idx[b]] = A[idx[b], idx[a]] = 1.0
    d = A.sum(1)
    N = A / np.sqrt(np.outer(d, d))
    w, V = np.linalg.eigh(N)
    v2 = V[:, np.argsort(w)[-2]]
    got_vec = np.array([vals[v] for v in ids])
    cos = abs(float(got_vec @ v2) / (np.linalg.norm(got_vec) * np.linalg.norm(v2)))
    assert cos > 0.999


def test_fiedler_orthogonal_to_sqrt_deg(spark):
    arr = er_edges_numpy(40, 160, seed=7)
    res = fiedler_vector(_edges_df(spark, arr), max_iters=6)
    rows = res.scores.collect()
    und = {(min(int(s), int(d)), max(int(s), int(d))) for s, d in arr if int(s) != int(d)}
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    dot = sum(r["fiedler"] * np.sqrt(deg[r["id"]]) for r in rows)
    assert abs(dot) < 1e-9
