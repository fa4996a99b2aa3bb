"""HITS correctness: NumPy oracle on seeded random graphs, a star-graph
hand fixture, and convergence behavior."""

import numpy as np
import pytest

from pagerank_spark.algos.hits import hits
from pagerank_spark.sources.graphs import er_edges_numpy


def _edges_df(spark, arr):
    return spark.createDataFrame([(int(s), int(d)) for s, d in arr], "src long, dst long")


def _numpy_hits(arr, k):
    """Same recurrence as algos/hits.py: auth from old hub, hub from NEW
    auth, L2 normalization per half-step, uniform 1/V hub init; multi-edges
    add multiplicity."""
    ids = sorted({int(x) for x in arr.ravel()})
    idx = {v: i for i, v in enumerate(ids)}
    n = len(ids)
    A = np.zeros((n, n))
    for s, d in arr:
        A[idx[int(s)], idx[int(d)]] += 1.0
    h = np.full(n, 1.0 / n)
    a = np.zeros(n)
    for _ in range(k):
        a = A.T @ h
        a = a / max(float(np.linalg.norm(a)), 1e-300)
        h = A @ a
        h = h / max(float(np.linalg.norm(h)), 1e-300)
    return ids, a, h


@pytest.mark.parametrize("v,e,seed,k", [(60, 240, 7, 8), (200, 1000, 11, 5)])
def test_hits_matches_numpy_oracle(spark, v, e, seed, k):
    arr = er_edges_numpy(v, e, seed)
    res = hits(_edges_df(spark, arr), max_iters=k, tol=0.0, check_every=3)
    assert res.iterations == k
    rows = {r["id"]: (r["auth"], r["hub"]) for r in res.scores.collect()}
    ids, a, h = _numpy_hits(arr, k)
    assert set(rows) == set(ids)
    got_a = np.array([rows[i][0] for i in ids])
    got_h = np.array([rows[i][1] for i in ids])
    assert np.allclose(got_a, a, atol=1e-9)
    assert np.allclose(got_h, h, atol=1e-9)


def test_hits_star_fixture(spark):
    """Star pointing at a center: the center is the sole authority (auth=1),
    the leaves are identical hubs (1/sqrt(L) each), and the fixed point is
    reached after the first iteration."""
    leaves = 4
    arr = np.array([[i, 99] for i in range(1, leaves + 1)], dtype=np.int64)
    res = hits(_edges_df(spark, arr), max_iters=6, tol=1e-12, check_every=2)
    rows = {r["id"]: (r["auth"], r["hub"]) for r in res.scores.collect()}
    assert rows[99][0] == pytest.approx(1.0, abs=1e-12)
    assert rows[99][1] == pytest.approx(0.0, abs=1e-12)
    for i in range(1, leaves + 1):
        assert rows[i][0] == pytest.approx(0.0, abs=1e-12)
        assert rows[i][1] == pytest.approx(1.0 / np.sqrt(leaves), abs=1e-12)
    assert res.converged


def test_hits_converges_and_stops_early(spark):
    arr = er_edges_numpy(80, 400, 5)
    res = hits(_edges_df(spark, arr), max_iters=100, tol=1e-10, check_every=4)
    assert res.converged
    assert res.iterations < 100
    # converged iterate is stationary: one more iteration moves nothing
    ids, a, h = _numpy_hits(arr, res.iterations)
    rows = {r["id"]: (r["auth"], r["hub"]) for r in res.scores.collect()}
    got_a = np.array([rows[i][0] for i in ids])
    assert np.allclose(got_a, a, atol=1e-8)


def test_hits_empty_raises(spark):
    df = spark.createDataFrame([], "src long, dst long")
    with pytest.raises(ValueError):
        hits(df, max_iters=2)


def test_katz_matches_numpy(spark):
    from pagerank_spark.algos.katz import katz

    arr = er_edges_numpy(60, 240, seed=9)
    alpha, beta, k = 0.05, 1.0, 6
    ids = sorted({int(x) for x in arr.ravel()})
    idx = {v: i for i, v in enumerate(ids)}
    A = np.zeros((len(ids), len(ids)))
    for s, d in arr:
        A[idx[int(s)], idx[int(d)]] += 1.0
    x = np.full(len(ids), beta)
    for _ in range(k):
        x = beta + alpha * (A.T @ x)
    res = katz(_edges_df(spark, arr), alpha=alpha, beta=beta, max_iters=k, tol=0.0, check_every=3)
    assert res.iterations == k
    rows = {r["id"]: r["katz"] for r in res.scores.collect()}
    got = np.array([rows[v] for v in ids])
    assert np.allclose(got, x, atol=1e-9)


def test_katz_converges(spark):
    from pagerank_spark.algos.katz import katz

    arr = er_edges_numpy(80, 320, seed=4)
    res = katz(_edges_df(spark, arr), alpha=0.01, max_iters=100, tol=1e-10, check_every=4)
    assert res.converged and res.iterations < 100


def _birank_replay(edges, alpha=0.85, iters=3):
    import math

    du, dp = {}, {}
    for u, p, w in edges:
        du[u] = du.get(u, 0.0) + float(w)
        dp[p] = dp.get(p, 0.0) + float(w)
    wn = {(u, p): float(w) / (math.sqrt(du[u]) * math.sqrt(dp[p])) for u, p, w in edges}
    beta = 1.0 - alpha
    ru = {u: 1.0 / len(du) for u in du}
    rp = {p: 1.0 / len(dp) for p in dp}
    for _ in range(iters):
        rp2 = {}
        for p in dp:
            s = sum(wn[(u, pp)] * ru[u] for (u, pp) in wn if pp == p)
            rp2[p] = alpha * s + beta * (1.0 / len(dp))
        ru2 = {}
        for u in du:
            s = sum(wn[(uu, p)] * rp[p] for (uu, p) in wn if uu == u)
            ru2[u] = alpha * s + beta * (1.0 / len(du))
        ru, rp = ru2, rp2
    return ru, rp


def test_birank_matches_replay_and_conserves_shape(spark):
    from pagerank_spark.algos.hits import birank

    edges = [
        (1, 100, 3), (1, 101, 1), (2, 100, 1), (2, 102, 2),
        (3, 101, 1), (3, 102, 1), (3, 103, 5),
    ]
    df = spark.createDataFrame(edges, "u long, p long, w long")
    res = birank(df, "u", "p", weight_col="w", alpha=0.85, iters=3).collect()
    ru, rp = _birank_replay(edges)
    got_u = {r.id: r.r for r in res if r.side == "u"}
    got_p = {r.id: r.r for r in res if r.side == "p"}
    assert set(got_u) == set(ru) and set(got_p) == set(rp)
    for k in ru:
        assert abs(got_u[k] - ru[k]) < 1e-12
    for k in rp:
        assert abs(got_p[k] - rp[k]) < 1e-12
    # sqrt normalization dampens the single heavy (3,103,5) edge: the part
    # bought by two DISTINCT users outranks the exclusive-heavy one
    assert max(got_p, key=got_p.get) == 100
    assert got_p[103] > got_p[101]


def test_birank_unweighted_default(spark):
    from pagerank_spark.algos.hits import birank

    df = spark.createDataFrame([(1, 10), (2, 10)], "u long, p long")
    res = {(r.side, r.id): r.r for r in birank(df, "u", "p", iters=2).collect()}
    ru, rp = _birank_replay([(1, 10, 1), (2, 10, 1)], iters=2)
    assert abs(res[("p", 10)] - rp[10]) < 1e-12
    assert abs(res[("u", 1)] - ru[1]) < 1e-12
    # symmetric users tie exactly
    assert res[("u", 1)] == res[("u", 2)]
