"""ANF / HyperBall neighborhood sketches (algos/neighborhood.py).

Exact mode is checked against a pure-Python BFS closure on seeded ER graphs;
hll mode against (a) a bit-identical pure-Python register replay — the same
32-bit multiplicative hashing, so EQUALITY not allclose — and (b) a relative
accuracy bound vs the exact ball sizes.
"""

from collections import deque

import pytest
from pyspark.sql import functions as F

from pagerank_spark.algos.neighborhood import (
    ball_sizes,
    effective_diameter,
    neighborhood_function,
    py_hll_estimate,
    py_hll_registers,
)
from pagerank_spark.sources.graphs import er_graph


def _bfs_balls(edge_list, vertices, k):
    nbrs = {}
    for s, d in edge_list:
        nbrs.setdefault(s, set()).add(d)
    balls = {}
    for v in vertices:
        seen = {v}
        frontier = deque([(v, 0)])
        while frontier:
            u, d = frontier.popleft()
            if d == k:
                continue
            for w in nbrs.get(u, ()):
                if w not in seen:
                    seen.add(w)
                    frontier.append((w, d + 1))
        balls[v] = len(seen)
    return balls


def _er(spark, n=300, avg_deg=4, seed=7):
    edges = er_graph(spark, n, n * avg_deg, seed=seed)
    el = [(r["src"], r["dst"]) for r in edges.collect()]
    verts = sorted({x for e in el for x in e})
    return edges, el, verts


def test_exact_ball_sizes_match_bfs(spark):
    edges, el, verts = _er(spark)
    for k in (0, 1, 3):
        got = {r["id"]: r["ball_size"] for r in ball_sizes(edges, k).collect()}
        assert got == _bfs_balls(el, verts, k)


def test_neighborhood_function_is_sum_of_balls_and_monotone(spark):
    edges, el, verts = _er(spark, n=200, seed=11)
    nf = {r["t"]: r["nf"] for r in neighborhood_function(edges, 3).collect()}
    assert nf[0] == len(verts)
    prev = 0
    for t in range(4):
        assert nf[t] == sum(_bfs_balls(el, verts, t).values())
        assert nf[t] >= prev
        prev = nf[t]


def test_effective_diameter_on_planted_path(spark):
    # path 0->1->...->9: N(t) = sum_v min(t+1, 10-v) — closed form
    el = [(i, i + 1) for i in range(9)]
    edges = spark.createDataFrame(el, "src long, dst long")
    nf = lambda t: sum(min(t + 1, 10 - v) for v in range(10))  # noqa: E731
    horizon = 9
    q = 0.9
    expected = next(t for t in range(horizon + 1) if nf(t) >= q * nf(horizon))
    row = effective_diameter(edges, horizon, q=q).collect()[0]
    assert row["eff_diameter"] == expected
    assert row["nf_horizon"] == nf(horizon)


def test_hll_registers_bit_identical_to_python_replay(spark):
    edges, el, verts = _er(spark, n=150, seed=3)
    from pagerank_spark.algos.neighborhood import _hll_iterate

    got = {r["id"]: list(r["regs"]) for r in _hll_iterate(edges, 2, p=5).collect()}
    want = py_hll_registers(el, verts, 2, p=5)
    assert got == want


def test_hll_estimate_accuracy_vs_exact(spark):
    edges, el, verts = _er(spark, n=800, avg_deg=6, seed=19)
    exact = ball_sizes(edges, 3).agg(F.sum("ball_size")).collect()[0][0]
    est = ball_sizes(edges, 3, mode="hll", p=7).agg(F.sum("ball_est")).collect()[0][0]
    # p=7 -> std err ~1.04/sqrt(128) ~ 9%; summed over vertices errors
    # partially cancel. 15% is a loose deterministic bound for this seed.
    assert abs(est - exact) / exact < 0.15
    # spark-side estimate formula == python replay formula on the registers
    regs = py_hll_registers(el, verts, 3, p=7)
    py_total = sum(py_hll_estimate(r, 7) for r in regs.values())
    assert est == pytest.approx(py_total, rel=1e-9)


def test_hll_nf_monotone_and_ball_floor(spark):
    edges, _, verts = _er(spark, n=200, seed=5)
    nf = {r["t"]: r["nf"] for r in neighborhood_function(edges, 2, mode="hll", p=6).collect()}
    assert nf[0] > 0 and nf[0] <= 2 * len(verts)  # ~V at t=0
    assert nf[0] <= nf[1] <= nf[2]


def test_ball_sizes_rejects_bad_args(spark):
    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError):
        ball_sizes(edges, -1)
    with pytest.raises(ValueError):
        ball_sizes(edges, 1, mode="nope")
