"""Damping sweep: per-d parity with the single-d kernel, sweep semantics."""

import pytest

from pagerank_spark.algos.pagerank import pagerank, pagerank_damping_sweep


EDGES = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (5, 0)]  # 4 is dangling


def _sweep(spark, dampings, iters):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    out = pagerank_damping_sweep(df, dampings, iters=iters).collect()
    res = {}
    for r in out:
        res.setdefault(round(r.dval, 3), {})[r.id] = r.rank
    return res


def test_085_leg_matches_single_damping_kernel(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    single = {r.id: r.rank for r in pagerank(df, max_iters=4, tol=0.0).ranks.collect()}
    sweep = _sweep(spark, [0.5, 0.85], iters=4)[0.85]
    assert set(sweep) == set(single)
    for vid in single:
        assert sweep[vid] == pytest.approx(single[vid], abs=1e-12), vid


def test_each_leg_sums_to_one(spark):
    sweep = _sweep(spark, [0.3, 0.85], iters=5)
    for d, ranks in sweep.items():
        assert sum(ranks.values()) == pytest.approx(1.0, abs=1e-9), d


def test_low_damping_flattens_toward_uniform(spark):
    sweep = _sweep(spark, [0.05, 0.95], iters=6)
    n = len(sweep[0.05])
    spread_low = max(sweep[0.05].values()) - min(sweep[0.05].values())
    spread_high = max(sweep[0.95].values()) - min(sweep[0.95].values())
    assert spread_low < spread_high
    assert max(sweep[0.05].values()) == pytest.approx(1 / n, rel=0.3)


def test_empty_dampings_rejected(spark):
    df = spark.createDataFrame(EDGES, "src long, dst long")
    with pytest.raises(ValueError):
        pagerank_damping_sweep(df, [])
