"""PageRank correctness: fixed-point goldens (FIXTURES.md §3) and damped
mode vs the NumPy oracle, in both join and CSR-kernel modes."""

import numpy as np
import pytest

from pagerank_spark.algos.pagerank import pagerank, pagerank_fixed_point
from pagerank_spark.sources.graphs import er_edges_numpy, ensure_min_outdeg

from .oracles import (
    damped_oracle,
    fixed_point_oracle,
    personalized_oracle,
    weighted_damped_oracle,
    weighted_personalized_oracle,
)

FIX4 = np.array([[0, 1], [1, 2], [2, 0], [2, 3], [3, 0]], dtype=np.int64)
GOLDEN_FIX4 = {
    1: [32768, 16384, 8192, 16384],
    2: [24576, 32768, 8192, 8192],
    3: [16384, 24576, 16384, 8192],
    4: [24576, 16384, 12288, 16384],
}


def _edges_df(spark, arr):
    return spark.createDataFrame([(int(s), int(d)) for s, d in arr], "src long, dst long")


@pytest.mark.parametrize("rounds", [1, 2, 3, 4])
def test_fixed_point_golden_4v(spark, rounds):
    df = _edges_df(spark, FIX4)
    got = {r["id"]: r["rank_fp"] for r in pagerank_fixed_point(df, rounds).collect()}
    assert [got[i] for i in range(4)] == GOLDEN_FIX4[rounds]


@pytest.mark.parametrize("v,e,seed", [(6, 10, 1), (100, 400, 2), (1000, 4000, 3)])
def test_fixed_point_matches_oracle_er(spark, v, e, seed):
    arr = ensure_min_outdeg(er_edges_numpy(v, e, seed), v)
    golden = fixed_point_oracle(v, arr, n_rounds=5)
    got = {r["id"]: r["rank_fp"] for r in pagerank_fixed_point(_edges_df(spark, arr), 5).collect()}
    got_arr = np.array([got.get(i, 0) for i in range(v)], dtype=np.int64)
    assert (got_arr == golden).all()


def test_fixed_point_rejects_dangling(spark):
    df = _edges_df(spark, np.array([[0, 1]], dtype=np.int64))
    with pytest.raises(ValueError):
        pagerank_fixed_point(df, 2)


@pytest.mark.parametrize("mode,tol,max_iters,check_every", [("join", 1e-9, 160, 5), ("csr", 1e-7, 120, 5)])
def test_damped_matches_oracle(spark, mode, tol, max_iters, check_every):
    """North-rule correctness: join mode runs the full L1<1e-9 stopping rule;
    CSR mode (same semantics, Arrow kernel) is checked at 1e-7 to keep the
    suite fast — both compared to the NumPy oracle at allclose 1e-6."""
    v, e = 100, 400
    arr = er_edges_numpy(v, e, seed=7)  # dangling vertices allowed here
    oracle, oracle_iters = damped_oracle(v, arr, tol=tol, max_iters=max_iters)
    res = pagerank(_edges_df(spark, arr), max_iters=max_iters, tol=tol, mode=mode, check_every=check_every)
    assert res.converged
    got = {r["id"]: r["rank"] for r in res.ranks.collect()}
    got_arr = np.array([got[i] for i in range(v)])
    np.testing.assert_allclose(got_arr, oracle, atol=1e-6)
    # batched convergence checks may overshoot by < check_every iterations
    assert oracle_iters <= res.iterations < oracle_iters + check_every + 1
    # rank mass conserved
    assert abs(got_arr.sum() - 1.0) < 1e-6


def test_weighted_matches_oracle(spark):
    v, e = 100, 400
    arr = er_edges_numpy(v, e, seed=11)
    weights = 1.0 + (arr[:, 0] + arr[:, 1]) % 5  # deterministic positive weights
    oracle, _ = weighted_damped_oracle(v, arr, weights.astype(float), tol=1e-9, max_iters=160)
    df = spark.createDataFrame(
        [(int(s), int(d), float(w)) for (s, d), w in zip(arr, weights)],
        "src long, dst long, weight double",
    )
    res = pagerank(df, max_iters=160, tol=1e-9, weight_col="weight", check_every=3)
    assert res.converged
    got = {r["id"]: r["rank"] for r in res.ranks.collect()}
    np.testing.assert_allclose(np.array([got[i] for i in range(v)]), oracle, atol=1e-6)
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_weighted_uniform_equals_unweighted(spark):
    """All-equal weights degenerate to classic PageRank exactly."""
    arr = er_edges_numpy(60, 240, seed=12)
    df = spark.createDataFrame([(int(s), int(d)) for s, d in arr], "src long, dst long")
    dfw = df.withColumn("weight", F_lit_2())
    plain = {r["id"]: r["rank"] for r in pagerank(df, max_iters=20, tol=0.0).ranks.collect()}
    weighted = {r["id"]: r["rank"] for r in pagerank(dfw, max_iters=20, tol=0.0, weight_col="weight").ranks.collect()}
    for k in plain:
        assert abs(plain[k] - weighted[k]) < 1e-12


def F_lit_2():
    from pyspark.sql import functions as F

    return F.lit(2.0)


def test_personalized_matches_oracle(spark):
    v, e = 100, 400
    arr = er_edges_numpy(v, e, seed=13)
    seeds = np.arange(0, v, 7)
    oracle, _ = personalized_oracle(v, arr, seeds, tol=1e-9, max_iters=200)
    df = spark.createDataFrame([(int(s), int(d)) for s, d in arr], "src long, dst long")
    seed_df = spark.createDataFrame([(int(s),) for s in seeds], "id long")
    res = pagerank(df, max_iters=200, tol=1e-9, teleport=seed_df, check_every=3)
    assert res.converged
    got = {r["id"]: r["rank"] for r in res.ranks.collect()}
    np.testing.assert_allclose(np.array([got[i] for i in range(v)]), oracle, atol=1e-6)
    # mass concentrates near seeds: non-seed-reachable-only vertices get 0
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_weighted_personalized_composition(spark):
    """weight_col and teleport set SIMULTANEOUSLY (the previously-untested
    composition): contributions follow edge weights, teleport + dangling
    mass land on the seed distribution."""
    v, e = 100, 400
    arr = er_edges_numpy(v, e, seed=17)
    weights = (1.0 + (arr[:, 0] * 3 + arr[:, 1]) % 4).astype(float)
    seeds = np.arange(0, v, 9)
    oracle, _ = weighted_personalized_oracle(v, arr, weights, seeds, tol=1e-9, max_iters=200)
    df = spark.createDataFrame(
        [(int(s), int(d), float(w)) for (s, d), w in zip(arr, weights)],
        "src long, dst long, weight double",
    )
    seed_df = spark.createDataFrame([(int(s),) for s in seeds], "id long")
    res = pagerank(df, max_iters=200, tol=1e-9, weight_col="weight", teleport=seed_df, check_every=3)
    assert res.converged
    got = {r["id"]: r["rank"] for r in res.ranks.collect()}
    np.testing.assert_allclose(np.array([got[i] for i in range(v)]), oracle, atol=1e-6)
    assert abs(sum(got.values()) - 1.0) < 1e-6


def test_personalized_unknown_seeds_ignored(spark):
    """Seed ids absent from the graph must not count toward n_seeds (their
    teleport mass would silently vanish and ranks would sum below 1)."""
    v, e = 80, 320
    arr = er_edges_numpy(v, e, seed=19)
    seeds = np.arange(0, v, 8)
    oracle, _ = personalized_oracle(v, arr, seeds, tol=1e-9, max_iters=200)
    df = _edges_df(spark, arr)
    # inject ids far outside the vertex range alongside the real seeds
    seed_df = spark.createDataFrame(
        [(int(s),) for s in seeds] + [(10_000,), (10_001,)], "id long"
    )
    res = pagerank(df, max_iters=200, tol=1e-9, teleport=seed_df, check_every=3)
    assert res.converged
    got = {r["id"]: r["rank"] for r in res.ranks.collect()}
    np.testing.assert_allclose(np.array([got[i] for i in range(v)]), oracle, atol=1e-6)
    assert abs(sum(got.values()) - 1.0) < 1e-6
    # a fully-disjoint seed set is an error, not a silent all-zero run
    with pytest.raises(ValueError):
        pagerank(df, max_iters=5, teleport=spark.createDataFrame([(10_000,)], "id long"))


def test_weight_validation_rejects_nonpositive(spark):
    df = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 0.0), (2, 0, 2.0)], "src long, dst long, weight double"
    )
    with pytest.raises(ValueError, match="strictly positive"):
        pagerank(df, max_iters=3, weight_col="weight")


def test_damped_l1_monotone_tail(spark):
    arr = er_edges_numpy(100, 300, seed=9)
    res = pagerank(_edges_df(spark, arr), max_iters=15, tol=1e-12)
    # L1 deltas should be (weakly) decreasing after warmup
    tail = res.l1_history[3:]
    assert all(b <= a * 1.01 for a, b in zip(tail, tail[1:]))


def test_warm_start_incremental_refresh(spark):
    """Incremental refresh: after the edge table grows, warm-starting from
    the previous converged ranks reaches the SAME fixed point in fewer
    supersteps than a cold start (streaming-refresh story)."""
    v = 120
    arr1 = er_edges_numpy(v, 400, seed=31)
    arr2 = np.vstack([arr1, er_edges_numpy(v, 40, seed=32)])  # ~10% new edges
    arr2 = np.unique(arr2, axis=0)
    df1 = spark.createDataFrame([(int(s), int(d)) for s, d in arr1], "src long, dst long")
    df2 = spark.createDataFrame([(int(s), int(d)) for s, d in arr2], "src long, dst long")

    base = pagerank(df1, tol=1e-9, max_iters=200, check_every=3)
    assert base.converged
    cold = pagerank(df2, tol=1e-9, max_iters=200, check_every=1)
    warm = pagerank(df2, tol=1e-9, max_iters=200, check_every=1, init_ranks=base.ranks)
    assert cold.converged and warm.converged
    assert warm.iterations < cold.iterations  # near the new fixed point already
    g_cold = {r["id"]: r["rank"] for r in cold.ranks.collect()}
    g_warm = {r["id"]: r["rank"] for r in warm.ranks.collect()}
    for k in g_cold:
        assert abs(g_cold[k] - g_warm[k]) < 1e-6


def test_time_decayed_weights_match_oracle(spark):
    # recency-decayed PageRank is weighted PageRank with w = 2^(-age_weeks);
    # exact binary fractions keep per-edge weights bit-identical everywhere
    v, e = 80, 320
    arr = er_edges_numpy(v, e, seed=23)
    weeks = (arr[:, 0] * 7 + arr[:, 1]) % 5  # deterministic 0..4 "ages"
    weights = 1.0 / (1 << weeks)
    oracle, _ = weighted_damped_oracle(v, arr, weights.astype(float), tol=1e-9, max_iters=160)
    df = spark.createDataFrame(
        [(int(s), int(d), float(w)) for (s, d), w in zip(arr, weights)],
        "src long, dst long, weight double",
    )
    res = pagerank(df, max_iters=160, tol=1e-9, weight_col="weight", check_every=3)
    assert res.converged
    got = {r["id"]: r["rank"] for r in res.ranks.collect()}
    np.testing.assert_allclose(np.array([got[i] for i in range(v)]), oracle, atol=1e-6)
