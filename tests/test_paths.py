"""Multi-source SSSP/BFS (algos/paths.py) goldens: hand-checked fixture,
NumPy Bellman-Ford oracle on a random graph, frontier-vs-full-relaxation
round equivalence, and early-stop fixed-point identity."""

import numpy as np

from pagerank_spark.algos.paths import shortest_paths
from pagerank_spark.sources.graphs import er_edges_numpy


def _edges_df(spark, arr, weights=None):
    if weights is None:
        return spark.createDataFrame([(int(s), int(d)) for s, d in arr], "src long, dst long")
    return spark.createDataFrame(
        [(int(s), int(d), float(w)) for (s, d), w in zip(arr, weights)],
        "src long, dst long, weight double",
    )


def _sources_df(spark, ids):
    return spark.createDataFrame([(int(i),) for i in ids], "id long")


def _bellman_ford_numpy(v, arr, weights, sources, rounds):
    """dist after `rounds` full synchronized relaxation rounds (inf = unreached)."""
    dist = np.full(v, np.inf)
    dist[list(sources)] = 0.0
    for _ in range(rounds):
        nxt = dist.copy()
        for (s, d), w in zip(arr, weights):
            if dist[s] + w < nxt[d]:
                nxt[d] = dist[s] + w
        dist = nxt
    return dist


def test_bfs_hand_fixture(spark):
    # path 0->1->2->3 plus shortcut 0->3 and isolated-ish 4->5
    arr = np.array([[0, 1], [1, 2], [2, 3], [0, 3], [4, 5]], dtype=np.int64)
    out = shortest_paths(_edges_df(spark, arr), _sources_df(spark, [0]), max_iters=10)
    got = {r["id"]: r["dist"] for r in out.collect()}
    assert got == {0: 0.0, 1: 1.0, 2: 2.0, 3: 1.0}  # 4,5 unreached -> absent


def test_weighted_sssp_vs_numpy_oracle(spark):
    v, e = 80, 240
    arr = er_edges_numpy(v, e, seed=7)
    rng = np.random.default_rng(3)
    weights = rng.integers(1, 6, size=len(arr)).astype(float)  # int-valued: exact doubles
    sources = [0, 17, 44]
    golden = _bellman_ford_numpy(v, arr, weights, sources, rounds=v)  # full convergence
    out = shortest_paths(
        _edges_df(spark, arr, weights), _sources_df(spark, sources),
        weight_col="weight", max_iters=v,
    )
    got = {r["id"]: r["dist"] for r in out.collect()}
    for i in range(v):
        if np.isinf(golden[i]):
            assert i not in got
        else:
            assert got[i] == golden[i], f"vertex {i}: {got[i]} != {golden[i]}"


def test_frontier_rounds_equal_full_relaxation(spark):
    """After exactly k rounds the frontier-limited engine must equal full
    Bellman-Ford's <=k-edge prefix — the invariant the SQL oracle relies on."""
    v, e = 60, 150
    arr = er_edges_numpy(v, e, seed=11)
    weights = np.ones(len(arr))
    for k in (1, 2, 3):
        golden = _bellman_ford_numpy(v, arr, weights, [5], rounds=k)
        out = shortest_paths(_edges_df(spark, arr), _sources_df(spark, [5]), max_iters=k)
        got = {r["id"]: r["dist"] for r in out.collect()}
        reached = {i: golden[i] for i in range(v) if not np.isinf(golden[i])}
        assert got == reached


def test_early_stop_is_fixed_point(spark):
    """Converging early (empty frontier) equals running far more rounds."""
    arr = np.array([[0, 1], [1, 2]], dtype=np.int64)
    a = shortest_paths(_edges_df(spark, arr), _sources_df(spark, [0]), max_iters=3)
    b = shortest_paths(_edges_df(spark, arr), _sources_df(spark, [0]), max_iters=50)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_negative_weight_rejected(spark):
    arr = np.array([[0, 1]], dtype=np.int64)
    df = _edges_df(spark, arr, [-1.0])
    import pytest

    with pytest.raises(ValueError, match="negative"):
        shortest_paths(df, _sources_df(spark, [0]), weight_col="weight")


def test_temporal_reachability_delta_rejects_and_waits(spark):
    from pagerank_spark.algos.paths import temporal_reachability

    # 0 -(t=10)-> 1 -(t=15)-> 2 -(t=100)-> 3 : with delta=20, vertex 3 is
    # unreachable (waiting 85 > 20); 4 -(t=5)-> 5 arrives before seed 4 is
    # available (arrival 8 > 5) and must be rejected too
    edges = spark.createDataFrame(
        [(0, 1, 10), (1, 2, 15), (2, 3, 100), (4, 5, 5)],
        "src long, dst long, ts_us long",
    )
    seeds = spark.createDataFrame([(0, 0), (4, 8)], "id long, arrival_us long")
    got = {r.id: r.arrival_us for r in temporal_reachability(edges, seeds, delta_us=20).collect()}
    assert got == {0: 0, 1: 10, 2: 15, 4: 8}


def test_temporal_reachability_min_merge_and_rounds(spark):
    from pagerank_spark.algos.paths import temporal_reachability

    # two seeds race to vertex 2: the earlier time-respecting arrival wins
    edges = spark.createDataFrame(
        [(0, 2, 50), (1, 2, 30), (2, 3, 60)],
        "src long, dst long, ts_us long",
    )
    seeds = spark.createDataFrame([(0, 0), (1, 0)], "id long, arrival_us long")
    full = {r.id: r.arrival_us for r in temporal_reachability(edges, seeds, delta_us=100).collect()}
    assert full == {0: 0, 1: 0, 2: 30, 3: 60}
    # fixed 1 round == "earliest arrival using <= 1 temporal hop"
    one = {r.id: r.arrival_us for r in temporal_reachability(edges, seeds, delta_us=100, max_rounds=1).collect()}
    assert one == {0: 0, 1: 0, 2: 30}


def test_widest_paths_budget_exceeded_raises(spark):
    # Round-5 advice: an insufficient superstep budget must hard-error
    # (the bridges() contract), never silently return non-converged caps.
    import pytest

    from pagerank_spark.algos.paths import widest_paths

    # a 6-hop chain needs 6 relaxation rounds (+1 no-change round)
    edges = spark.createDataFrame(
        [(i, i + 1, 10 - i) for i in range(6)], "src long, dst long, weight long"
    )
    with pytest.raises(RuntimeError, match="fixpoint"):
        widest_paths(edges, source=0, max_iters=3)
    got = {r.id: r.cap for r in widest_paths(edges, source=0, max_iters=10).collect()}
    assert got[6] == 5 and got[1] == 10
