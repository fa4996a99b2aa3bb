"""Max-flow (algos/flow.py::max_flow) vs a pure-Python Ford-Fulkerson on
planted and irregular graphs, plus validation and the planted identity."""

import pytest
from pyspark.sql import functions as F


def _python_maxflow(edges, s, t):
    """BFS-augmenting reference (same algorithm, plain dicts)."""
    cap = {}
    adj = {}
    for u, v, c in edges:
        cap[(u, v)] = cap.get((u, v), 0) + c
        cap.setdefault((v, u), cap.get((v, u), 0))
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    total = 0
    while True:
        parent = {s: None}
        q = [s]
        while q and t not in parent:
            nq = []
            for u in q:
                for v in sorted(adj.get(u, ())):
                    if v not in parent and cap[(u, v)] > 0:
                        parent[v] = u
                        nq.append(v)
            q = nq
        if t not in parent:
            return total
        path = []
        cur = t
        while cur != s:
            path.append((parent[cur], cur))
            cur = parent[cur]
        f = min(cap[e] for e in path)
        for u, v in path:
            cap[(u, v)] -= f
            cap[(v, u)] += f
        total += f


def test_planted_layered_identity(spark):
    from pagerank_spark.algos.flow import max_flow
    from pagerank_spark.sources.graphs import synth_layered_flow

    edges = synth_layered_flow(spark)
    row = max_flow(edges, 0, 9).collect()[0]
    # min boundary: 35 (sink side) < 50 (source side) < 56 (middle)
    assert row["max_flow"] == 35
    assert row["augmentations"] >= 4  # bottleneck 35 over <=9-cap paths
    rows = [(r["src"], r["dst"], r["cap"]) for r in edges.collect()]
    assert _python_maxflow(rows, 0, 9) == 35


def test_irregular_graph_with_backflow(spark):
    from pagerank_spark.algos.flow import max_flow

    # the classic case where a later augmentation must push flow BACK
    # through an earlier path's edge (residual reverse arcs matter)
    edges = [
        (0, 1, 10), (0, 2, 10),
        (1, 3, 4), (1, 2, 2), (2, 4, 9),
        (3, 5, 10), (4, 3, 6), (4, 5, 10),
    ]
    df = spark.createDataFrame(edges, "src long, dst long, cap long")
    got = max_flow(df, 0, 5).collect()[0]["max_flow"]
    assert got == _python_maxflow(edges, 0, 5) == 13


def test_disconnected_and_validation(spark):
    from pagerank_spark.algos.flow import max_flow

    df = spark.createDataFrame([(0, 1, 5), (2, 3, 5)], "src long, dst long, cap long")
    row = max_flow(df, 0, 3).collect()[0]
    assert row["max_flow"] == 0 and row["augmentations"] == 0
    with pytest.raises(ValueError):
        max_flow(df, 1, 1)
    dup = spark.createDataFrame(
        [(0, 1, 5), (0, 1, 3)], "src long, dst long, cap long"
    )
    with pytest.raises(ValueError):
        max_flow(dup, 0, 1)


def test_min_cut_duality_and_canonicality(spark):
    from pagerank_spark.algos.flow import max_flow, min_cut
    from pagerank_spark.sources.graphs import synth_layered_flow

    edges = synth_layered_flow(spark)
    cut = sorted(tuple(r) for r in min_cut(edges, 0, 9).collect())
    # duality: cut capacities sum to the max flow
    assert sum(c for _, _, c in cut) == 35
    # canonical cut = the sink boundary, caps from the generator rule
    assert cut == [(b, 9, 6 + (b * 5) % 7) for b in range(5, 9)]


def test_min_cut_backflow_graph(spark):
    from pagerank_spark.algos.flow import min_cut

    edges = [
        (0, 1, 10), (0, 2, 10),
        (1, 3, 4), (1, 2, 2), (2, 4, 9),
        (3, 5, 10), (4, 3, 6), (4, 5, 10),
    ]
    df = spark.createDataFrame(edges, "src long, dst long, cap long")
    cut = sorted(tuple(r) for r in min_cut(df, 0, 5).collect())
    assert sum(c for _, _, c in cut) == 13
    # reachable side after saturation is {0, 1, 2}: cut = (1,3) and (2,4)
    assert cut == [(1, 3, 4), (2, 4, 9)]


def test_path_extraction_collect_budget(spark, monkeypatch):
    # Round-5: the parent-chain walk used to issue one collect PER HOP
    # (O(depth) driver round-trips per augmentation). With pointer-doubling
    # extraction, collects per augmentation = BFS level probes + ONE
    # path-sized collect. On a depth-10 chain with one augmentation the old
    # shape needed >= 2*depth collects; assert the new budget.
    from pyspark.sql import DataFrame

    from pagerank_spark.algos.flow import max_flow

    calls = {"n": 0}
    orig = DataFrame.collect

    def counting(self):
        calls["n"] += 1
        return orig(self)

    monkeypatch.setattr(DataFrame, "collect", counting)
    edges = spark.createDataFrame(
        [(i, i + 1, 7) for i in range(10)], "src long, dst long, cap long"
    )
    got = max_flow(edges, 0, 10).collect()[0]
    assert (got.max_flow, got.augmentations) == (7, 1)
    # 10 BFS level probes + 1 path collect + 1 empty-BFS probe + 1 result
    # collect, plus small constant slack — far below the old 2*depth+
    assert calls["n"] <= 16, calls["n"]


def test_pointer_doubling_branch_parity(spark, monkeypatch):
    # Force the distributed extraction path (normally taken only for
    # BFS trees past the driver-collect bound) and assert it reproduces
    # the collected-map result on a backflow graph.
    from pagerank_spark.algos import flow as flowmod

    monkeypatch.setattr(flowmod, "_PARENT_MAP_COLLECT_MAX", 0)
    edges = [
        (0, 1, 10), (0, 2, 10),
        (1, 3, 4), (1, 2, 2), (2, 4, 9),
        (3, 5, 10), (4, 3, 6), (4, 5, 10),
    ]
    df = spark.createDataFrame(edges, "src long, dst long, cap long")
    got = flowmod.max_flow(df, 0, 5).collect()[0]
    assert got.max_flow == 13
    cut = sorted(tuple(r) for r in flowmod.min_cut(df, 0, 5).collect())
    assert cut == [(1, 3, 4), (2, 4, 9)]
