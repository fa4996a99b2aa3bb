"""k-truss peeling (algos/truss.py) vs a pure-Python peeling oracle."""

from itertools import combinations

from pyspark.sql import functions as F

from pagerank_spark.algos.truss import k_truss


def _py_truss(pairs, k):
    e = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    while True:
        adj = {}
        for a, b in e:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        sup = {ed: len(adj[ed[0]] & adj[ed[1]]) for ed in e}
        kept = {ed for ed in e if sup[ed] >= k - 2}
        if kept == e:
            return {ed: sup[ed] for ed in e}
        e = kept


def _run(spark, pairs, k):
    df = spark.createDataFrame(pairs, ["src", "dst"])
    res = k_truss(df, k, num_partitions=4)
    assert res.converged
    return {(r["a"], r["b"]): r["support"] for r in res.edges.collect()}, res


def test_k4_truss_peels_pendant_triangles(spark):
    # K4 on {0,1,2,3} plus a pendant triangle (3,4,5): the 4-truss is K4
    k4 = [list(p) for p in combinations(range(4), 2)]
    extra = [[3, 4], [4, 5], [3, 5]]
    got, res = _run(spark, k4 + extra, 4)
    exp = _py_truss(k4 + extra, 4)
    assert got == exp
    assert set(got) == {tuple(p) for p in k4}
    assert all(s == 2 for s in got.values())
    assert res.rounds >= 1


def test_truss_matches_python_on_random_graph(spark):
    import random

    rng = random.Random(5)
    pairs = list({tuple(sorted((rng.randrange(18), rng.randrange(18)))) for _ in range(90)})
    pairs = [list(p) for p in pairs if p[0] != p[1]]
    for k in (3, 4, 5):
        got, _ = _run(spark, pairs, k)
        assert got == _py_truss(pairs, k), f"k={k}"


def test_truss_cascade_needs_multiple_rounds(spark):
    # chain of triangles sharing edges: removing the tail triangle drops
    # support of the next, forcing a cascade (multi-round peel)
    tris = [(0, 1, 2), (1, 2, 3), (2, 3, 4), (3, 4, 5)]
    pairs = sorted({tuple(sorted(p)) for t in tris for p in combinations(t, 2)})
    got, res = _run(spark, [list(p) for p in pairs], 4)
    assert got == _py_truss(pairs, 4)
    assert res.rounds >= 2  # the cascade cannot resolve in one round


def test_truss_empty_and_triangle_free(spark):
    got, res = _run(spark, [[0, 1], [1, 2], [2, 3]], 3)
    assert got == {}  # triangle-free graph has an empty 3-truss
