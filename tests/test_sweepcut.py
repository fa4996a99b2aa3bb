"""Sweep cut: exact pure-Python replay + spectral bisection end-to-end."""

import itertools

import pyspark.sql.functions as F
import pytest

from pagerank_spark.algos.spectral import fiedler_vector
from pagerank_spark.algos.sweepcut import sweep_cut


def _two_cliques(spark, bridge=((5, 10),)):
    """Two K6 cliques {0..5} and {10..15} plus bridge edges."""
    edges = [
        (a, b) for a, b in itertools.combinations(range(6), 2)
    ] + [(a, b) for a, b in itertools.combinations(range(10, 16), 2)]
    edges += list(bridge)
    return spark.createDataFrame(edges, "src long, dst long"), edges


def _python_sweep(edges, scores):
    """Reference O(n * m) sweep over the undirected simple graph."""
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    deg = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    order = sorted(deg, key=lambda v: (scores[v], v))
    m2 = sum(deg.values())
    out = []
    prefix = set()
    vol = 0
    for k, v in enumerate(order, start=1):
        prefix.add(v)
        vol += deg[v]
        if m2 - vol <= 0:
            break
        cut = sum(1 for a, b in und if (a in prefix) != (b in prefix))
        out.append((k, v, cut, vol, cut * 1000000 // min(vol, m2 - vol)))
    return out


def test_sweep_cut_exact_replay(spark):
    g, edges = _two_cliques(spark)
    scores = spark.createDataFrame(
        [(v, v) for v in set(a for e in edges for a in e)], "id long, score long"
    )
    got = sorted(
        tuple(r) for r in sweep_cut(g, scores).select(
            "k", "id", "cut", "vol", "phi_micro"
        ).collect()
    )
    assert got == sorted(_python_sweep(edges, {v: v for v, _ in scores.collect()}))


def test_sweep_cut_duplicate_and_self_edges_ignored(spark):
    g, edges = _two_cliques(spark)
    noisy = g.unionByName(g).unionByName(
        spark.createDataFrame([(3, 3), (12, 12)], "src long, dst long")
    )
    scores = spark.createDataFrame(
        [(v, v) for v in set(a for e in edges for a in e)], "id long, score long"
    )
    a = sorted(tuple(r) for r in sweep_cut(g, scores).collect())
    b = sorted(tuple(r) for r in sweep_cut(noisy, scores).collect())
    assert a == b


def test_spectral_sweep_finds_the_bridge(spark):
    g, edges = _two_cliques(spark)
    fied = fiedler_vector(g, max_iters=12).scores.select(
        "id", F.round(F.col("fiedler") * 1e6).cast("long").alias("score")
    )
    curve = sweep_cut(g, fied).collect()
    best = min(curve, key=lambda r: (r["phi_micro"], r["k"]))
    # the min-conductance prefix is exactly one clique: cut=1 (the bridge),
    # vol = 6 choose 2 * 2 + 1 = 31, phi = 1e6 // 31
    assert best["k"] == 6
    assert best["cut"] == 1
    assert best["vol"] == 31
    assert best["phi_micro"] == 1000000 // 31
    prefix = {r["id"] for r in curve if r["k"] <= 6}
    assert prefix in ({0, 1, 2, 3, 4, 5}, {10, 11, 12, 13, 14, 15})


@pytest.mark.parametrize("nparts", [2, 7])
def test_sweep_cut_partition_invariance(spark, nparts):
    g, edges = _two_cliques(spark, bridge=((5, 10), (4, 11), (0, 15)))
    scores = spark.createDataFrame(
        [(v, (v * 7919) % 101) for v in set(a for e in edges for a in e)],
        "id long, score long",
    )
    base = sorted(tuple(r) for r in sweep_cut(g, scores, num_partitions=4).collect())
    got = sorted(
        tuple(r)
        for r in sweep_cut(g.repartition(nparts), scores, num_partitions=nparts).collect()
    )
    assert got == base == sorted(
        _python_sweep(edges, {v: s for v, s in scores.collect()})
    )
