"""Batched multi-seed PPR (algos/ppr.py) vs NumPy and vs the single-seed
personalized pagerank path."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pagerank_spark.algos.ppr import multi_ppr


def _numpy_ppr(pairs, n, seed, d, iters):
    out = {}
    for s, t in pairs:
        out.setdefault(s, []).append(t)
    r = np.zeros(n)
    r[seed] = 1.0
    e = np.zeros(n)
    e[seed] = 1.0
    for _ in range(iters):
        nr = (1 - d) * e
        dm = 0.0
        for v in range(n):
            if v in out:
                for t in out[v]:
                    nr[t] += d * r[v] / len(out[v])
            else:
                dm += r[v]
        nr += d * dm * e
        r = nr
    return r


def test_multi_ppr_matches_numpy_per_seed(spark):
    rng = np.random.RandomState(2)
    pairs = list({(int(a), int(b)) for a, b in rng.randint(0, 15, size=(40, 2)) if a != b})
    edges = spark.createDataFrame(pairs, ["src", "dst"])
    seed_ids = [0, 3, 7]
    seeds = spark.createDataFrame([(s,) for s in seed_ids], ["id"])
    res = multi_ppr(edges, seeds, iters=4, num_partitions=4)
    got = {(r["seed"], r["id"]): r["rank"] for r in res.ranks.collect()}
    for s in seed_ids:
        exp = _numpy_ppr(pairs, 15, s, 0.85, 4)
        for v in range(15):
            assert abs(got.get((s, v), 0.0) - exp[v]) < 1e-12, (s, v)
        # mass conservation per seed
        assert abs(sum(r for (ss, _), r in got.items() if ss == s) - 1.0) < 1e-12


def test_multi_ppr_matches_single_seed_pagerank(spark):
    from pagerank_spark.algos.pagerank import pagerank

    rng = np.random.RandomState(8)
    pairs = list({(int(a), int(b)) for a, b in rng.randint(0, 20, size=(60, 2)) if a != b})
    edges = spark.createDataFrame(pairs, ["src", "dst"])
    seeds = spark.createDataFrame([(5,)], ["id"])
    got = {
        r["id"]: r["rank"]
        for r in multi_ppr(edges, seeds, iters=6, num_partitions=4).ranks.collect()
    }
    ref = pagerank(
        edges, teleport=seeds, max_iters=6, tol=0.0, check_every=3, num_partitions=4
    )
    for r in ref.ranks.collect():
        assert abs(got.get(r["id"], 0.0) - r["rank"]) < 1e-9, r["id"]


def test_multi_ppr_unknown_seed_raises(spark):
    edges = spark.createDataFrame([(0, 1)], ["src", "dst"])
    seeds = spark.createDataFrame([(99,)], ["id"])
    with pytest.raises(ValueError, match="not graph vertices"):
        multi_ppr(edges, seeds, iters=1, num_partitions=4)


def test_multi_ppr_state_stays_sparse(spark):
    # long directed chain: after k iters, seed mass reaches only k+1 vertices
    pairs = [(i, i + 1) for i in range(30)]
    edges = spark.createDataFrame(pairs, ["src", "dst"])
    seeds = spark.createDataFrame([(0,)], ["id"])
    res = multi_ppr(edges, seeds, iters=3, num_partitions=4)
    rows = res.ranks.collect()
    assert {r["id"] for r in rows} == {0, 1, 2, 3}
