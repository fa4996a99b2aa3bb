"""Eigenvector centrality (algos/katz.py:eigenvector_centrality) vs a NumPy
power-iteration oracle."""

import numpy as np
from pyspark.sql import functions as F

from pagerank_spark.algos.katz import eigenvector_centrality


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, ["src", "dst"])


def _numpy_eig(pairs, n, iters):
    A = np.zeros((n, n))
    for s, d in pairs:
        A[s, d] += 1.0
    x = np.ones(n)
    for _ in range(iters):
        x = A.T @ x
    nrm = np.linalg.norm(x)
    return x / nrm if nrm else x


def test_eigenvector_matches_numpy_block_boundary(spark):
    rng = np.random.RandomState(7)
    pairs = [(int(a), int(b)) for a, b in rng.randint(0, 30, size=(200, 2)) if a != b]
    for iters, ce in [(4, 4), (6, 3)]:
        res = eigenvector_centrality(
            _edges(spark, pairs), max_iters=iters, tol=0.0, check_every=ce, num_partitions=4
        )
        got = {r["id"]: r["eig"] for r in res.scores.collect()}
        exp = _numpy_eig(pairs, 30, iters)
        ids = sorted(got)
        np.testing.assert_allclose(
            [got[i] for i in ids], [exp[i] for i in ids], atol=1e-9
        )


def test_eigenvector_cycle_uniform(spark):
    # a directed cycle: the principal eigenvector is uniform
    pairs = [(i, (i + 1) % 5) for i in range(5)]
    res = eigenvector_centrality(_edges(spark, pairs), max_iters=10, tol=1e-12, num_partitions=4)
    vals = [r["eig"] for r in res.scores.collect()]
    np.testing.assert_allclose(vals, [1 / np.sqrt(5)] * 5, atol=1e-9)
    assert res.converged


def test_eigenvector_dag_dies_to_zero(spark):
    # pure chain: A^T is nilpotent, the iterate is exactly zero after 3 steps
    pairs = [(0, 1), (1, 2), (2, 3)]
    res = eigenvector_centrality(_edges(spark, pairs), max_iters=8, tol=0.0, check_every=4, num_partitions=4)
    assert res.converged
    assert all(r["eig"] == 0.0 for r in res.scores.collect())
