"""PCA projection: exact NumPy replay of the integer-covariance pipeline
and direction sanity vs numpy.linalg.eigh."""

import numpy as np
import pytest

from pagerank_spark.operators.clustering import quantize_vectors
from pagerank_spark.operators.linalg import column_moments, pca_project


def _synth_embeddings(spark, n=80, d=6, scale=128):
    """Deterministic anisotropic cloud: dominant variance on a planted
    direction, integer-hash driven (no RNG)."""
    rows = []
    for r in range(n):
        h = [(r * 7919 + i * 104729) % 1000 / 1000.0 - 0.5 for i in range(d)]
        t = ((r * 2654435761) % 997) / 997.0 - 0.5
        vec = [h[i] * 0.3 + t * (2.5 if i < 2 else 0.0) for i in range(d)]
        rows.append((r, [float(x) for x in vec]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return quantize_vectors(df, scale=scale), rows


def _numpy_replay(rows, d, iters=12):
    x = np.array(
        [[int(np.floor(np.float32(v) * 128.0 + 0.5)) for v in vec] for _, vec in rows],
        dtype="int64",
    )
    n = len(rows)
    m = x.sum(axis=0)
    c = (n * (x.T @ x) - np.outer(m, m)).astype("float64")
    v = np.ones(d) / np.sqrt(d)
    for _ in range(iters):
        w = c @ v
        v = w / np.linalg.norm(w)
    score = ((n * x - m) @ v) / n * 1000.0
    return {int(rows[i][0]): int(np.floor(score[i] + 0.5)) for i in range(n)}


def test_pca_project_exact_numpy_replay(spark):
    q, rows = _synth_embeddings(spark)
    got = {r["vec_id"]: r["pc1_milli"] for r in pca_project(q).collect()}
    want = _numpy_replay(rows, d=6)
    # identical pipeline up to float addition order: milli grid must agree
    assert got == want


def test_pca_direction_matches_eigh(spark):
    q, rows = _synth_embeddings(spark)
    got = {r["vec_id"]: r["pc1_milli"] for r in pca_project(q).collect()}
    x = np.array(
        [[int(np.floor(np.float32(v) * 128.0 + 0.5)) for v in vec] for _, vec in rows],
        dtype="float64",
    )
    xc = x - x.mean(axis=0)
    _, vecs = np.linalg.eigh(xc.T @ xc)
    top = vecs[:, -1]
    ref = xc @ top
    eng = np.array([got[i] for i in range(len(rows))], dtype="float64")
    corr = abs(np.corrcoef(ref, eng)[0, 1])
    assert corr > 0.9999


def test_column_moments_exact(spark):
    q, rows = _synth_embeddings(spark, n=30)
    got = {r["i"]: r["m"] for r in column_moments(q).collect()}
    x = np.array(
        [[int(np.floor(np.float32(v) * 128.0 + 0.5)) for v in vec] for _, vec in rows],
        dtype="int64",
    )
    want = x.sum(axis=0)
    assert got == {i: int(want[i]) for i in range(6)}


@pytest.mark.parametrize("nparts", [1, 5])
def test_pca_partition_invariance(spark, nparts):
    q, _ = _synth_embeddings(spark, n=50)
    base = sorted(tuple(r) for r in pca_project(q).collect())
    got = sorted(tuple(r) for r in pca_project(q.repartition(nparts)).collect())
    assert got == base
