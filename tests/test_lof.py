"""LOF: planted-outlier sanity + NumPy replay of the exact recipe."""

import numpy as np
import pytest

from pagerank_spark.operators.outliers import lof_scores


def _emb(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_planted_outlier_has_max_lof(spark):
    # tight cluster at the origin + one far point: the far point's LOF
    # dominates and the cluster stays near 1
    vecs = [[0.0, 0.0], [0.1, 0.0], [0.0, 0.1], [0.1, 0.1], [5.0, 5.0]]
    got = {r.vec_id: r.lof for r in lof_scores(_emb(spark, vecs), k=3).collect()}
    assert max(got, key=got.get) == 4
    assert got[4] > 3.0
    for i in range(4):
        assert got[i] == pytest.approx(1.0, abs=0.35)


def test_matches_numpy_replay(spark):
    rng = np.random.RandomState(7)
    vecs = rng.rand(12, 4).tolist()
    k = 3
    got = {r.vec_id: (r.kdist, r.lrd, r.lof) for r in lof_scores(_emb(spark, vecs), k=k).collect()}

    qv = np.floor(np.array([[float(np.float32(x)) for x in v] for v in vecs]) * 1024.0 + 0.5)
    n = len(vecs)
    d2 = ((qv[:, None, :] - qv[None, :, :]) ** 2).sum(axis=2)
    knn = {}
    for i in range(n):
        order = sorted((d2[i, j], j) for j in range(n) if j != i)[:k]
        knn[i] = order
    kdist = {i: np.sqrt(knn[i][-1][0]) for i in range(n)}
    lrd = {}
    for i in range(n):
        s = 0.0
        for dd, j in sorted(knn[i], key=lambda t: t[1]):
            s += max(kdist[j], np.sqrt(dd))
        lrd[i] = k / s
    for i in range(n):
        s = 0.0
        for _, j in sorted(knn[i], key=lambda t: t[1]):
            s += lrd[j]
        lof = s / (k * lrd[i])
        assert got[i][0] == pytest.approx(kdist[i], abs=1e-6)
        assert got[i][1] == pytest.approx(lrd[i], abs=1e-6)
        assert got[i][2] == pytest.approx(lof, abs=1e-6)
