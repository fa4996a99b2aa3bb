"""Exact kNN graph (operators/similarity.py::knn_graph)."""

import numpy as np
import pytest

from pagerank_spark.operators.similarity import knn_graph


def _mk(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    )


def test_knn_matches_numpy(spark):
    rng = np.random.RandomState(3)
    vecs = rng.randn(20, 8)
    got = {}
    for r in knn_graph(_mk(spark, vecs), k=2).collect():
        got.setdefault(r["vec_id"], []).append((r["rank"], r["neighbor"]))
    q = np.floor(vecs.astype(np.float32).astype(float) * 1024.0 + 0.5)
    for i in range(20):
        cands = []
        for j in range(20):
            if i == j:
                continue
            cos = float(q[i] @ q[j]) / (np.sqrt(float(q[i] @ q[i])) * np.sqrt(float(q[j] @ q[j])))
            cands.append((-cos, j))
        want = [j for _, j in sorted(cands)[:2]]
        assert [n for _, n in sorted(got[i])] == want, i


def test_knn_excludes_zero_norm(spark):
    vecs = [[1.0, 0.0], [0.9, 0.1], [0.0, 0.0], [0.5, 0.5]]
    rows = knn_graph(_mk(spark, vecs), k=3).collect()
    ids = {r["vec_id"] for r in rows}
    nbrs = {r["neighbor"] for r in rows}
    assert 2 not in ids and 2 not in nbrs
    # the 3 live vectors each get only 2 neighbors
    assert all(sum(1 for r in rows if r["vec_id"] == i) == 2 for i in ids)


def test_knn_symmetric_duplicate_is_rank1(spark):
    vecs = [[1.0, 2.0], [1.0, 2.0], [-2.0, 1.0]]
    rows = {(r["vec_id"], r["rank"]): r for r in knn_graph(_mk(spark, vecs), k=1).collect()}
    assert rows[(0, 1)]["neighbor"] == 1 and rows[(0, 1)]["cos"] == pytest.approx(1.0)
    assert rows[(1, 1)]["neighbor"] == 0
