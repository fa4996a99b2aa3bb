"""Nearest-centroid classifier (operators/classify.py::nearest_centroid)."""

import pytest

from pagerank_spark.operators.classify import nearest_centroid


def _mk(spark, rows):
    return spark.createDataFrame(rows, ["vec_id", "embedding", "label"])


def test_centroid_separable_clusters(spark):
    # two tight clusters around (1,0) and (0,1)
    train = _mk(
        spark,
        [
            (1, [1.0, 0.1], 0),
            (2, [0.9, 0.0], 0),
            (3, [1.1, -0.1], 0),
            (4, [0.0, 1.0], 1),
            (5, [0.1, 0.9], 1),
        ],
    )
    test = _mk(spark, [(10, [0.95, 0.05], 9), (11, [0.05, 1.05], 9)])
    got = {r["vec_id"]: r for r in nearest_centroid(train, test).collect()}
    assert got[10]["pred"] == 0 and got[11]["pred"] == 1
    assert got[10]["label_true"] == 9  # true label passes through untouched


def test_centroid_matches_numpy(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    train_rows = [
        (i, [float(x) for x in rng.randn(4) + (i % 3)], i % 3) for i in range(30)
    ]
    test_rows = [
        (100 + i, [float(x) for x in rng.randn(4) + (i % 3)], i % 3) for i in range(9)
    ]
    got = {
        r["vec_id"]: r["pred"]
        for r in nearest_centroid(_mk(spark, train_rows), _mk(spark, test_rows)).collect()
    }
    # numpy replay on the SAME quantized grid
    q = lambda v: np.floor(np.array(v, dtype=float) * 1024.0 + 0.5)
    cents = {}
    for c in range(3):
        vs = [q(v) for _, v, lab in train_rows if lab == c]
        cents[c] = (np.sum(vs, axis=0), len(vs))
    for vid, vec, _ in test_rows:
        x = q(vec)
        dists = {
            c: float(np.sum((n * x - s) ** 2)) / (n * n) for c, (s, n) in cents.items()
        }
        want = min(sorted(dists), key=lambda c: (dists[c], c))
        assert got[vid] == want


def test_centroid_tiebreak_lowest_label(spark):
    # equidistant point between two singleton classes -> label 0 wins
    train = _mk(spark, [(1, [1.0, 0.0], 5), (2, [-1.0, 0.0], 3)])
    test = _mk(spark, [(9, [0.0, 0.5], 0)])
    assert nearest_centroid(train, test).collect()[0]["pred"] == 3
