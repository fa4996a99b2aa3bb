"""KMV sketch: exact-below-k behavior + estimate accuracy on planted sets."""

import pytest
from pyspark.sql import functions as F

from pagerank_spark.operators.sketches import kmv_build, kmv_set_ops


def test_below_k_is_exact(spark):
    rows = [("a", v) for v in range(10)] + [("b", v) for v in range(5, 15)]
    df = spark.createDataFrame(rows, "key string, v long")
    sk = kmv_build(df, "key", "v", k=64)
    got = {r.key: r.n_kept for r in sk.collect()}
    assert got == {"a": 10, "b": 10}
    ops = kmv_set_ops(sk, k=64).collect()[0]
    # everything under k: estimates are exact set sizes
    assert (ops.est_a, ops.est_b, ops.est_union, ops.est_intersect) == (10, 10, 15, 5)
    assert ops.n_common == 5


def test_estimate_accuracy_above_k(spark):
    # two overlapping 3000-element sets, k=256: relative error ~1/sqrt(k)
    n, ov = 3000, 1500
    rows = [("a", v) for v in range(n)] + [("b", v) for v in range(n - ov, 2 * n - ov)]
    df = spark.createDataFrame(rows, "key string, v long")
    ops = kmv_set_ops(kmv_build(df, "key", "v", k=256), k=256).collect()[0]
    assert ops.est_a == pytest.approx(n, rel=0.25)
    assert ops.est_b == pytest.approx(n, rel=0.25)
    assert ops.est_union == pytest.approx(2 * n - ov, rel=0.25)
    assert ops.est_intersect == pytest.approx(ov, rel=0.4)


def test_sketch_is_sorted_k_min(spark):
    df = spark.createDataFrame([("a", v) for v in range(500)], "key string, v long")
    sk = kmv_build(df, "key", "v", k=16).collect()[0]
    hs = sorted((v * 2654435761) % 4294967296 for v in range(500))[:16]
    assert sk.sketch == hs
