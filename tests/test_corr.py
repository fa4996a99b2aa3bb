"""Pearson correlation matrix (operators/regress.py::corr_matrix)."""

import numpy as np
import pytest

from pagerank_spark.operators.regress import corr_matrix


def test_corr_matches_numpy(spark):
    rng = [(i, (i * 7) % 13, (i * i) % 17, 5) for i in range(200)]
    df = spark.createDataFrame(rng, ["a", "b", "c", "k"])
    got = {(r["col_a"], r["col_b"]): r["corr"] for r in corr_matrix(df, ["a", "b", "c"]).collect()}
    arr = np.array([row[:3] for row in rng], dtype=float)
    want = np.corrcoef(arr, rowvar=False)
    cols = ["a", "b", "c"]
    assert len(got) == 3
    for i in range(3):
        for j in range(i + 1, 3):
            assert got[(cols[i], cols[j])] == pytest.approx(want[i, j], abs=1e-12)


def test_corr_constant_column_is_null(spark):
    df = spark.createDataFrame([(i, 5) for i in range(10)], ["a", "k"])
    rows = corr_matrix(df, ["a", "k"]).collect()
    assert len(rows) == 1 and rows[0]["corr"] is None


def test_corr_is_repartition_stable(spark):
    rows = [(i, (i * 31 + 7) % 101) for i in range(500)]
    df = spark.createDataFrame(rows, ["x", "y"])
    a = corr_matrix(df.repartition(1), ["x", "y"]).collect()[0]["corr"]
    b = corr_matrix(df.repartition(13), ["x", "y"]).collect()[0]["corr"]
    # exact integer moments -> bit-identical double either way
    assert a == b


def test_grouped_trend_matches_numpy(spark):
    import numpy as np

    from pagerank_spark.operators.regress import grouped_trend

    rows = []
    for k in range(3):
        for i in range(30):
            t = i * 2 + k
            rows.append((k, t, 5 * t + k * 100 + (i * 7) % 11))
    df = spark.createDataFrame(rows, ["k", "t", "x"])
    got = {r["key"]: (r["slope"], r["intercept"]) for r in grouped_trend(df, "k", "t", "x").collect()}
    for k in range(3):
        ts = np.array([t for kk, t, _ in rows if kk == k], dtype=float)
        xs = np.array([x for kk, _, x in rows if kk == k], dtype=float)
        slope, intercept = np.polyfit(ts, xs, 1)
        assert got[k][0] == pytest.approx(slope, rel=1e-9)
        assert got[k][1] == pytest.approx(intercept, rel=1e-9)


def test_grouped_trend_single_timestamp_null(spark):
    from pagerank_spark.operators.regress import grouped_trend

    df = spark.createDataFrame([(1, 5, 10), (1, 5, 20)], ["k", "t", "x"])
    row = grouped_trend(df, "k", "t", "x").collect()[0]
    assert row["slope"] is None and row["intercept"] is None
