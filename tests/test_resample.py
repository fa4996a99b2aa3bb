"""Gap-fill / resample (operators/temporal.py::resample_ffill)."""

import pytest

from pagerank_spark.operators.temporal import resample_ffill


def test_ffill_basic(spark):
    series = [("a", 3, 30), ("a", 6, 60), ("a", 8, 80), ("b", 1, 10)]
    df = spark.createDataFrame(series, ["k", "t", "x"])
    got = {(r["k"], r["t"]): (r["x"], r["was_missing"]) for r in resample_ffill(df, "k", "t", "x").collect()}
    # a spans 3..8 (6 rows), b spans 1..1
    assert len(got) == 7
    assert got[("a", 3)] == (30, 0)
    assert got[("a", 4)] == (30, 1)
    assert got[("a", 5)] == (30, 1)
    assert got[("a", 6)] == (60, 0)
    assert got[("a", 7)] == (60, 1)
    assert got[("a", 8)] == (80, 0)
    assert got[("b", 1)] == (10, 0)


def test_ffill_span_guard(spark):
    df = spark.createDataFrame([("a", 0, 1), ("a", 10_000, 2)], ["k", "t", "x"])
    with pytest.raises(ValueError, match="max_steps"):
        resample_ffill(df, "k", "t", "x", max_steps=100)


def test_ffill_no_gaps_is_identity(spark):
    series = [("a", t, t * 2) for t in range(5)]
    df = spark.createDataFrame(series, ["k", "t", "x"])
    rows = resample_ffill(df, "k", "t", "x").collect()
    assert len(rows) == 5 and all(r["was_missing"] == 0 for r in rows)
