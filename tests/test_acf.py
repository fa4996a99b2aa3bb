"""Exact autocorrelation (operators/temporal.py::autocorrelation)."""

import pytest

from pagerank_spark.operators.temporal import autocorrelation


def _py_acf(series, max_lag):
    d = dict(series)
    n = len(series)
    mean = sum(d.values()) / n
    den = sum((v - mean) ** 2 for v in d.values())
    out = {}
    for k in range(1, max_lag + 1):
        pairs = [(d[t], d[t + k]) for t in d if t + k in d]
        num = sum((a - mean) * (b - mean) for a, b in pairs)
        out[k] = (len(pairs), num / den if den else None)
    return out


def test_acf_matches_python(spark):
    series = [(t, (t * 13) % 29 + (t % 7) * 3) for t in range(80)]
    df = spark.createDataFrame(series, ["t", "x"])
    got = {r["lag"]: (r["n_pairs"], r["acf"]) for r in autocorrelation(df, "t", "x", 5).collect()}
    want = _py_acf(series, 5)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1], abs=1e-12)


def test_acf_with_gaps(spark):
    # missing t=3,4: lag-1 pairs drop to (0,1),(1,2),(5,6) etc.
    series = [(t, t % 5) for t in range(20) if t not in (3, 4)]
    df = spark.createDataFrame(series, ["t", "x"])
    got = {r["lag"]: (r["n_pairs"], r["acf"]) for r in autocorrelation(df, "t", "x", 3).collect()}
    want = _py_acf(series, 3)
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1], abs=1e-12)


def test_acf_constant_series_null(spark):
    df = spark.createDataFrame([(t, 7) for t in range(10)], ["t", "x"])
    for r in autocorrelation(df, "t", "x", 2).collect():
        assert r["acf"] is None


def test_acf_perfect_period(spark):
    # period-2 alternating series: acf(2) == 1, acf(1) < 0
    df = spark.createDataFrame([(t, 1 if t % 2 else 3) for t in range(40)], ["t", "x"])
    got = {r["lag"]: r["acf"] for r in autocorrelation(df, "t", "x", 2).collect()}
    assert got[2] == pytest.approx(_py_acf([(t, 1 if t % 2 else 3) for t in range(40)], 2)[2][1])
    assert got[1] < 0 < got[2]
