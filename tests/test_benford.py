"""Benford first-digit test (operators/hyptest.py::benford_test)."""

import math

import pytest

from pagerank_spark.operators.hyptest import benford_test


def test_benford_matches_python(spark):
    vals = [(v,) for v in [1, 19, 23, 23, 345, 4007, 5, 60, 61, 700, 8123, 92, 9]]
    df = spark.createDataFrame(vals, ["v"])
    got = {r["digit"]: r for r in benford_test(df, "v").collect()}
    n = len(vals)
    obs = {d: 0 for d in range(1, 10)}
    for (v,) in vals:
        obs[int(str(v)[0])] += 1
    assert set(got) == set(range(1, 10))
    for d in range(1, 10):
        exp = n * math.log10(1 + 1 / d)
        assert got[d]["observed"] == obs[d]
        assert got[d]["expected"] == pytest.approx(exp, abs=5e-7)
        assert got[d]["term"] == pytest.approx((obs[d] - exp) ** 2 / exp, abs=5e-7)


def test_benford_ignores_nonpositive_and_fills_zero_digits(spark):
    df = spark.createDataFrame([(0,), (-5,), (111,), (12,)], ["v"])
    got = {r["digit"]: r["observed"] for r in benford_test(df, "v").collect()}
    assert got[1] == 2 and sum(got.values()) == 2
    assert all(got[d] == 0 for d in range(2, 10))


def test_benford_detects_benford_sample(spark):
    # powers of 2 are classically Benford-ish: terms stay small vs uniform
    pows = [(2**k,) for k in range(1, 60)]
    unif = [(10_000 + 137 * k,) for k in range(59)]  # all start with 1
    t_pow = sum(r["term"] for r in benford_test(spark.createDataFrame(pows, ["v"]), "v").collect())
    t_unif = sum(r["term"] for r in benford_test(spark.createDataFrame(unif, ["v"]), "v").collect())
    assert t_pow < t_unif
