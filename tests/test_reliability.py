"""Reliability curve (operators/mleval.py::reliability_curve)."""

import pytest

from pagerank_spark.operators.mleval import reliability_curve


def test_reliability_equal_mass_and_rates(spark):
    # 100 rows, score = i, label = 1 iff i >= 50: perfectly separable
    rows = [(i, 1 if i >= 50 else 0) for i in range(100)]
    df = spark.createDataFrame(rows, ["score", "label"])
    got = {r["bin"]: r for r in reliability_curve(df, "score", "label", n_bins=4).collect()}
    assert set(got) == {0, 1, 2, 3}
    for b in got:
        assert got[b]["n"] == 25
    assert got[0]["pos_rate"] == 0.0 and got[1]["pos_rate"] == 0.0
    assert got[2]["pos_rate"] == 1.0 and got[3]["pos_rate"] == 1.0
    assert got[0]["mean_score"] == pytest.approx(sum(range(25)) / 25)


def test_reliability_ties_lump_low(spark):
    # all scores identical -> every row lands in bin 0
    df = spark.createDataFrame([(7, i % 2) for i in range(40)], ["score", "label"])
    rows = reliability_curve(df, "score", "label", n_bins=10).collect()
    assert len(rows) == 1 and rows[0]["bin"] == 0 and rows[0]["n"] == 40
    assert rows[0]["pos_rate"] == pytest.approx(0.5)


def test_reliability_sums_are_exact(spark):
    rows = [((i * 13) % 50, 1 if (i * 7) % 3 == 0 else 0) for i in range(200)]
    df = spark.createDataFrame(rows, ["score", "label"])
    got = reliability_curve(df, "score", "label", n_bins=5).collect()
    assert sum(r["n"] for r in got) == 200
    assert sum(r["pos"] for r in got) == sum(y for _, y in rows)
    assert sum(r["sum_score"] for r in got) == sum(s for s, _ in rows)
