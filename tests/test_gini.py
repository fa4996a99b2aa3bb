"""Gini concentration (operators/profile.py::gini_concentration)."""

import pytest

from pagerank_spark.operators.profile import gini_concentration


def _py_gini(xs):
    s = sorted(xs)
    n, tot = len(s), sum(s)
    si = sum((i + 1) * x for i, x in enumerate(s))
    return (2 * si - (n + 1) * tot) / (n * tot)


def test_gini_matches_python(spark):
    xs = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5]
    df = spark.createDataFrame([(i, x) for i, x in enumerate(xs)], ["id", "x"])
    row = gini_concentration(df, "x", "id").collect()[0]
    assert row["n"] == len(xs) and row["total"] == sum(xs)
    assert row["gini"] == pytest.approx(_py_gini(xs), abs=1e-12)


def test_gini_perfect_equality_and_concentration(spark):
    eq = spark.createDataFrame([(i, 7) for i in range(100)], ["id", "x"])
    assert gini_concentration(eq, "x", "id").collect()[0]["gini"] == pytest.approx(0.0, abs=1e-12)
    conc = spark.createDataFrame([(0, 1000)] + [(i, 0) for i in range(1, 100)], ["id", "x"])
    # one holder of everything: G = (n-1)/n
    assert gini_concentration(conc, "x", "id").collect()[0]["gini"] == pytest.approx(0.99, abs=1e-12)


def test_gini_zero_total_is_null(spark):
    df = spark.createDataFrame([(i, 0) for i in range(5)], ["id", "x"])
    assert gini_concentration(df, "x", "id").collect()[0]["gini"] is None


def test_gini_tie_handling_is_order_free(spark):
    # duplicated values: any rank assignment among ties gives the same G
    xs = [5] * 6 + [1] * 4
    df = spark.createDataFrame([(i, x) for i, x in enumerate(xs)], ["id", "x"])
    a = gini_concentration(df.repartition(7), "x", "id").collect()[0]["gini"]
    assert a == pytest.approx(_py_gini(xs), abs=1e-12)


def test_lorenz_curve_hand_values(spark):
    from pagerank_spark.operators.profile import lorenz_curve

    # values 10, 20, 30, 40 (total 100): bottom 25% -> 10%, 50% -> 30%, ...
    df = spark.createDataFrame([(10,), (20,), (30,), (40,)], "v long")
    got = {r.point: (r.k, r.cum_value, r.share_micro)
           for r in lorenz_curve(df, "v", n_points=4).collect()}
    assert got[1] == (1, 10, 100_000)
    assert got[2] == (2, 30, 300_000)
    assert got[3] == (3, 60, 600_000)
    assert got[4] == (4, 100, 1_000_000)


def test_lorenz_curve_ties_and_validation(spark):
    import pytest

    from pagerank_spark.operators.profile import lorenz_curve

    # all-equal values: the curve is the diagonal (perfect equality)
    df = spark.createDataFrame([(5,)] * 10, "v long")
    got = {r.point: r.share_micro for r in lorenz_curve(df, "v", n_points=5).collect()}
    assert got == {i: i * 200_000 for i in range(1, 6)}
    with pytest.raises(ValueError):
        lorenz_curve(spark.createDataFrame([(-1,)], "v long"), "v").collect()
