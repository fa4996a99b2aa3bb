"""Isotonic regression (operators/regress.py::isotonic_fit)."""

from fractions import Fraction

import pytest

from pagerank_spark.operators.regress import isotonic_fit


def _py_pav(pairs):
    """Exact-rational pool-adjacent-violators over (x, y) rows."""
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0])
    for x, y in pairs:
        agg[x][0] += y
        agg[x][1] += 1
    xs = sorted(agg)
    blocks = []  # (sum, count, [xs])
    for x in xs:
        s, c = agg[x]
        blocks.append([s, c, [x]])
        while len(blocks) > 1 and Fraction(blocks[-2][0], blocks[-2][1]) >= Fraction(
            blocks[-1][0], blocks[-1][1]
        ):
            s2, c2, m2 = blocks.pop()
            blocks[-1][0] += s2
            blocks[-1][1] += c2
            blocks[-1][2] += m2
    out = {}
    for s, c, members in blocks:
        for x in members:
            out[x] = Fraction(s, c)
    return out


def _check(spark, pairs):
    df = spark.createDataFrame(pairs, ["x", "y"])
    got = {r["x"]: (r["n"], r["fit"]) for r in isotonic_fit(df, "x", "y").collect()}
    want = _py_pav(pairs)
    assert set(got) == set(want)
    fits = []
    for x in sorted(want):
        assert got[x][1] == pytest.approx(float(want[x]), rel=1e-12, abs=1e-12)
        fits.append(got[x][1])
    assert fits == sorted(fits)  # monotone non-decreasing
    return got


def test_isotonic_violators_pool(spark):
    _check(spark, [(1, 10), (2, 0), (3, 20), (4, 5), (5, 30)])


def test_isotonic_already_monotone_is_identity(spark):
    got = _check(spark, [(1, 1), (2, 4), (3, 9), (4, 16)])
    assert [got[x][1] for x in (1, 2, 3, 4)] == [1.0, 4.0, 9.0, 16.0]


def test_isotonic_decreasing_pools_to_grand_mean(spark):
    got = _check(spark, [(1, 30), (2, 20), (3, 10)])
    assert all(v == pytest.approx(20.0) for _, v in got.values())


def test_isotonic_with_ties_and_repeats(spark):
    _check(spark, [(1, 5), (1, 7), (2, 2), (2, 2), (3, 9), (3, 1), (4, 4)])
