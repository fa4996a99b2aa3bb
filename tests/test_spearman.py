"""Spearman rank correlation (operators/regress.py::spearman_corr)."""

import pytest

from pagerank_spark.operators.regress import spearman_corr


def _py_spearman(xs, ys):
    def avg_ranks(vals):
        s = sorted(vals)
        first = {}
        for idx, v in enumerate(s):
            first.setdefault(v, idx)
        cnt = {}
        for v in s:
            cnt[v] = cnt.get(v, 0) + 1
        return [first[v] + (cnt[v] + 1) / 2 for v in vals]

    rx, ry = avg_ranks(xs), avg_ranks(ys)
    n = len(xs)
    mx, my = sum(rx) / n, sum(ry) / n
    sxy = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    sxx = sum((a - mx) ** 2 for a in rx)
    syy = sum((b - my) ** 2 for b in ry)
    return sxy / (sxx**0.5 * syy**0.5)


def test_spearman_with_ties_matches_python(spark):
    rows = [(i, (i * 3) % 7, ((i * i) % 11) // 2) for i in range(120)]
    df = spark.createDataFrame(rows, ["id", "x", "y"])
    got = spearman_corr(df, "x", "y").collect()[0]
    want = _py_spearman([r[1] for r in rows], [r[2] for r in rows])
    assert got["n"] == 120
    assert got["spearman"] == pytest.approx(want, abs=1e-12)


def test_spearman_perfect_monotone(spark):
    # any strictly monotone transform gives exactly 1.0 (integer algebra)
    rows = [(i, i * i) for i in range(50)]
    df = spark.createDataFrame(rows, ["x", "y"])
    assert spearman_corr(df, "x", "y").collect()[0]["spearman"] == 1.0


def test_spearman_constant_is_null(spark):
    df = spark.createDataFrame([(i, 3) for i in range(10)], ["x", "y"])
    assert spearman_corr(df, "x", "y").collect()[0]["spearman"] is None
