"""Welch t + chi-square: SciPy-free closed-form replays on planted data."""

import math

from pagerank_spark.operators.hyptest import chi_square, welch_ttest


def _welch_py(xs, ys):
    na, nb = len(xs), len(ys)
    s1a, s2a = sum(xs), sum(x * x for x in xs)
    s1b, s2b = sum(ys), sum(y * y for y in ys)
    va = ((s2a - float(s1a) * s1a / na) / (na - 1)) / na
    vb = ((s2b - float(s1b) * s1b / nb) / (nb - 1)) / nb
    t = (float(s1a) / na - float(s1b) / nb) / math.sqrt(va + vb)
    dfw = (va + vb) * (va + vb) / (va * va / (na - 1) + vb * vb / (nb - 1))
    return round(t * 1e6), round(dfw * 1e6)


def test_welch_matches_replay(spark):
    xs = [10, 12, 14, 11, 13, 9, 15]          # variant A
    ys = [20, 25, 15, 30, 22]                 # variant B (higher mean, wider)
    rows = [("A", v) for v in xs] + [("B", v) for v in ys]
    df = spark.createDataFrame(rows, "variant string, v long")
    r = welch_ttest(df, "variant", "v", "A", "B").collect()[0]
    t_exp, df_exp = _welch_py(xs, ys)
    assert (r.n_a, r.n_b, r.sum_a, r.sum_b) == (7, 5, sum(xs), sum(ys))
    assert (r.sumsq_a, r.sumsq_b) == (sum(x * x for x in xs), sum(y * y for y in ys))
    assert (r.t_micro, r.df_micro) == (t_exp, df_exp)
    assert r.t_micro < 0  # A's mean is clearly below B's


def test_chi2_independent_and_dependent(spark):
    # perfectly independent 2x2: chi2 == 0
    rows = [("r1", "c1")] * 10 + [("r1", "c2")] * 10 + [("r2", "c1")] * 10 + [("r2", "c2")] * 10
    df = spark.createDataFrame(rows, "r string, c string")
    out = chi_square(df, "r", "c").collect()[0]
    assert (out.n_cells, out.n_rows_cat, out.n_cols_cat, out.total) == (4, 2, 2, 40)
    assert out.chi2_micro == 0
    # perfectly dependent 2x2 (diagonal): chi2 == n
    rows = [("r1", "c1")] * 15 + [("r2", "c2")] * 15
    out = chi_square(spark.createDataFrame(rows, "r string, c string"), "r", "c").collect()[0]
    # closed form: T * (sum o^2/(r*c) - 1) = 30 * (15^2/225 + 15^2/225 - 1) = 30
    assert out.n_cells == 2 and out.total == 30
    assert out.chi2_micro == 30_000_000


def test_plans_are_window_free(spark):
    rows = [("A", v) for v in (1, 2, 3)] + [("B", v) for v in (4, 5, 6)]
    df = spark.createDataFrame(rows, "variant string, v long")
    plan = welch_ttest(df, "variant", "v", "A", "B")._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # pure aggregation, no global-order operator
    rows = [("r", "c")] * 4
    plan = chi_square(spark.createDataFrame(rows, "r string, c string"), "r", "c")._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
