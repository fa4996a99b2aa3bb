"""Welch t + chi-square + Mann-Kendall: SciPy-free closed-form replays."""

import math

from pagerank_spark.operators.hyptest import chi_square, mann_kendall, welch_ttest


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


def _mk_py(series):
    """Pure-Python Mann-Kendall: (n, S, 18*Var(S)) over a (t, x) list."""
    series = sorted(series)
    xs = [x for _, x in series]
    n = len(xs)
    s = sum(
        (1 if xs[j] > xs[i] else -1 if xs[j] < xs[i] else 0)
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    tie = sum(tp * (tp - 1) * (2 * tp + 5) for tp in Counter(xs).values())
    return n, s, n * (n - 1) * (2 * n + 5) - tie


def test_mann_kendall_matches_replay(spark):
    up = [(t, 10 + 3 * t + (t % 2)) for t in range(12)]          # rising trend
    flat = [(t, 7) for t in range(9)]                            # all ties
    mixed = [(0, 5), (1, 9), (2, 5), (3, 2), (4, 9), (5, 1)]     # ties + noise
    rows = (
        [("up", t, x) for t, x in up]
        + [("flat", t, x) for t, x in flat]
        + [("mixed", t, x) for t, x in mixed]
    )
    df = spark.createDataFrame(rows, "k string, t long, x long")
    got = {r.grp: (r.n, r.s, r.var18) for r in mann_kendall(df, "k", "t", "x").collect()}
    assert got["up"] == _mk_py(up)
    assert got["flat"] == _mk_py(flat)
    assert got["mixed"] == _mk_py(mixed)
    # sanity on the planted shapes: rising S maximal-ish, all-ties S = 0
    assert got["up"][1] > 0 and got["flat"][1] == 0
    assert got["flat"][2] == 0  # one tie group of size n cancels n(n-1)(2n+5)


def test_mann_kendall_single_point(spark):
    df = spark.createDataFrame([("solo", 0, 42)], "k string, t long, x long")
    r = mann_kendall(df, "k", "t", "x").collect()[0]
    assert (r.n, r.s, r.var18) == (1, 0, 0)


def test_plans_are_window_free(spark):
    rows = [("A", v) for v in (1, 2, 3)] + [("B", v) for v in (4, 5, 6)]
    df = spark.createDataFrame(rows, "variant string, v long")
    plan = welch_ttest(df, "variant", "v", "A", "B")._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # pure aggregation, no global-order operator
    rows = [("r", "c")] * 4
    plan = chi_square(spark.createDataFrame(rows, "r string, c string"), "r", "c")._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_dispersion_index_poisson_vs_burst(spark):
    from pagerank_spark.operators.hyptest import dispersion_index

    rows = (
        # group "flat": every unit exactly 3 events -> variance 0, VMR 0
        [("flat", u) for u in range(4) for _ in range(3)]
        # group "burst": one unit 9 events, three units 1 -> high VMR
        + [("burst", 0)] * 9
        + [("burst", u) for u in (1, 2, 3)]
    )
    df = spark.createDataFrame(rows, "g string, u long")
    got = {r.g: r for r in dispersion_index(df, "g", "u").collect()}
    assert got["flat"].vmr_micro == 0
    assert (got["flat"].n_units, got["flat"].n_events) == (4, 12)
    # burst replay: counts 9,1,1,1: n=4 s=12 ss=84 -> (336-144)/48 = 4
    assert got["burst"].vmr_micro == 4_000_000
