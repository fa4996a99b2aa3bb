"""CEM: hand-built strata with a known planted effect."""

import pytest
from pyspark.sql import functions as F

from pagerank_spark.operators.causal import cem_att, cem_strata


def _units(spark, rows):
    return spark.createDataFrame(rows, "stratum long, t int, y long")


def test_unmatched_strata_are_dropped_and_gap_is_exact(spark):
    rows = [
        # stratum 0: treated mean 100, control mean 60 -> gap 40
        (0, 1, 100), (0, 0, 50), (0, 0, 70),
        # stratum 1: treated-only -> dropped
        (1, 1, 999),
        # stratum 2: control-only -> dropped
        (2, 0, 999),
    ]
    got = cem_strata(
        _units(spark, rows),
        treated=F.col("t") == 1,
        outcome=F.col("y"),
        strata={"s": F.col("stratum")},
    ).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.s, r.n_treated, r.n_control) == (0, 1, 2)
    assert r.diff_micro == 100 * 1_000_000 - 60 * 1_000_000


def test_att_is_treated_weighted(spark):
    rows = [
        (0, 1, 10), (0, 0, 0),            # gap 10, 1 treated
        (1, 1, 40), (1, 1, 40), (1, 0, 10),  # gap 30, 2 treated
    ]
    tbl = cem_strata(
        _units(spark, rows),
        treated=F.col("t") == 1,
        outcome=F.col("y"),
        strata={"s": F.col("stratum")},
    )
    att = cem_att(tbl).collect()[0]
    assert att.n_treated_matched == 3 and att.n_control_matched == 2
    assert att.att == pytest.approx((1 * 10 + 2 * 30) / 3, abs=1e-6)


def test_negative_gap_is_stable(spark):
    rows = [(0, 1, 10), (0, 0, 25), (0, 0, 26)]  # control mean 25.5 > treated
    r = cem_strata(
        _units(spark, rows),
        treated=F.col("t") == 1,
        outcome=F.col("y"),
        strata={"s": F.col("stratum")},
    ).collect()[0]
    assert r.diff_micro == 10 * 1_000_000 - (51 * 1_000_000) // 2


def test_ipw_ate_replay(spark):
    """ipw_ate (operators/causal.py) vs pure-Python on a planted effect:
    treatment adds +2000 milli within every bin; IPW recovers it even
    under confounded treatment rates; non-overlap bins are excluded."""
    from pagerank_spark.operators.causal import ipw_ate

    rows = []
    eid = 0
    for b in range(6):
        n = 40
        treated = 0 if b == 5 else (30 if b >= 3 else 10)  # bin 5: no overlap
        for i in range(n):
            t = 1 if i < treated else 0
            y = 1000 * (b + 1) + (2000 if t else 0)
            rows.append((eid, b, t, float(y) / 1000.0))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, bin long, t long, value double")
    got = ipw_ate(
        df,
        treat_expr="t = 1",
        outcome_expr="CAST(ROUND(value * 1000) AS BIGINT)",
        bin_expr="bin",
    ).collect()[0]

    def trunc(a, b):
        q = abs(a) // b
        return q if a >= 0 else -q

    s = 0
    n_over = 0
    for _, b, t, v in rows:
        if b == 5:
            continue
        n_b, t_b = 40, (30 if b >= 3 else 10)
        y = int(round(v * 1000))
        s += trunc(y * n_b, t_b) if t else -trunc(y * n_b, n_b - t_b)
        n_over += 1
    assert got["n_rows"] == 240 and got["n_overlap"] == 200 and got["n_excluded"] == 40
    assert got["sum_term_milli"] == s
    assert got["ate_milli"] == trunc(s, n_over)
    # the planted +2000 effect is recovered (integer-truncation slack only)
    assert abs(got["ate_milli"] - 2000) <= 5


def test_rdd_sharp_recovers_planted_jump(spark):
    from pyspark.sql import functions as F

    from pagerank_spark.operators.causal import rdd_sharp

    # planted: y = 10*x below the cutoff, y = 10*x + 5000 at/above it —
    # local-linear fits are exact on exactly-linear data, tau = 5000
    rows = [(x, 10 * x + (5000 if x >= 50 else 0)) for x in range(20, 81)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = rdd_sharp(df, F.col("x"), F.col("y"), cutoff=50, bandwidth=30).collect()[0]
    assert (got.n_l, got.n_r) == (30, 31)
    assert got.tau_micro == 5000 * 1_000_000
    assert got.slope_l_micro == 10 * 1_000_000
    assert got.slope_r_micro == 10 * 1_000_000
    # fitted value AT the cutoff from the left is the counterfactual 500
    assert got.yhat_l_micro == 500 * 1_000_000
    assert got.yhat_r_micro == 5500 * 1_000_000


def test_rdd_sharp_boundary_membership(spark):
    from pyspark.sql import functions as F

    from pagerank_spark.operators.causal import rdd_sharp

    # u = -bw and u = +bw are both inside; cutoff row is on the right
    rows = [(x, 7) for x in (10, 20, 30, 40, 50)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = rdd_sharp(df, F.col("x"), F.col("y"), cutoff=30, bandwidth=10).collect()[0]
    # u = -10 and u = +10 are both inside the band; cutoff row sits right
    assert (got.n_l, got.n_r) == (1, 2)
    # n_l < 2 -> degenerate side -> every fitted output is the 0 sentinel
    assert (got.yhat_l_micro, got.yhat_r_micro, got.tau_micro) == (0, 0, 0)


def test_rdd_sharp_zero_variance_side_sentinel(spark):
    from pyspark.sql import functions as F

    from pagerank_spark.operators.causal import rdd_sharp

    # left side has two points but a single distinct u -> n*Suu - Su^2 = 0
    rows = [(29, 5), (29, 9), (31, 1), (35, 2), (39, 3)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = rdd_sharp(df, F.col("x"), F.col("y"), cutoff=30, bandwidth=10).collect()[0]
    assert (got.n_l, got.n_r) == (2, 3)
    assert (got.tau_micro, got.slope_l_micro) == (0, 0)


def test_cuped_reduces_to_raw_when_uncorrelated_and_matches_replay(spark):
    from pyspark.sql import functions as F

    from pagerank_spark.operators.causal import cuped_adjusted_effect

    # strong x-y correlation + a planted +10 treatment effect
    rows = [
        # (t, x, y = 2x + effect*t + small noise)
        (1, 10, 31), (1, 20, 51), (1, 30, 69), (1, 40, 92),
        (0, 12, 25), (0, 22, 43), (0, 32, 66), (0, 42, 83),
    ]
    units = spark.createDataFrame(rows, "t long, x long, y long")
    got = cuped_adjusted_effect(
        units, F.col("t"), F.col("y"), F.col("x")
    ).collect()[0]
    n = len(rows)
    sx = sum(r[1] for r in rows); sy = sum(r[2] for r in rows)
    sxx = sum(r[1] ** 2 for r in rows); sxy = sum(r[1] * r[2] for r in rows)
    n_t = sum(r[0] for r in rows)
    sy_t = sum(r[2] for r in rows if r[0]); sx_t = sum(r[1] for r in rows if r[0])
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    raw = sy_t / n_t - (sy - sy_t) / (n - n_t)
    xd = sx_t / n_t - (sx - sx_t) / (n - n_t)
    assert (got.n_t, got.n_c) == (4, 4)
    assert got.theta_micro == round(theta * 1e6)
    assert got.effect_raw_micro == round(raw * 1e6)
    assert got.effect_cuped_micro == round((raw - theta * xd) * 1e6)
    # the adjustment pulls the estimate toward the planted +10 effect
    assert abs(got.effect_cuped_micro - 10_000_000) < abs(got.effect_raw_micro - 10_000_000)


def test_cuped_zero_variance_covariate_sentinel(spark):
    from pyspark.sql import functions as F

    from pagerank_spark.operators.causal import cuped_adjusted_effect

    rows = [(1, 7, 30), (1, 7, 34), (0, 7, 20), (0, 7, 24)]
    units = spark.createDataFrame(rows, "t long, x long, y long")
    got = cuped_adjusted_effect(units, F.col("t"), F.col("y"), F.col("x")).collect()[0]
    assert got.theta_micro == 0
    assert got.effect_cuped_micro == got.effect_raw_micro == 10_000_000


def test_aipw_matches_python_replay_with_negative_residuals(spark):
    from pagerank_spark.operators.causal import aipw_ate

    # one overlap bin with asymmetric outcomes (negative residuals bite the
    # truncation semantics), one no-control bin (excluded)
    rows = [
        (0, 1, 105), (0, 1, 95), (0, 0, 52), (0, 0, 44), (0, 0, 63),
        (1, 1, 7), (1, 1, 9),
    ]
    df = spark.createDataFrame(rows, "b long, t long, y long")
    got = aipw_ate(df, "t = 1", "y", "b").collect()[0]

    def trunc(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b >= 0) else -q

    # replay bin 0: n=5, t_b=2, sy1=200, sy0=159
    m1, m0 = trunc(200, 2), trunc(159, 3)
    want = 0
    for _, t, y in rows[:5]:
        base = m1 - m0
        if t:
            want += base + trunc((y - m1) * 5, 2)
        else:
            want += base - trunc((y - m0) * 5, 3)
    assert (got.n_rows, got.n_overlap, got.n_excluded) == (7, 5, 2)
    assert got.sum_term == want
    assert got.ate_unit == trunc(want, 5)
    # the planted effect (treated ~100 vs control ~53) is recovered
    assert 30_000 > got.ate_unit > 30
