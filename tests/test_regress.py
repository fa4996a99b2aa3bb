"""Normal-equations OLS (operators/regress.py): exact moments + rational solve."""

from fractions import Fraction

import numpy as np
import pytest

from pagerank_spark.operators.regress import (
    linear_fit,
    moment_matrix,
    solve_normal_equations,
)


def _planted_df(spark, n=500, noise_free=True):
    # y = 3 + 2*x1 - 5*x2 exactly (integer features => integer y)
    rows = []
    for i in range(n):
        x1 = (7 * i) % 23 - 11
        x2 = (13 * i) % 17 - 8
        y = 3 + 2 * x1 - 5 * x2 + (0 if noise_free else (i % 3) - 1)
        rows.append((x1, x2, y))
    return spark.createDataFrame(rows, "x1 long, x2 long, y long")


def test_moments_match_numpy(spark):
    df = _planted_df(spark, 200, noise_free=False)
    m = {(r.i, r.j): r.s for r in moment_matrix(df, ["x1", "x2"], "y").collect()}
    a = np.array(df.collect(), dtype=np.int64)
    z = np.column_stack([np.ones(len(a), dtype=np.int64), a])
    for i in range(4):
        for j in range(i, 4):
            assert m[(i, j)] == int((z[:, i] * z[:, j]).sum())
    assert m[(0, 0)] == 200


def test_exact_recovery_of_planted_coefficients(spark):
    df = _planted_df(spark, 300, noise_free=True)
    beta, _ = linear_fit(df, ["x1", "x2"], "y")
    assert beta == [Fraction(3), Fraction(2), Fraction(-5)]


def test_solve_matches_lstsq_with_noise(spark):
    df = _planted_df(spark, 400, noise_free=False)
    beta, _ = linear_fit(df, ["x1", "x2"], "y")
    a = np.array(df.collect(), dtype=np.float64)
    zx = np.column_stack([np.ones(len(a)), a[:, :2]])
    ref, *_ = np.linalg.lstsq(zx, a[:, 2], rcond=None)
    got = np.array([float(b) for b in beta])
    assert np.allclose(got, ref, atol=1e-9)


def test_ridge_shrinks_toward_zero(spark):
    df = _planted_df(spark, 300, noise_free=True)
    plain, _ = linear_fit(df, ["x1", "x2"], "y")
    ridged, _ = linear_fit(df, ["x1", "x2"], "y", lam=10_000)
    assert abs(ridged[1]) < abs(plain[1]) and abs(ridged[2]) < abs(plain[2])


def test_collinear_features_raise():
    # x2 = 2*x1 exactly -> singular normal equations
    moments = []
    xs = [(i % 5) - 2 for i in range(50)]
    z = [[1, x, 2 * x, 7 * x + 1] for x in xs]
    for i in range(4):
        for j in range(i, 4):
            moments.append((i, j, sum(r[i] * r[j] for r in z)))
    with pytest.raises(ValueError, match="singular"):
        solve_normal_equations(moments, 2)


def test_conformal_interval_matches_python_replay(spark):
    from pyspark.sql import functions as F

    from pagerank_spark.operators.regress import conformal_interval

    # fit split: exact line y = 3x + 10; calibration split: known residuals
    fit = [(i, 3 * i + 10, 0) for i in range(1, 21)]
    cal = [(5, 25 + d, 1) for d in (-7, -3, -1, 0, 1, 2, 4, 6, 8, 11)]
    rows = fit + cal
    df = spark.createDataFrame(rows, "x long, y long, cal long")
    got = conformal_interval(df, F.col("x"), F.col("y"), F.col("cal"), 9, 10).collect()[0]
    assert (got.n_fit, got.n_cal) == (20, 10)
    assert got.a_micro == 10_000_000 and got.b_micro == 3_000_000
    # residuals are |deltas|, k = min(10, ceil(11*9/10)) = 10 -> max residual
    assert got.qhat_micro == 11_000_000
    assert got.cov_cal_micro == 1_000_000


def test_conformal_interval_quantile_correction(spark):
    from pyspark.sql import functions as F

    from pagerank_spark.operators.regress import conformal_interval

    fit = [(i, 2 * i, 0) for i in range(1, 31)]
    cal = [(1, 2 + d, 1) for d in range(1, 20)]  # residuals 1..19, n_cal=19
    df = spark.createDataFrame(fit + cal, "x long, y long, cal long")
    got = conformal_interval(df, F.col("x"), F.col("y"), F.col("cal"), 9, 10).collect()[0]
    # k = ceil(20 * 9/10) = 18 -> 18th smallest residual = 18
    assert got.qhat_micro == 18_000_000
    assert got.cov_cal_micro == (18 * 10**6) // 19


def test_conformal_interval_degenerate_sentinel(spark):
    from pyspark.sql import functions as F

    from pagerank_spark.operators.regress import conformal_interval

    df = spark.createDataFrame([(5, 9, 0), (5, 11, 0), (3, 8, 1)], "x long, y long, cal long")
    got = conformal_interval(df, F.col("x"), F.col("y"), F.col("cal")).collect()[0]
    assert (got.n_fit, got.qhat_micro, got.cov_cal_micro) == (2, 0, 0)


def test_conformal_interval_empty_calibration_sentinel(spark):
    # Round-5 advice: with a valid fit but ZERO calibration rows the
    # histogram/cumsum/qhat chain collapses to zero rows — the function
    # must return the one-row sentinel (n_fit, 0, a, b, 0, 0) instead of
    # an empty frame.
    from pyspark.sql import functions as F

    from pagerank_spark.operators.regress import conformal_interval

    fit = [(i, 3 * i + 10, 0) for i in range(1, 21)]
    df = spark.createDataFrame(fit, "x long, y long, cal long")
    out = conformal_interval(df, F.col("x"), F.col("y"), F.col("cal"), 9, 10).collect()
    assert len(out) == 1
    got = out[0]
    assert (got.n_fit, got.n_cal) == (20, 0)
    assert got.a_micro == 10_000_000 and got.b_micro == 3_000_000
    assert got.qhat_micro == 0 and got.cov_cal_micro == 0
