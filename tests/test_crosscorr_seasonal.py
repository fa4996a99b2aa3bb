"""Cross-correlation + seasonal index: exact closed-form replays."""

import math

from pagerank_spark.operators.temporal import cross_correlation, seasonal_index


def _ccf_py(grid, max_lag):
    n = len(grid)
    sx = sum(x for _, x, _ in grid)
    sy = sum(y for _, _, y in grid)
    dev = {t: (n * x - sx, n * y - sy) for t, x, y in grid}
    vx = sum(dx * dx for dx, _ in dev.values())
    vy = sum(dy * dy for _, dy in dev.values())
    out = {}
    for lag in range(max_lag + 1):
        pairs = [(dev[t][0], dev[t + lag][1]) for t, _, _ in grid if t + lag in dev]
        num = sum(a * b for a, b in pairs)
        ccf = num / math.sqrt(vx) / math.sqrt(vy) if vx > 0 and vy > 0 else None
        out[lag] = (len(pairs), num, ccf)
    return out


def test_ccf_matches_replay(spark):
    # y lags x by 2: strong positive ccf at lag 2
    xs = [3, 9, 1, 7, 5, 8, 2, 6, 4, 9]
    grid = [(t, x, (xs[t - 2] if t >= 2 else 5)) for t, x in enumerate(xs)]
    df = spark.createDataFrame(grid, "t long, x long, y long")
    got = {r.lag: r for r in cross_correlation(df, "t", "x", "y", max_lag=3).collect()}
    exp = _ccf_py(grid, 3)
    for lag in range(4):
        n_pairs, _, ccf = exp[lag]
        assert got[lag].n_pairs == n_pairs
        assert abs(got[lag].ccf - ccf) < 1e-12
    assert got[2].ccf > max(got[0].ccf, got[1].ccf, got[3].ccf)


def test_ccf_constant_series_null(spark):
    grid = [(t, 5, t) for t in range(6)]
    df = spark.createDataFrame(grid, "t long, x long, y long")
    got = cross_correlation(df, "t", "x", "y", max_lag=1).collect()
    assert all(r.ccf is None for r in got)


def test_seasonal_index_closed_form(spark):
    # Jan days at 100/day, Feb days at 300/day: idx = 0.5 and 1.5
    rows = [(f"2024-01-{d:02d} 00:00:00", 100) for d in range(1, 11)]
    rows += [(f"2024-02-{d:02d} 00:00:00", 300) for d in range(1, 11)]
    df = spark.createDataFrame(rows, "ts string, v long")
    df = df.withColumn("ts", df.ts.cast("timestamp"))
    got = {r.month: r for r in seasonal_index(df, "ts", "v").collect()}
    assert got[1].n_days == 10 and got[1].total == 1000
    assert got[1].idx_micro == 500_000
    assert got[2].idx_micro == 1_500_000
