"""Holt smoothing: pure-Python expanded-form replay + closed forms."""

import math

from pagerank_spark.operators.smoothing import holt


def _holt_py(vals, lh=1, th=2):
    a = 1 << lh
    b = 1 << th
    cc = (a - 1) + a * (b - 1)
    d = a * b
    l, t = float(vals[0]), 0.0
    for x in vals[1:]:
        nl = (x + float(a - 1) * (l + t)) / float(a)
        nt = (x - l + float(cc) * t) / float(d)
        l, t = nl, nt
    return math.floor(l * 1e6 + 0.5), math.floor(t * 1e6 + 0.5)


def test_holt_matches_replay(spark):
    series = {
        1: [3.0, 7.5, 1.25, 9.0, 4.0, 4.0, 0.125],
        2: [10.0],                      # single point: level=x, trend=0
        3: [2.0, 2.0, 2.0, 2.0],        # constant: level=x, trend=0
    }
    rows = [
        (k, i, f"2024-01-01 00:00:{i:02d}", v)
        for k, vs in series.items()
        for i, v in enumerate(vs)
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts string, value double")
    df = df.withColumn("ts", df.ts.cast("timestamp"))
    got = {r.user_id: r for r in holt(df, "user_id", "value", "ts", "event_id").collect()}
    for k, vs in series.items():
        le, te = _holt_py(vs)
        assert (got[k].n_events, got[k].level_micro, got[k].trend_micro) == (len(vs), le, te)
    assert got[2].level_micro == 10_000_000 and got[2].trend_micro == 0
    assert got[3].level_micro == 2_000_000 and got[3].trend_micro == 0


def test_holt_linear_ramp_trend_positive(spark):
    # x_t = 5t: trend state converges toward the slope's scale
    vals = [5.0 * t for t in range(1, 15)]
    rows = [(1, i, f"2024-01-01 00:{i:02d}:00", v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "user_id long, event_id long, ts string, value double")
    df = df.withColumn("ts", df.ts.cast("timestamp"))
    r = holt(df).collect()[0]
    le, te = _holt_py(vals)
    assert (r.level_micro, r.trend_micro) == (le, te)
    assert r.trend_micro > 0
