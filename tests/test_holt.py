"""Holt smoothing: pure-Python expanded-form replay + closed forms."""
from pyspark.sql import functions as F

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


def test_holt_winters_matches_python_replay(spark):
    # exact-replay oracle: same expanded-form IEEE ops in pure Python
    from pagerank_spark.operators.smoothing import holt_winters

    rows = [
        (1, i, float(v), f"2024-01-01 00:{i:02d}:00")
        for i, v in enumerate([10, 14, 9, 13, 11, 15, 10, 14, 12, 16, 11, 15])
    ]
    df = spark.createDataFrame(rows, "user_id long, event_id long, value double, ts string").select(
        "user_id", "event_id", "value", F.col("ts").cast("timestamp").alias("ts")
    )
    m = 4
    # python replay in (ts, event_id) order == insertion order here
    vs = [v for _, _, v, _ in rows]
    l, b, seas = vs[0], 0.0, [0.0] * m
    for x in vs[1:]:
        s1 = seas[0]
        l2 = ((x - s1) + 1.0 * (l + b)) / 2.0
        b2 = ((x - s1) - l + 7.0 * b) / 8.0
        snew = (x - ((x - s1) + 1.0 * (l + b)) / 2.0 + 3.0 * s1) / 4.0
        seas = seas[1:] + [snew]
        l, b = l2, b2
    got = holt_winters(df, "user_id", "value", "ts", "event_id", period=m).collect()[0]
    import math

    micro = lambda x: math.floor(x * 1000000 + 0.5)
    assert got.n_events == len(vs)
    assert got.level_micro == micro(l) and got.trend_micro == micro(b)
    assert [got.s1_micro, got.s2_micro, got.s3_micro, got.s4_micro] == [micro(s) for s in seas]
