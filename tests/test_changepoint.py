"""CUSUM change-point (operators/smoothing.py::changepoint)."""

from pagerank_spark.operators.smoothing import changepoint


def _py_cp(series):
    series = sorted(series)
    n = len(series)
    sn = sum(x for _, x in series)
    s = 0
    best = None
    for i, (t, x) in enumerate(series, start=1):
        s += x
        stat = abs(n * s - i * sn)
        key = (-stat, t)
        if best is None or key < best[0]:
            best = (key, (t, i, n, stat))
    return best[1]


def test_changepoint_step_series(spark):
    # level shift at t=50: 10 -> 30
    series = [(t, 10) for t in range(50)] + [(t, 30) for t in range(50, 100)]
    df = spark.createDataFrame(series, ["t", "x"])
    got = changepoint(df, "t", "x").collect()[0]
    want = _py_cp(series)
    assert (got["t_split"], got["i_split"], got["n"], got["stat"]) == want
    assert got["t_split"] == 49  # deviation peaks at the last pre-shift point


def test_changepoint_with_negative_values(spark):
    series = [(t, -5) for t in range(20)] + [(t, 5) for t in range(20, 40)]
    df = spark.createDataFrame(series, ["t", "x"])
    got = changepoint(df, "t", "x").collect()[0]
    assert (got["t_split"], got["i_split"], got["n"], got["stat"]) == _py_cp(series)


def test_changepoint_tiebreak_earliest(spark):
    # symmetric tent: stat ties at the two shoulders -> earliest t wins
    series = [(0, 0), (1, 2), (2, 0)]
    df = spark.createDataFrame(series, ["t", "x"])
    got = changepoint(df, "t", "x").collect()[0]
    assert (got["t_split"], got["i_split"], got["n"], got["stat"]) == _py_cp(series)


def test_adaboost_stumps_replay(spark):
    """adaboost_stumps (operators/trees.py) vs a pure-Python replay on a
    planted threshold signal; boosting must beat the best single stump."""
    import math

    from pagerank_spark.operators.trees import adaboost_stumps

    # y = 1 iff x in [10, 20) or x >= 40 — one stump cannot separate
    rows = [(i, float(i % 50), 1 if (10 <= i % 50 < 20 or i % 50 >= 40) else 0)
            for i in range(500)]
    df = spark.createDataFrame(rows, "event_id long, value double, event_type_y long")
    out = adaboost_stumps(
        df,
        label_expr="event_type_y = 1",
        feature_expr="CAST(ROUND(value * 100) AS BIGINT) div 200",
        rounds=3,
    ).collect()

    # python replay
    data = [( int(math.floor(v * 100 + 0.5)) // 200, y) for _, v, y in rows]
    w = [1000000] * len(data)
    stumps = []
    for _ in range(3):
        xs = sorted({x for x, _ in data})
        tot = sum(w)
        best = None
        for thr in xs:
            err_pos = sum(wi for (x, y), wi in zip(data, w)
                          if (1 if x <= thr else 0) != y)
            for e, pol in ((err_pos, 1), (tot - err_pos, -1)):
                key = (e, thr, -pol)
                if best is None or key < best[0]:
                    best = (key, thr, pol, e)
        _, thr, pol, e = best
        err = min(max(e, 1), tot - 1)
        fr = math.sqrt(err / (tot - err))
        fw = math.sqrt((tot - err) / err)
        am = math.floor(math.log((tot - err) / err) * 500000 + 0.5)
        stumps.append((thr, pol, e, tot, am))
        w = [max(int(math.floor(wi * (fr if ((1 if x <= thr else 0) if pol == 1
              else (0 if x <= thr else 1)) == y else fw) + 0.5)), 1)
             for (x, y), wi in zip(data, w)]
    got = sorted((r["round"], r["thr"], r["polarity"], r["err_w"], r["tot_w"],
                  r["alpha_micro"]) for r in out)
    exp = sorted((k, thr, pol, e, tot, am)
                 for k, (thr, pol, e, tot, am) in enumerate(stumps))
    assert got == exp
    # ensemble accuracy beats the round-0 stump's accuracy
    n = len(data)
    single = n - min(s[2] for s in stumps[:1]) // 1000000
    assert out[0]["ensemble_total"] == n
    assert out[0]["ensemble_correct"] >= single - n // 20
