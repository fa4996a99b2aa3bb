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


def test_gbm_stumps_replay(spark):
    """gbm_stumps (operators/trees.py) vs a pure-Python replay on a
    planted piecewise signal; SSE must shrink monotonically."""
    from pagerank_spark.operators.trees import _trunc_div, gbm_stumps

    # piecewise target: low plateau, high plateau, middle ramp
    rows = [
        (i, float(i % 60), 5.0 if i % 60 < 20 else (15.0 if i % 60 >= 40 else 10.0))
        for i in range(600)
    ]
    df = spark.createDataFrame(rows, "event_id long, value double, target double")
    out = gbm_stumps(
        df,
        target_expr="CAST(ROUND(target * 1000) AS BIGINT)",
        feature_expr="CAST(value AS BIGINT)",
        rounds=3,
    ).collect()

    data = [(int(v), int(round(t * 1000))) for _, v, t in rows]
    n = len(data)
    f0 = _trunc_div(sum(y for _, y in data), n)
    r = {i: y - f0 for i, (_, y) in enumerate(data)}
    exp = []
    for k in range(3):
        xs = sorted({x for x, _ in data})
        tot_n, tot_s = n, sum(r.values())
        best = None
        for thr in xs[:-1]:
            n_l = sum(1 for x, _ in data if x <= thr)
            s_l = sum(r[i] for i, (x, _) in enumerate(data) if x <= thr)
            n_r, s_r = tot_n - n_l, tot_s - s_l
            gain = (s_l * s_l) / n_l + (s_r * s_r) / n_r
            if best is None or (gain, -thr) > (best[0], -best[1]):
                best = (gain, thr, n_l, s_l, n_r, s_r)
        _, thr, n_l, s_l, n_r, s_r = best
        v_l = _trunc_div(_trunc_div(s_l, n_l), 2)
        v_r = _trunc_div(_trunc_div(s_r, n_r), 2)
        exp.append((k, thr, n_l, v_l, v_r))
        for i, (x, _) in enumerate(data):
            r[i] -= v_l if x <= thr else v_r
    sse = sum(v * v for v in r.values())
    got = sorted(
        (x["round"], x["thr"], x["n_left"], x["v_left_milli"], x["v_right_milli"])
        for x in out
    )
    assert got == exp
    assert all(x["f0_milli"] == f0 and x["sse_after"] == sse for x in out)
    # boosting reduced training SSE below the constant-model SSE
    sse0 = sum((y - f0) ** 2 for _, y in data)
    assert sse < sse0
