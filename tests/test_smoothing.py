"""Dyadic EWMA + CUSUM: exact Python fold replay, ordering, alpha variants."""

from datetime import datetime

from pagerank_spark.operators.smoothing import cusum, ewma


def _replay(values, halvings):
    d = 1 << halvings
    acc = 0.0
    for v in values:
        acc = (acc * (d - 1) + v) / d
    return round(acc * 1_000_000)


def test_ewma_matches_python_fold(spark):
    # deliberately shuffled input; order restored via (ts, event_id)
    rows = [
        (3, datetime(2024, 1, 1, 0, 0, 30), 1, "view", 6.0, ""),
        (1, datetime(2024, 1, 1, 0, 0, 10), 1, "view", 1.0, ""),
        (2, datetime(2024, 1, 1, 0, 0, 20), 1, "view", 2.0, ""),
        # user 2: equal timestamps -> event_id tiebreak orders 10.5 then 0.25
        (5, datetime(2024, 1, 1, 0, 1, 0), 2, "view", 0.25, ""),
        (4, datetime(2024, 1, 1, 0, 1, 0), 2, "view", 10.5, ""),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    for h in (1, 2):
        got = {r.user_id: (r.n_events, r.ewma_micro) for r in ewma(ev, halvings=h).collect()}
        assert got[1] == (3, _replay([1.0, 2.0, 6.0], h))
        assert got[2] == (2, _replay([10.5, 0.25], h))
    # h=1 closed form for user 1: ((0+1)/2 + 2)/2 + 6)/2... = 3.625
    assert ewma(ev, halvings=1).filter("user_id = 1").collect()[0].ewma_micro == 3_625_000


def test_ewma_last_seen_and_single_event(spark):
    rows = [(1, datetime(2024, 1, 2), 9, "view", 8.0, "")]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    r = ewma(ev).collect()[0]
    # one event, h=1: (0 + 8)/2 = 4
    assert (r.user_id, r.n_events, r.ewma_micro) == (9, 1, 4_000_000)
    assert r.last_s == 1_704_153_600  # 2024-01-02T00:00:00Z (session tz is UTC)


def _cusum_replay(values, k):
    # the textbook recurrence, which the closed form must reproduce exactly
    s, smax = 0.0, 0.0
    for v in values:
        s = max(0.0, s + v - k)
        smax = max(smax, s)
    return round(s * 1_000_000), round(smax * 1_000_000)


def test_cusum_matches_recurrence_replay(spark):
    rows = [
        # user 1: drift up then recover — exercises the max(0, .) clamp
        (1, datetime(2024, 1, 1, 0, 0, 10), 1, "view", 2.0, ""),
        (2, datetime(2024, 1, 1, 0, 0, 20), 1, "view", 3.0, ""),
        (3, datetime(2024, 1, 1, 0, 0, 30), 1, "view", -5.0, ""),
        (4, datetime(2024, 1, 1, 0, 0, 40), 1, "view", 1.0, ""),
        # user 2: equal timestamps -> event_id tiebreak
        (6, datetime(2024, 1, 1, 0, 1, 0), 2, "view", 0.5, ""),
        (5, datetime(2024, 1, 1, 0, 1, 0), 2, "view", 4.0, ""),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {
        r.user_id: (r.n_events, r.cusum_micro, r.cusum_max_micro)
        for r in cusum(ev, k=0.75).collect()
    }
    assert got[1] == (4, *_cusum_replay([2.0, 3.0, -5.0, 1.0], 0.75))
    assert got[2] == (2, *_cusum_replay([4.0, 0.5], 0.75))
    # clamp actually engaged for user 1: running stat hit 0 mid-stream
    assert got[1][1] == 250_000  # final: max(0, ...)=0 after -5, then 1-0.75
    assert got[1][2] == 3_500_000  # peak: 1.25 + 2.25


def test_cusum_plan_no_window(spark):
    rows = [(1, datetime(2024, 1, 1), 1, "x", 1.0, "")]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    plan = cusum(ev)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_ewma_plan_single_aggregation_no_window(spark):
    rows = [(1, datetime(2024, 1, 1), 1, "x", 1.0, "")]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    plan = ewma(ev)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # fold lives inside the grouped array


def _kalman_replay(values, q=0.25, r=1.0):
    x, p = 0.0, 1.0
    for z in values:
        pp = p + q
        k = pp / (pp + r)
        x = x + k * (z - x)
        p = pp - k * pp
    return round(x * 1_000_000), round(p * 1_000_000)


def test_kalman_matches_python_replay(spark):
    from datetime import datetime

    from pagerank_spark.operators.smoothing import kalman1d

    rows = [
        (3, datetime(2024, 1, 1, 0, 0, 30), 1, "view", 6.0, ""),
        (1, datetime(2024, 1, 1, 0, 0, 10), 1, "view", 1.0, ""),
        (2, datetime(2024, 1, 1, 0, 0, 20), 1, "view", 2.0, ""),
        # equal timestamps -> event_id tiebreak
        (5, datetime(2024, 1, 1, 0, 1, 0), 2, "view", 0.25, ""),
        (4, datetime(2024, 1, 1, 0, 1, 0), 2, "view", 10.5, ""),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {r.user_id: (r.n_events, r.kalman_micro, r.p_micro) for r in kalman1d(ev).collect()}
    assert got[1] == (3, *_kalman_replay([1.0, 2.0, 6.0]))
    assert got[2] == (2, *_kalman_replay([10.5, 0.25]))
    # variance converges regardless of data: both keys share the P path by n
    assert got[2][2] == _kalman_replay([0.0, 0.0])[1]


def test_kalman_gain_settles_toward_steady_state(spark):
    from datetime import datetime, timedelta

    from pagerank_spark.operators.smoothing import kalman1d

    # constant signal: estimate approaches it monotonically from x0=0
    vals = [4.0] * 12
    rows = [
        (i, datetime(2024, 1, 1) + timedelta(seconds=10 * i), 1, "view", v, "")
        for i, v in enumerate(vals)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    row = kalman1d(ev).collect()[0]
    x, p = _kalman_replay(vals)
    assert (row.kalman_micro, row.p_micro) == (x, p)
    assert 3_900_000 < row.kalman_micro < 4_000_001
    # steady-state variance for q=.25, r=1: P* solves P = (P+q)r/(P+q+r)
    assert abs(row.p_micro - 390_388) < 2_000


def test_kalman_plan_single_aggregation_no_window(spark):
    from datetime import datetime

    from pagerank_spark.operators.smoothing import kalman1d

    ev = spark.createDataFrame(
        [(1, datetime(2024, 1, 1), 1, "view", 1.0, "")],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    plan = kalman1d(ev)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert plan.count("Exchange") == 1
