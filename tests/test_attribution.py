"""Multi-touch attribution: hand replay, lookback, ties, direct conversions."""

from datetime import datetime, timedelta

from pagerank_spark.operators.sequences import attribution

T0 = datetime(2024, 1, 10, 12, 0, 0)


def _ev(eid, dt_s, uid, etype):
    return (eid, T0 + timedelta(seconds=dt_s), uid, etype, 1.0, "")

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def test_attribution_hand_replay(spark):
    rows = [
        # user 1: view, click, then purchase -> last = click, linear 1/2 each
        _ev(1, 0, 1, "view"),
        _ev(2, 10, 1, "click"),
        _ev(3, 20, 1, "purchase"),
        # user 2: no touches -> direct
        _ev(4, 0, 2, "purchase"),
        # user 3: touch OUTSIDE the lookback -> direct
        _ev(5, 0, 3, "view"),
        _ev(6, 1000, 3, "purchase"),
        # user 4: equal-ts touches -> event_id tiebreak picks 8 (click)
        _ev(7, 0, 4, "view"),
        _ev(8, 0, 4, "click"),
        _ev(9, 5, 4, "purchase"),
    ]
    ev = spark.createDataFrame(rows, SCHEMA)
    got = {
        r.channel: (r.conversions_last, r.linear_micro, r.n_touchpoints)
        for r in attribution(ev, "purchase", ("view", "click"), lookback_seconds=100).collect()
    }
    # user1: click last, 500000 each; user4: click last (tid tiebreak), 500000 each
    assert got["click"] == (2, 1_000_000, 2)
    assert got["view"] == (0, 1_000_000, 2)
    assert got["(direct)"] == (2, 2_000_000, 0)
    # every conversion credited exactly once in last-touch
    assert sum(v[0] for v in got.values()) == 4


def test_attribution_touch_at_conversion_ts_excluded(spark):
    rows = [_ev(1, 0, 1, "view"), _ev(2, 0, 1, "purchase")]
    ev = spark.createDataFrame(rows, SCHEMA)
    got = {r.channel: r.conversions_last for r in attribution(ev).collect()}
    assert got == {"(direct)": 1}  # strict tts < cts
