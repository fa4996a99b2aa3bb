"""Gaps-and-islands streaks + time-weighted average."""

import datetime as dt

import pytest

from pagerank_spark.operators.sequences import streaks
from pagerank_spark.operators.temporal import time_weighted_avg


def _ev(spark, rows):
    # rows: (event_id, user_id, sec_offset, event_type, value)
    base = dt.datetime(2024, 1, 1)
    data = [
        (eid, base + dt.timedelta(seconds=s), uid, et, float(v))
        for eid, uid, s, et, v in rows
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_streaks_basic(spark):
    ev = _ev(
        spark,
        [
            (0, 1, 0, "a", 0),
            (1, 1, 10, "a", 0),
            (2, 1, 20, "b", 0),
            (3, 1, 30, "a", 0),
            (4, 1, 40, "a", 0),
            (5, 1, 50, "a", 0),
            (6, 2, 0, "b", 0),
        ],
    )
    got = {(r["user_id"], r["event_type"]): r for r in streaks(ev).collect()}
    assert got[(1, "a")]["max_streak"] == 3
    assert got[(1, "a")]["n_streaks"] == 2
    assert got[(1, "a")]["n_events"] == 5
    assert got[(1, "b")]["max_streak"] == 1 and got[(1, "b")]["n_streaks"] == 1
    assert got[(2, "b")]["max_streak"] == 1


def test_streaks_tie_order_by_event_id(spark):
    # same timestamp: event_id breaks ties -> a,a,b is 2-streak then 1
    ev = _ev(spark, [(0, 1, 0, "a", 0), (1, 1, 0, "a", 0), (2, 1, 0, "b", 0)])
    got = {(r["user_id"], r["event_type"]): r for r in streaks(ev).collect()}
    assert got[(1, "a")]["max_streak"] == 2 and got[(1, "b")]["max_streak"] == 1


def test_twap_dwell_weighting(spark):
    # value 10 held 30s, value 20 held 10s, last row excluded
    ev = _ev(spark, [(0, 1, 0, "x", 10.0), (1, 1, 30, "x", 20.0), (2, 1, 40, "x", 99.0)])
    row = time_weighted_avg(ev).collect()[0]
    assert row["n_intervals"] == 2
    assert row["total_seconds"] == 40
    assert row["twap"] == pytest.approx((10.0 * 30 + 20.0 * 10) / 40, abs=1e-12)


def test_twap_single_event_user_absent(spark):
    ev = _ev(spark, [(0, 1, 0, "x", 10.0), (1, 2, 0, "x", 5.0), (2, 2, 10, "x", 5.0)])
    got = {r["user_id"]: r for r in time_weighted_avg(ev).collect()}
    assert 1 not in got  # no successor -> no interval
    assert got[2]["twap"] == pytest.approx(5.0)
