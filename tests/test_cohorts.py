"""Cohort retention triangle + strict-order funnel on planted event logs."""

from datetime import datetime

from pagerank_spark.operators.cohorts import cohort_retention, funnel_steps

W = 604_800


def _ts(week: int, sec: int = 0) -> datetime:
    return datetime.utcfromtimestamp(week * W + sec)


def test_cohort_retention_planted(spark):
    # cohort week 0: users 1,2,3 (u1 active wk 0,1,2; u2 wk 0,2; u3 wk 0)
    # cohort week 1: user 4 (active wk 1 only)
    rows = []
    eid = 0
    for u, weeks in [(1, [0, 1, 2]), (2, [0, 2]), (3, [0]), (4, [1])]:
        for w in weeks:
            rows.append((eid, _ts(w, u), u, "view", 0.0, ""))
            eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    out = {
        (r.cohort_period, r.period_offset): (r.n_active, r.n_cohort, r.retention_micro)
        for r in cohort_retention(ev).collect()
    }
    assert out == {
        (0, 0): (3, 3, 1_000_000),
        (0, 1): (1, 3, 333_333),
        (0, 2): (2, 3, 666_666),
        (1, 0): (1, 1, 1_000_000),
    }


def test_funnel_strict_order_and_tiebreak(spark):
    rows = [
        # u1 converts fully: view < click < purchase
        (1, _ts(0, 10), 1, "view", 0.0, ""),
        (2, _ts(0, 20), 1, "click", 0.0, ""),
        (3, _ts(0, 30), 1, "purchase", 0.0, ""),
        # u2: click BEFORE its first view -> stops at view
        (4, _ts(0, 50), 2, "view", 0.0, ""),
        (5, _ts(0, 40), 2, "click", 0.0, ""),
        # u3: equal timestamps — tiebreak on event_id makes click (id 7)
        # strictly after view (id 6), purchase (id 8) after click
        (6, _ts(0, 60), 3, "view", 0.0, ""),
        (7, _ts(0, 60), 3, "click", 0.0, ""),
        (8, _ts(0, 60), 3, "purchase", 0.0, ""),
        # u4: never views -> not in the funnel at all
        (9, _ts(0, 70), 4, "click", 0.0, ""),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    got = {
        r.step_idx: (r.step, r.n_entities, r.conv_from_first_micro, r.conv_from_prev_micro)
        for r in funnel_steps(ev, ["view", "click", "purchase"]).collect()
    }
    assert got == {
        1: ("view", 3, 1_000_000, 1_000_000),
        2: ("click", 2, 666_666, 666_666),
        3: ("purchase", 2, 666_666, 1_000_000),
    }
