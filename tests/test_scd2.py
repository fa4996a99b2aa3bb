"""SCD2 run compaction (operators/temporal.py:scd2_history): validity
intervals over state runs, deterministic under equal timestamps."""

import datetime as dt

from pagerank_spark.operators.temporal import scd2_history

B = dt.datetime(2026, 2, 1, 0, 0, 0)


def _df(spark, rows):
    return spark.createDataFrame(
        [(k, s, B + dt.timedelta(seconds=t), e) for k, s, t, e in rows],
        "user_id long, event_type string, ts timestamp, event_id long",
    )


def _got(spark, rows):
    return {
        (r["key"], r["version"]): (r["state"], r["valid_from_s"], r["valid_to_s"])
        for r in scd2_history(_df(spark, rows)).collect()
    }


def test_runs_compact_to_intervals(spark):
    base = int(B.timestamp())
    rows = [
        (1, "a", 0, 1), (1, "a", 10, 2), (1, "b", 20, 3), (1, "b", 30, 4), (1, "a", 40, 5),
        (2, "x", 5, 6),
    ]
    got = _got(spark, rows)
    assert got == {
        (1, 1): ("a", base + 0, base + 20),
        (1, 2): ("b", base + 20, base + 40),
        (1, 3): ("a", base + 40, -1),
        (2, 1): ("x", base + 5, -1),
    }


def test_equal_timestamps_break_by_event_id(spark):
    base = int(B.timestamp())
    # same ts: event_id orders them a(1) -> b(2) -> a(3): three runs
    rows = [(7, "a", 0, 1), (7, "b", 0, 2), (7, "a", 0, 3)]
    got = _got(spark, rows)
    assert got == {
        (7, 1): ("a", base, base),
        (7, 2): ("b", base, base),
        (7, 3): ("a", base, -1),
    }


def test_no_change_single_run(spark):
    base = int(B.timestamp())
    rows = [(9, "z", 0, 1), (9, "z", 100, 2), (9, "z", 200, 3)]
    assert _got(spark, rows) == {(9, 1): ("z", base, -1)}
