"""funnel + cohort_retention (operators/sequences.py) closed-form fixtures."""

import pytest
from pyspark.sql import functions as F


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))


def test_funnel_order_matters(spark):
    from pagerank_spark.operators.sequences import funnel

    rows = [
        # user 1 converts in order: A B C
        (1, 1, "A", "2026-01-01 00:00:01"),
        (1, 2, "B", "2026-01-01 00:00:02"),
        (1, 3, "C", "2026-01-01 00:00:03"),
        # user 2 does B before A: reaches A only
        (2, 4, "B", "2026-01-01 00:00:01"),
        (2, 5, "A", "2026-01-01 00:00:02"),
        # user 3: A then C (skips B): reaches A only
        (3, 6, "A", "2026-01-01 00:00:01"),
        (3, 7, "C", "2026-01-01 00:00:02"),
        # user 4 never does A
        (4, 8, "B", "2026-01-01 00:00:01"),
    ]
    got = {
        r["step_idx"]: (r["step"], r["n_keys"])
        for r in funnel(_events(spark, rows), ["A", "B", "C"]).collect()
    }
    assert got == {0: ("A", 3), 1: ("B", 1), 2: ("C", 1)}


def test_funnel_equal_ts_uses_tiebreak(spark):
    from pagerank_spark.operators.sequences import funnel

    # same timestamp everywhere: event_id order decides A-then-B
    rows = [
        (1, 1, "A", "2026-01-01 00:00:00"),
        (1, 2, "B", "2026-01-01 00:00:00"),
        (2, 4, "B", "2026-01-01 00:00:00"),
        (2, 5, "A", "2026-01-01 00:00:00"),
    ]
    df = _events(spark, rows)
    got = {r["step"]: r["n_keys"] for r in funnel(df, ["A", "B"]).collect()}
    assert got == {"A": 2, "B": 1}
    got_rep = {
        r["step"]: r["n_keys"] for r in funnel(df.repartition(7), ["A", "B"]).collect()
    }
    assert got_rep == got


def test_funnel_repeated_steps(spark):
    from pagerank_spark.operators.sequences import funnel

    # A A B: the SECOND A satisfies step 2 of [A, A, B]
    rows = [
        (1, 1, "A", "2026-01-01 00:00:01"),
        (1, 2, "A", "2026-01-01 00:00:02"),
        (1, 3, "B", "2026-01-01 00:00:03"),
        (2, 4, "A", "2026-01-01 00:00:01"),
        (2, 5, "B", "2026-01-01 00:00:02"),
    ]
    got = {
        r["step_idx"]: r["n_keys"]
        for r in funnel(_events(spark, rows), ["A", "A", "B"]).collect()
    }
    assert got == {0: 2, 1: 1, 2: 1}


def test_funnel_validation(spark):
    from pagerank_spark.operators.sequences import funnel

    with pytest.raises(ValueError):
        funnel(_events(spark, [(1, 1, "A", "2026-01-01 00:00:00")]), [])


def test_cohort_retention_closed_form(spark):
    from pagerank_spark.operators.sequences import cohort_retention

    # weekly buckets from epoch; user 1 first in week W, active W and W+2;
    # user 2 first in week W+1, active W+1 twice (distinct-counted once)
    rows = [
        (1, 1, "x", "2026-01-01 00:00:00"),
        (1, 2, "x", "2026-01-15 00:00:00"),
        (2, 3, "x", "2026-01-08 00:00:00"),
        (2, 4, "x", "2026-01-09 00:00:00"),
    ]
    got = {
        (r["cohort"], r["offset"]): r["n_active"]
        for r in cohort_retention(_events(spark, rows)).collect()
    }
    cohorts = sorted({c for c, _ in got})
    w1 = cohorts[0]
    # user 1: offsets 0 and 2; user 2 (one week later): offset 0 only
    assert got[(w1, 0)] == 1 and got[(w1, 2)] == 1
    assert got[(w1 + 1, 0)] == 1
    assert (w1 + 1, 1) not in got and len(got) == 3
