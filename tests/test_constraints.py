"""Constraint audit: planted violations of every kind, one-scan plan."""

import pytest

from pagerank_spark.operators.constraints import audit


def _report(spark, df, checks):
    return {r.check: (r.n_rows, r.n_violations) for r in audit(df, checks).collect()}


def test_all_check_kinds_planted(spark):
    rows = [
        (1, 10, "a"),
        (2, 500, "a"),   # range violation
        (2, 20, "b"),    # duplicate id
        (None, 30, "x"), # null id + in_set violation
        (9, None, "a"),  # null v is NOT a range violation
    ]
    df = spark.createDataFrame(rows, "id long, v long, s string")
    ref = spark.createDataFrame([(1,), (2,)], "k long")
    got = _report(
        spark,
        df,
        [
            ("not_null", "id"),
            ("range", "v", 0, 100),
            ("in_set", "s", ["a", "b"]),
            ("unique", ["id"]),
            ("fk", "id", ref, "k"),
        ],
    )
    assert got == {
        "not_null(id)": (5, 1),
        "range(v,0,100)": (5, 1),
        "in_set(s)": (5, 1),
        "unique(id)": (5, 2),  # both id=2 rows participate
        "fk(id->k)": (5, 1),   # id=9 orphan; NULL id is skipped
    }


def test_clean_table_all_zero(spark):
    df = spark.createDataFrame([(1, 5), (2, 6)], "id long, v long")
    got = _report(spark, df, [("not_null", "id"), ("unique", ["id"]), ("range", "v", 0, 10)])
    assert all(v == (2, 0) for v in got.values())


def test_row_level_checks_share_one_scan(spark):
    df = spark.createDataFrame([(1, 5)], "id long, v long")
    plan = audit(
        df, [("not_null", "id"), ("not_null", "v"), ("range", "v", 0, 9)]
    )._jdf.queryExecution().optimizedPlan().toString()
    # a single aggregate over a single relation: no join/union of scans
    assert plan.count("LogicalRDD") == 1


def test_bad_args(spark):
    df = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError):
        audit(df, [])
    with pytest.raises(ValueError):
        audit(df, [("bogus", "id")])
