"""As-of join and bucketed range join (operators/temporal.py): values vs
pandas merge_asof / brute-force, and plan shape (no nested-loop join)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from pagerank_spark.operators.temporal import asof_join, range_join_points_intervals


def _asof_fixture(spark, seed=0):
    rng = np.random.default_rng(seed)
    n_l, n_r = 400, 300
    left = pd.DataFrame({
        "key": rng.integers(0, 8, n_l),
        "t": rng.integers(0, 10_000, n_l).astype("int64"),
        "lval": np.arange(n_l, dtype="int64"),
    })
    right = pd.DataFrame({
        "key": rng.integers(0, 8, n_r),
        "t": rng.integers(0, 10_000, n_r).astype("int64"),
        "rval": rng.integers(0, 1_000_000, n_r).astype("int64"),
    }).drop_duplicates(["key", "t"])  # unique (key, t): deterministic ties
    return left, right


def test_asof_join_matches_merge_asof(spark):
    left, right = _asof_fixture(spark)
    ldf = spark.createDataFrame(left)
    rdf = spark.createDataFrame(right)
    got = (
        asof_join(ldf, rdf, on="t", by="key", value_cols=["rval"])
        .toPandas()
        .sort_values("lval")
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        left.sort_values("t", kind="stable"),
        right.sort_values("t", kind="stable"),
        on="t", by="key", direction="backward", suffixes=("", "_r"),
    ).sort_values("lval").reset_index(drop=True)
    assert len(got) == len(left)
    lhs = got["rval"].fillna(-1).astype("int64").to_numpy()
    rhs = want["rval"].fillna(-1).astype("int64").to_numpy()
    assert (lhs == rhs).all()


def test_asof_join_inclusive_and_unmatched(spark):
    ldf = spark.createDataFrame(
        [(1, 100, "a"), (1, 50, "b"), (2, 10, "c")], "key long, t long, tag string"
    )
    rdf = spark.createDataFrame(
        [(1, 100, 7.0), (1, 60, 5.0), (2, 11, 9.0)], "key long, t long, v double"
    )
    got = {r["tag"]: r["v"] for r in asof_join(ldf, rdf, on="t", by="key", value_cols=["v"]).collect()}
    assert got["a"] == 7.0     # equal timestamps match (inclusive)
    assert got["b"] is None    # right rows strictly after -> unmatched
    assert got["c"] is None    # key 2's only right row is in the future


def test_asof_join_carries_multiple_value_cols_with_suffix(spark):
    ldf = spark.createDataFrame([(1, 10, 0.0)], "key long, t long, v double")
    rdf = spark.createDataFrame([(1, 5, 3.0, 4.0)], "key long, t long, v double, w double")
    row = asof_join(ldf, rdf, on="t", by="key", value_cols=["v", "w"]).collect()[0]
    assert row["v"] == 0.0 and row["v_right"] == 3.0 and row["w"] == 4.0


@pytest.mark.parametrize("bucket_width", [0.7, 5.0, 300.0])
def test_range_join_matches_bruteforce(spark, bucket_width):
    rng = np.random.default_rng(3)
    pts = pd.DataFrame({"pid": np.arange(500, dtype="int64"),
                        "x": np.round(rng.uniform(-100, 100, 500), 3)})
    lo = np.round(rng.uniform(-110, 100, 80), 3)
    ivals = pd.DataFrame({"iid": np.arange(80, dtype="int64"), "lo": lo,
                          "hi": np.round(lo + rng.uniform(0, 25, 80), 3)})
    got = {
        (r["pid"], r["iid"])
        for r in range_join_points_intervals(
            spark.createDataFrame(pts), spark.createDataFrame(ivals),
            "x", "lo", "hi", bucket_width=bucket_width,
        ).collect()
    }
    want = {
        (int(p.pid), int(i.iid))
        for p in pts.itertuples()
        for i in ivals.itertuples()
        if i.lo <= p.x <= i.hi
    }
    assert got == want and len(want) > 0


def test_range_join_plan_has_no_nested_loop(spark):
    """The bucketed formulation must plan as an equi-join on the bucket key;
    the naive BETWEEN theta-join would be a BroadcastNestedLoopJoin."""
    pts = spark.range(1000).select(F.col("id").alias("pid"), (F.col("id") * 0.37).alias("x"))
    iv = spark.range(50).select(
        F.col("id").alias("iid"), (F.col("id") * 7.0).alias("lo"), (F.col("id") * 7.0 + 3).alias("hi")
    )
    out = range_join_points_intervals(pts, iv, "x", "lo", "hi", bucket_width=10.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "Join" in plan


def test_range_join_degenerate_intervals_and_negative_width(spark):
    pts = spark.createDataFrame([(0, 5.0)], "pid long, x double")
    iv = spark.createDataFrame([(0, 9.0, 1.0)], "iid long, lo double, hi double")  # hi < lo
    assert range_join_points_intervals(pts, iv, "x", "lo", "hi", 1.0).count() == 0
    with pytest.raises(ValueError):
        range_join_points_intervals(pts, iv, "x", "lo", "hi", 0.0)


def test_transition_matrix_counts_and_probs(spark):
    from datetime import datetime

    from pagerank_spark.operators.sequences import transition_matrix

    t = datetime(2024, 1, 1)
    rows = [
        # user 1: A -> B -> A -> C ; user 2: B -> B
        (0, t, 1, "A"), (1, t, 1, "B"), (2, t, 1, "A"), (3, t, 1, "C"),
        (4, t, 2, "B"), (5, t, 2, "B"),
    ]
    ev = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "event_type"])
    got = {(r["src"], r["dst"]): (r["n"], r["prob"]) for r in transition_matrix(ev).collect()}
    # equal timestamps: event_id tiebreak makes the order deterministic
    assert got[("A", "B")] == (1, 0.5) and got[("A", "C")] == (1, 0.5)
    assert got[("B", "A")] == (1, 0.5) and got[("B", "B")] == (1, 0.5)
    assert ("C", "A") not in got  # C is terminal for user 1
    assert len(got) == 4


def test_rolling_time_agg_window_bounds(spark):
    from datetime import datetime, timedelta

    from pagerank_spark.operators.temporal import rolling_time_agg

    t0 = datetime(2024, 1, 1)
    rows = [
        (0, t0, 1, 10.0),
        (1, t0 + timedelta(seconds=30), 1, 20.0),
        (2, t0 + timedelta(seconds=61), 1, 40.0),   # event 0 fell out of a 60s window
        (3, t0, 2, 5.0),
    ]
    ev = spark.createDataFrame(rows, ["event_id", "ts", "user_id", "value"])
    got = {r["event_id"]: (r["n_window"], r["sum_window"]) for r in rolling_time_agg(ev, 60).collect()}
    assert got[0] == (1, 10.0)
    assert got[1] == (2, 30.0)
    assert got[2] == (2, 60.0)  # events 1 and 2 within [1s, 61s]
    assert got[3] == (1, 5.0)   # other key isolated


def test_snapshot_diff_classes(spark):
    from pagerank_spark.operators.temporal import snapshot_diff

    old = spark.createDataFrame([(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)], ["k", "s", "v"])
    new = spark.createDataFrame([(2, "b", 2.0), (3, "C", 3.0), (4, "d", 4.0)], ["k", "s", "v"])
    got = {r["k"]: r["change"] for r in snapshot_diff(old, new, ["k"]).collect()}
    assert got == {1: "removed", 3: "changed", 4: "added"}  # 2 unchanged -> omitted
