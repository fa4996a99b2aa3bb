"""Exact discrete quantiles (operators/packing.py::exact_quantiles)."""

import math

from pyspark.sql import functions as F

from pagerank_spark.operators.packing import exact_quantiles


def _py_q(xs, num, den):
    s = sorted(xs)
    k = -(-num * len(s) // den)  # ceil
    return s[k - 1], k


def _check(spark, xs, qs):
    df = spark.createDataFrame([(x,) for x in xs], ["v"])
    got = {(r["q_num"], r["q_den"]): (r["value"], r["k"], r["n"]) for r in exact_quantiles(df, "v", qs).collect()}
    for num, den in qs:
        want_v, want_k = _py_q(xs, num, den)
        assert got[(num, den)] == (want_v, want_k, len(xs)), (num, den)


def test_quantiles_match_sorted_indexing(spark):
    xs = [((i * 37) % 101) for i in range(200)]
    _check(spark, xs, [(1, 4), (1, 2), (3, 4), (9, 10), (99, 100), (1, 1)])


def test_quantiles_with_heavy_ties(spark):
    xs = [5] * 90 + [1] * 5 + [9] * 5
    _check(spark, xs, [(1, 100), (1, 20), (1, 2), (19, 20), (1, 1)])


def test_median_odd_even(spark):
    _check(spark, [1, 2, 3, 4, 5], [(1, 2)])      # k=3 -> 3
    _check(spark, [1, 2, 3, 4], [(1, 2)])          # k=2 -> 2 (lower median)


def test_quantiles_repartition_stable(spark):
    xs = [((i * 13) % 29) for i in range(500)]
    df = spark.createDataFrame([(x,) for x in xs], ["v"])
    a = sorted(map(tuple, exact_quantiles(df.repartition(3), "v", [(1, 2), (3, 4)]).collect()))
    b = sorted(map(tuple, exact_quantiles(df.repartition(19), "v", [(1, 2), (3, 4)]).collect()))
    assert a == b


def test_grouped_quantiles_match_per_group_sorting(spark):
    from pagerank_spark.operators.packing import grouped_exact_quantiles

    rows = [("a", (i * 7) % 31) for i in range(57)] + [("b", (i * 11) % 13) for i in range(24)]
    df = spark.createDataFrame(rows, ["g", "v"])
    got = {
        (r["g"], r["q_num"], r["q_den"]): (r["value"], r["k"], r["n"])
        for r in grouped_exact_quantiles(df, "g", "v", [(1, 2), (3, 4)]).collect()
    }
    for g in ("a", "b"):
        xs = sorted(v for gg, v in rows if gg == g)
        for num, den in ((1, 2), (3, 4)):
            k = -(-num * len(xs) // den)
            assert got[(g, num, den)] == (xs[k - 1], k, len(xs)), (g, num, den)


def test_quantile_plans_have_no_global_window(spark):
    from pagerank_spark.operators.packing import grouped_exact_quantiles

    df = spark.createDataFrame([("a", i % 7) for i in range(50)], ["g", "v"])
    p1 = exact_quantiles(df.select("v"), "v", [(1, 2)])._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in p1  # prefix sum is the two-phase cumsum, not a window
    p2 = grouped_exact_quantiles(df, "g", "v", [(1, 2)])._jdf.queryExecution().executedPlan().toString()
    # the grouped window must be keyed (hash partitioned), never global:
    # every SinglePartition exchange in this plan would be a scale cliff
    # except the one-row global aggregates, which this plan doesn't need
    assert "SinglePartition" not in p2


def test_weighted_quantiles_match_expansion(spark):
    from pagerank_spark.operators.packing import exact_quantiles, weighted_exact_quantiles

    rows = [((i * 7) % 31, 1 + (i % 4)) for i in range(57)]
    df = spark.createDataFrame(rows, ["v", "w"])
    got = {
        (r["q_num"], r["q_den"]): (r["value"], r["k"], r["n"])
        for r in weighted_exact_quantiles(df, "v", "w", [(1, 4), (1, 2), (3, 4)]).collect()
    }
    # ground truth: physically expand each row w times, take discrete quantiles
    flat = sorted(v for v, w in rows for _ in range(w))
    for num, den in ((1, 4), (1, 2), (3, 4)):
        k = -(-num * len(flat) // den)
        assert got[(num, den)] == (flat[k - 1], k, len(flat)), (num, den)
    # weight 1 everywhere recovers the unweighted operator exactly
    ones = df.select("v", F.lit(1).alias("w"))
    a = sorted(map(tuple, weighted_exact_quantiles(ones, "v", "w", [(1, 2)]).collect()))
    b = sorted(map(tuple, exact_quantiles(df.select("v"), "v", [(1, 2)]).collect()))
    assert a == b


def test_weighted_quantile_plan_has_no_window(spark):
    from pagerank_spark.operators.packing import weighted_exact_quantiles

    df = spark.createDataFrame([(i % 7, 2) for i in range(50)], ["v", "w"])
    p = weighted_exact_quantiles(df, "v", "w", [(1, 2)])._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in p
