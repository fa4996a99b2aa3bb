"""Distributed two-phase cumulative sum == single-partition window sum."""

import math
import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from pagerank_spark.operators.cumsum import distributed_cumsum


def test_cumsum_long_exact_with_negatives(spark):
    rng = random.Random(9)
    rows = [(i, rng.randrange(-50, 100)) for i in range(10_000)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "k long, v long")
    out = {r.k: r.cumsum for r in distributed_cumsum(df, ["k"], "v", num_partitions=8).collect()}
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    exp = {r.k: r.c for r in df.select("k", F.sum("v").over(w).alias("c")).collect()}
    assert out == exp


def test_cumsum_double_and_tiebreak_order(spark):
    rng = random.Random(4)
    # duplicate leading keys: the tiebreak column makes the order total
    rows = [(i % 50, i, rng.random()) for i in range(2_000)]
    rng.shuffle(rows)
    df = spark.createDataFrame(rows, "g long, k long, v double")
    out = {r.k: r.cumsum for r in distributed_cumsum(df, ["g", "k"], "v", num_partitions=8).collect()}
    w = Window.orderBy("g", "k").rowsBetween(Window.unboundedPreceding, 0)
    exp = {r.k: r.c for r in df.select("k", F.sum("v").over(w).alias("c")).collect()}
    assert all(math.isclose(out[k], exp[k], rel_tol=1e-9, abs_tol=1e-12) for k in exp)


def test_cumsum_plan_has_no_window(spark):
    df = spark.range(100).select(F.col("id").alias("k"), (F.col("id") % 7).alias("v"))
    plan = distributed_cumsum(df, ["k"], "v", num_partitions=4)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan  # the whole point: no single-partition window
