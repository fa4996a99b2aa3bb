"""IVM cell merges == full recompute, under arbitrary splits and chaining."""

import pytest
from pyspark.sql import functions as F

from pagerank_spark.operators.ivm import aggregate_cells, merge_aggregates


def _rows(spark, lo, hi):
    return spark.createDataFrame(
        [(i % 7, (i * 37) % 100 - 50) for i in range(lo, hi)], "k long, v long"
    )


def _collect(df):
    return {r.k: (r.n, r.sum_v, r.min_v, r.max_v) for r in df.collect()}


def test_split_merge_equals_full(spark):
    full = _collect(aggregate_cells(_rows(spark, 0, 200), ["k"], "v"))
    for cut in (1, 63, 199):
        a = aggregate_cells(_rows(spark, 0, cut), ["k"], "v")
        b = aggregate_cells(_rows(spark, cut, 200), ["k"], "v")
        assert _collect(merge_aggregates(a, b, keys=["k"])) == full


def test_merge_is_associative_and_chains(spark):
    parts = [aggregate_cells(_rows(spark, i * 50, (i + 1) * 50), ["k"], "v") for i in range(4)]
    all_at_once = _collect(merge_aggregates(*parts, keys=["k"]))
    chained = parts[0]
    for d in parts[1:]:
        chained = merge_aggregates(chained, d, keys=["k"])  # closure under merge
    assert _collect(chained) == all_at_once


def test_new_group_in_delta(spark):
    a = aggregate_cells(spark.createDataFrame([(1, 5)], "k long, v long"), ["k"], "v")
    b = aggregate_cells(spark.createDataFrame([(2, 7)], "k long, v long"), ["k"], "v")
    got = _collect(merge_aggregates(a, b, keys=["k"]))
    assert got == {1: (1, 5, 5, 5), 2: (1, 7, 7, 7)}


def test_schema_validation(spark):
    bad = spark.createDataFrame([(1, 1)], "k long, n long")
    with pytest.raises(ValueError):
        merge_aggregates(bad, keys=["k"])
    with pytest.raises(ValueError):
        merge_aggregates(keys=["k"])
