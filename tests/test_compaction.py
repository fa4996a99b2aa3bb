"""Histogram + compaction plan: exact-integer replays and edge cases."""

import pytest

from pagerank_spark.operators.compaction import compaction_plan, value_histogram


def test_histogram_exact_bins(spark):
    vals = list(range(0, 100))  # lo=0 hi=99, R=100, 10 bins of 10
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {r.bin: (r.lo, r.hi, r.n) for r in value_histogram(df, "v", 10).collect()}
    assert got == {b: (0, 99, 10) for b in range(10)}


def test_histogram_max_lands_in_last_bin(spark):
    df = spark.createDataFrame([(3,), (7,), (7,)], "v long")
    got = sorted((r.bin, r.n) for r in value_histogram(df, "v", 4).collect())
    # R = 5; v=3 -> (0*4+12)//5 = 2 ... bin=(v-3)*4//5: 3->0, 7->3
    assert got == [(0, 1), (3, 2)]


def test_histogram_constant_column_single_bin(spark):
    df = spark.createDataFrame([(5,)] * 4, "v long")
    got = value_histogram(df, "v", 8).collect()
    assert len(got) == 1 and (got[0].bin, got[0].n) == (0, 4)


def test_compaction_greedy_fill(spark):
    rows = [("p", i, 40) for i in range(1, 7)]  # six 40-byte files, target 100
    df = spark.createDataFrame(rows, "part_key string, file_id long, size_bytes long")
    got = {r.file_id: r.out_group for r in compaction_plan(df, 100, ["part_key"]).collect()}
    # cum_before: 0,40,80,120,160,200 -> groups 0,0,0,1,1,2
    assert got == {1: 0, 2: 0, 3: 0, 4: 1, 5: 1, 6: 2}


def test_compaction_partitions_independent(spark):
    rows = [("a", 1, 90), ("a", 2, 90), ("b", 1, 90), ("b", 2, 90)]
    df = spark.createDataFrame(rows, "part_key string, file_id long, size_bytes long")
    got = {(r.part_key, r.file_id): r.out_group
           for r in compaction_plan(df, 100, ["part_key"]).collect()}
    assert got == {("a", 1): 0, ("a", 2): 0, ("b", 1): 0, ("b", 2): 0}


def test_compaction_no_partition_cols_single_stream(spark):
    rows = [(i, 60) for i in range(1, 5)]
    df = spark.createDataFrame(rows, "file_id long, size_bytes long")
    got = {r.file_id: r.out_group for r in compaction_plan(df, 100, []).collect()}
    # cum_before 0,60,120,180 -> 0,0,1,1
    assert got == {1: 0, 2: 0, 3: 1, 4: 1}


def test_bad_args(spark):
    df = spark.createDataFrame([(1, 1)], "file_id long, size_bytes long")
    with pytest.raises(ValueError):
        value_histogram(df, "size_bytes", 0)
    with pytest.raises(ValueError):
        compaction_plan(df, 0, [])
