"""MERGE/upsert (operators/temporal.py:merge_upsert): update/insert/keep/
delete semantics, schema contract, idempotence."""

import pytest

from pagerank_spark.operators.temporal import merge_upsert


def _t(spark, rows):
    return spark.createDataFrame(rows, "k long, val string")


def test_update_insert_keep_delete(spark):
    target = _t(spark, [(1, "a"), (2, "b"), (3, "c")])
    source = spark.createDataFrame(
        [(2, "B", False), (4, "d", False), (3, None, True)],
        "k long, val string, del boolean",
    )
    got = {
        (r["k"], r["val"])
        for r in merge_upsert(target, source, ["k"], delete_col="del").collect()
    }
    # 1 kept, 2 updated, 3 deleted, 4 inserted
    assert got == {(1, "a"), (2, "B"), (4, "d")}


def test_plain_upsert_without_deletes(spark):
    target = _t(spark, [(1, "a"), (2, "b")])
    source = _t(spark, [(2, "B"), (5, "e")])
    got = {(r["k"], r["val"]) for r in merge_upsert(target, source, ["k"]).collect()}
    assert got == {(1, "a"), (2, "B"), (5, "e")}


def test_merge_is_idempotent(spark):
    target = _t(spark, [(1, "a"), (2, "b"), (3, "c")])
    source = spark.createDataFrame(
        [(2, "B", False), (3, None, True)], "k long, val string, del boolean"
    )
    once = merge_upsert(target, source, ["k"], delete_col="del")
    twice = merge_upsert(once, source, ["k"], delete_col="del")
    assert sorted((r["k"], r["val"]) for r in once.collect()) == sorted(
        (r["k"], r["val"]) for r in twice.collect()
    )


def test_null_delete_flag_means_upsert(spark):
    target = _t(spark, [(1, "a")])
    source = spark.createDataFrame([(1, "A", None)], "k long, val string, del boolean")
    got = {(r["k"], r["val"]) for r in merge_upsert(target, source, ["k"], "del").collect()}
    assert got == {(1, "A")}


def test_schema_mismatch_rejected(spark):
    target = _t(spark, [(1, "a")])
    bad = spark.createDataFrame([(1, "a", 2)], "k long, val string, extra long")
    with pytest.raises(ValueError):
        merge_upsert(target, bad, ["k"])
