"""Bucketed co-located join (plans/bucketing.py): plan shape + values."""

import pytest
from pyspark.sql import functions as F

from pagerank_spark.plans.bucketing import (
    bucketed_join,
    exchanges_in_plan,
    write_bucketed,
)


@pytest.fixture()
def no_broadcast(spark):
    # force a real join strategy so the Exchange assertion is about
    # bucketing, not about broadcast elision
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _tables(spark, tmp_path):
    left = spark.range(20_000).select(
        F.col("id").alias("k"), (F.col("id") * 7 % 100).alias("a")
    )
    right = spark.range(0, 20_000, 2).select(
        F.col("id").alias("k"), (F.col("id") * 13 % 100).alias("b")
    )
    write_bucketed(left, "bk_left", "k", 8, path=str(tmp_path / "l"))
    write_bucketed(right, "bk_right", "k", 8, path=str(tmp_path / "r"))
    return left, right


def test_bucketed_join_has_no_exchange(spark, tmp_path, no_broadcast):
    left, right = _tables(spark, tmp_path)
    try:
        j = bucketed_join(spark, "bk_left", "bk_right", "k")
        rows = j.count()
        assert rows == 10_000
        assert exchanges_in_plan(j) == 0

        # control: the same join over non-bucketed frames shuffles both sides
        plain = left.join(right, "k")
        plain.count()
        assert exchanges_in_plan(plain) >= 2
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_left")
        spark.sql("DROP TABLE IF EXISTS bk_right")


def test_bucketed_join_values_match_plain(spark, tmp_path, no_broadcast):
    left, right = _tables(spark, tmp_path)
    try:
        j = bucketed_join(spark, "bk_left", "bk_right", "k")
        got = sorted(tuple(r) for r in j.select("k", "a", "b").collect())
        exp = sorted(tuple(r) for r in left.join(right, "k").select("k", "a", "b").collect())
        assert got == exp
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_left")
        spark.sql("DROP TABLE IF EXISTS bk_right")


def test_one_sided_bucketing_shuffles_once(spark, tmp_path, no_broadcast):
    left, _ = _tables(spark, tmp_path)
    try:
        probe = spark.range(20_000).select(F.col("id").alias("k"))
        j = spark.table("bk_left").join(probe, "k")
        j.count()
        # only the non-bucketed probe side needs an Exchange
        assert exchanges_in_plan(j) == 1
    finally:
        spark.sql("DROP TABLE IF EXISTS bk_left")
        spark.sql("DROP TABLE IF EXISTS bk_right")


def test_chunk_segments_cover_budget(spark):
    """chunk_segments (operators/packing.py): interior chunks sum to the
    budget, segments tile without overlap, cu_seqlens reconstructible."""
    from pagerank_spark.operators.packing import chunk_segments

    docs = [(i, " ".join(["w"] * ((i * 13) % 40 + 1))) for i in range(60)]
    docs.append((100, ""))  # zero-token doc must emit no segment
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = chunk_segments(df, budget=64).collect()
    assert all(r["doc_id"] != 100 for r in rows)
    by_chunk = {}
    for r in rows:
        by_chunk.setdefault(r["chunk"], []).append(r)
    total_tokens = sum((i * 13) % 40 + 1 for i in range(60))
    n_chunks = max(by_chunk) + 1
    for c, segs in by_chunk.items():
        segs.sort(key=lambda r: r["seg_idx"])
        # segments tile the chunk contiguously from 0
        off = 0
        for s in segs:
            assert s["seg_start"] == off
            assert s["seg_len"] > 0
            off += s["seg_len"]
        expected = 64 if c < n_chunks - 1 else total_tokens - 64 * (n_chunks - 1)
        assert off == expected
        # seg order is doc order
        ids = [s["doc_id"] for s in segs]
        assert ids == sorted(ids)
