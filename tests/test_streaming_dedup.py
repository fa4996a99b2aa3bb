"""Watermarked streaming dedup: streamed result == batch distinct when all
duplicate pairs arrive within the watermark, including duplicates that
straddle micro-batch boundaries (the case per-batch dropDuplicates without
state would miss)."""

import datetime

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from pagerank_spark.streaming.dedup import dedup_events, run_dedup_stream

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def _events_with_dups(spark, lo, hi):
    """Each logical event appears twice: original at t(id) and a redelivery
    120s later (well inside the 30m watermark). Payloads identical, so the
    deduped set is deterministic regardless of which copy wins."""
    base = spark.range(lo, hi).select(
        F.col("id").alias("event_id"),
        (F.to_timestamp(F.lit("2026-01-01 00:00:00")) + F.make_interval(secs=F.col("id") * 13)).alias("ts"),
        F.lit("click").alias("event_type"),
        (F.pmod(F.xxhash64("id"), F.lit(1000)) / 100.0).alias("value"),
    )
    redelivered = base.withColumn("ts", F.col("ts") + F.make_interval(secs=F.lit(120)))
    # dedup key is event_id alone; ts differs between the copies but the
    # emitted row's ts is whichever copy won — project it away downstream
    return base.unionByName(redelivered)


def test_streamed_dedup_matches_batch(spark, tmp_path):
    in_dir, out_dir, ck = (str(tmp_path / d) for d in ("in", "out", "ck"))

    # batch 1: events 0..200 + their redeliveries; batch 2: 200..400 plus a
    # RE-redelivery of 150..200 (duplicate straddling the batch boundary)
    _events_with_dups(spark, 0, 200).write.mode("append").parquet(in_dir)
    run_dedup_stream(spark, in_dir, out_dir, ck, EVENT_SCHEMA)
    _events_with_dups(spark, 200, 400).unionByName(
        _events_with_dups(spark, 150, 200)
    ).write.mode("append").parquet(in_dir)
    run_dedup_stream(spark, in_dir, out_dir, ck, EVENT_SCHEMA)

    got = spark.read.parquet(out_dir).select("event_id", "event_type", "value")
    ids = [r["event_id"] for r in got.collect()]
    assert sorted(ids) == list(range(400))  # every id exactly once
    # values match the batch-exact distinct
    batch = (
        dedup_events(_events_with_dups(spark, 0, 400), mode="exact")
        .select("event_id", "event_type", "value")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))


def test_batch_mode_is_exact_distinct(spark):
    df = _events_with_dups(spark, 0, 50)
    out = dedup_events(df)
    assert out.count() == 50
    assert out.columns == ["event_id", "ts", "event_type", "value"]
