"""Windowed streaming aggregation: streamed result == batch result, and the
watermark finalizes windows exactly once across incremental runs."""

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from pagerank_spark.streaming.windows import run_windowed_stream, windowed_counts

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def _events(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("event_id"),
        (F.to_timestamp(F.lit("2026-01-01 00:00:00")) + F.make_interval(secs=F.col("id") * 37)).alias("ts"),
        F.element_at(
            F.array(F.lit("click"), F.lit("view"), F.lit("buy")),
            (F.pmod(F.xxhash64("id"), F.lit(3)) + 1).cast("int"),
        ).alias("event_type"),
        (F.pmod(F.xxhash64("id", F.lit("v")), F.lit(1000)) / 100.0).alias("value"),
    )


def test_windowed_stream_matches_batch(spark, tmp_path):
    in_dir, out_dir, ck = (str(tmp_path / d) for d in ("in", "out", "ck"))
    all_events = _events(spark, 0, 600)

    # two ordered micro-batches, then a final empty-ish batch far in the
    # future so the watermark passes every real window (append mode only
    # emits finalized windows)
    _events(spark, 0, 300).write.mode("append").parquet(in_dir)
    run_windowed_stream(spark, in_dir, out_dir, ck, EVENT_SCHEMA)
    _events(spark, 300, 600).write.mode("append").parquet(in_dir)
    run_windowed_stream(spark, in_dir, out_dir, ck, EVENT_SCHEMA)
    flush = spark.createDataFrame(
        [(999999, __import__("datetime").datetime(2026, 2, 1), "click", 0.0)], EVENT_SCHEMA
    )
    flush.write.mode("append").parquet(in_dir)
    run_windowed_stream(spark, in_dir, out_dir, ck, EVENT_SCHEMA)

    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in spark.read.parquet(out_dir).collect()
    }
    expected = {
        (r["window_start"], r["event_type"]): (r["n"], r["sum_value"])
        for r in windowed_counts(all_events).collect()
    }
    # every real window from the batch computation appears exactly once
    for k, v in expected.items():
        assert got[k] == v, k
    # and nothing extra beyond the flush row's own window
    extras = set(got) - set(expected)
    assert all(k[0].month == 2 for k in extras)


def test_session_window_stream_matches_batch(spark, tmp_path):
    """Native session_window: streamed (availableNow, append) sessions equal
    the batch computation over the same rows."""
    from pagerank_spark.streaming.windows import run_session_stream, session_window_stats

    USER_SCHEMA = StructType(
        [
            StructField("event_id", LongType()),
            StructField("ts", TimestampType()),
            StructField("user_id", LongType()),
            StructField("value", DoubleType()),
        ]
    )

    def users(lo, hi):
        # 5 users; inter-event gaps alternate under/over the 10-minute gap so
        # every user gets several distinct sessions
        return spark.range(lo, hi).select(
            F.col("id").alias("event_id"),
            (F.to_timestamp(F.lit("2026-01-01 00:00:00")) + F.make_interval(secs=F.col("id") * 173)).alias("ts"),
            F.pmod(F.col("id"), F.lit(5)).alias("user_id"),
            (F.pmod(F.xxhash64("id", F.lit("v")), F.lit(1000)) / 100.0).alias("value"),
        )

    in_dir, out_dir, ck = (str(tmp_path / d) for d in ("sin", "sout", "sck"))
    users(0, 200).write.mode("append").parquet(in_dir)
    run_session_stream(spark, in_dir, out_dir, ck, USER_SCHEMA, gap="10 minutes", watermark="1 hour")
    users(200, 400).write.mode("append").parquet(in_dir)
    run_session_stream(spark, in_dir, out_dir, ck, USER_SCHEMA, gap="10 minutes", watermark="1 hour")
    flush = spark.createDataFrame(
        [(999999, __import__("datetime").datetime(2026, 3, 1), 0, 0.0)], USER_SCHEMA
    )
    flush.write.mode("append").parquet(in_dir)
    run_session_stream(spark, in_dir, out_dir, ck, USER_SCHEMA, gap="10 minutes", watermark="1 hour")

    got = {
        (r["user_id"], r["session_start"], r["session_end"]): (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(out_dir).collect()
    }
    expected = {
        (r["user_id"], r["session_start"], r["session_end"]): (r["n_events"], r["sum_value"])
        for r in session_window_stats(users(0, 400), gap="10 minutes").collect()
    }
    for k, v in expected.items():
        assert got[k] == v, k
    extras = set(got) - set(expected)
    assert all(k[1].month == 3 for k in extras)  # only the flush row's session
