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
