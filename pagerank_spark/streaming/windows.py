"""Structured Streaming windowed aggregation with watermarked late data.

The reference has no streaming at all (SURVEY.md §2.3); this provides the
standard event-time facilities a transcript/event pipeline needs: tumbling-
window counts/sums with a watermark bounding state for late arrivals.

Batch parity: ``windowed_counts`` works identically on a batch DataFrame
(Spark's unified API), which is what the tests exploit — the streamed
result over micro-batches must equal the batch result over the same rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "event_type",
) -> DataFrame:
    """Tumbling-window counts + value sums per key.

    On a streaming DataFrame the watermark bounds state (late rows beyond it
    are dropped); on a batch DataFrame ``withWatermark`` is a no-op and the
    same plan computes the exact answer.
    """
    src = events.withColumn("__ts", F.col(ts_col).cast("timestamp"))
    if src.isStreaming:
        src = src.withWatermark("__ts", watermark)
    return (
        src.groupBy(F.window("__ts", window).alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col(key_col),
            "n",
            "sum_value",
        )
    )


def session_window_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
) -> DataFrame:
    """Gap-based session windows (native ``session_window``): per-user
    sessions close after ``gap`` of inactivity; emits per-session event
    counts and value sums. Unified batch/streaming: on a stream the
    watermark lets closed sessions finalize (append mode); on a batch frame
    the same plan computes the exact answer, which is what the parity test
    compares against.
    """
    src = events.withColumn("__ts", F.col(ts_col).cast("timestamp"))
    if src.isStreaming:
        src = src.withWatermark("__ts", watermark)
    return (
        src.groupBy(F.session_window("__ts", gap).alias("sess"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 6).alias("sum_value"))
        .select(
            F.col(key_col),
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def run_session_stream(spark, in_path: str, out_path: str, checkpoint: str, schema,
                       gap: str = "30 minutes", watermark: str = "2 hours") -> None:
    """Drain pending files through session-window aggregation (availableNow)."""
    stream = spark.readStream.schema(schema).parquet(in_path)
    agg = session_window_stats(stream, gap=gap, watermark=watermark)
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_windowed_stream(spark, in_path: str, out_path: str, checkpoint: str, schema) -> None:
    """Drain pending files through the windowed aggregation (availableNow).

    Append output mode: windows finalize only once the watermark passes, so
    repeated incremental runs emit each window at most once.
    """
    stream = spark.readStream.schema(schema).parquet(in_path)
    agg = windowed_counts(stream)
    q = (
        agg.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
