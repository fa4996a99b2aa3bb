"""Streaming deduplication with watermark-bounded state.

The training-pipeline counterpart of operators/dedup.py for data in flight:
duplicate events (redelivered webhooks, at-least-once ingest) must be
dropped exactly once WITHOUT keeping every key ever seen in state. Spark's
``dropDuplicatesWithinWatermark`` keeps a key in state only until the
watermark passes its event time — state is bounded by (arrival rate x
watermark delay), not by stream lifetime, which is the only shape that
survives an unbounded 100-TB/day stream.

Semantics: duplicates arriving within the watermark delay of the first
occurrence are dropped; a duplicate arriving later than the watermark delay
is treated as new (the deliberate state/completeness trade — callers
needing total exactness run the batch ``mode="exact"`` pass downstream).

Batch parity (unified API): on a batch DataFrame the same function computes
an exact ``dropDuplicates`` — the streamed result over micro-batches must
equal it whenever all duplicate pairs arrive within the watermark, which is
what the tests assert.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dedup_events(
    events: DataFrame,
    keys: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark: str = "30 minutes",
    mode: str = "watermarked",
) -> DataFrame:
    """Drop duplicate rows per ``keys`` (first occurrence wins).

    ``mode="watermarked"``: state bounded by the watermark (scale path).
    ``mode="exact"``: unbounded state on a stream — only for bounded
    backfills; on batch frames both modes are the exact distinct.
    """
    if mode not in ("watermarked", "exact"):
        raise ValueError(f"unknown mode {mode!r}")
    src = events.withColumn("__ts", F.col(ts_col).cast("timestamp"))
    if src.isStreaming and mode == "watermarked":
        out = src.withWatermark("__ts", watermark).dropDuplicatesWithinWatermark(list(keys))
    else:
        out = src.dropDuplicates(list(keys))
    return out.drop("__ts")


def run_dedup_stream(
    spark,
    in_path: str,
    out_path: str,
    checkpoint: str,
    schema,
    keys: tuple[str, ...] = ("event_id",),
    watermark: str = "30 minutes",
) -> None:
    """Drain pending files through watermarked dedup (availableNow).

    Dedup is not an aggregation, so append mode emits each first occurrence
    in the micro-batch it arrives — incremental runs against the same
    checkpoint emit every distinct key exactly once.
    """
    stream = spark.readStream.schema(schema).parquet(in_path)
    out = dedup_events(stream, keys=keys, watermark=watermark)
    q = (
        out.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
