"""Stream-stream interval joins: correlate two event streams on a key within
a bounded event-time window.

The canonical Structured Streaming stateful-join shape (the one streaming
facility the repo did not yet cover): an INNER equi-join on a key plus an
event-time range predicate, with watermarks on BOTH inputs so each side's
buffered state is purged once the other side's watermark passes the range
bound — state is proportional to (rate x lookback), never stream lifetime.
Without the time-range condition Spark would have to buffer both streams
forever; with it, this operator survives unbounded streams at any rate.

Unified batch/stream API (repo-wide streaming contract, cf.
streaming/windows.py): on batch DataFrames ``withWatermark`` is a no-op and
the identical plan computes the exact interval join, which is what the
DuckDB oracle gate value-checks and what the streamed==batch parity test
compares micro-batch unions against.

Reference parity: the reference engine has no streaming (SURVEY.md §2.3);
this is mandate breadth for the transcript pipeline — e.g. attributing a
purchase/tool-invocation to the views/turns that preceded it within a
bounded window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["interval_join", "run_interval_join_stream"]


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    lookback: str = "1 hour",
    watermark: str = "2 hours",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Inner-join ``right`` rows to each ``left`` row with the same key whose
    timestamp falls in ``[left.ts - lookback, left.ts]``.

    Non-key columns are prefixed (``l_``/``r_``) so arbitrary payload schemas
    can't collide. The range predicate is part of the JOIN condition — on
    streams that is what lets Spark derive a state-eviction bound from the
    two watermarks; on batch frames Catalyst plans the same condition as a
    post-join filter on the equi-join, so no cross product appears either
    way (the key equality carries the shuffle).
    """
    lcols = [F.col(key_col)] + [
        F.col(c).alias(left_prefix + c) for c in left.columns if c != key_col
    ]
    rcols = [F.col(key_col).alias("__rkey")] + [
        F.col(c).alias(right_prefix + c) for c in right.columns if c != key_col
    ]
    lf = left.select(*lcols)
    rf = right.select(*rcols)
    lts, rts = left_prefix + ts_col, right_prefix + ts_col
    if lf.isStreaming:
        lf = lf.withWatermark(lts, watermark)
    if rf.isStreaming:
        rf = rf.withWatermark(rts, watermark)
    cond = (
        (F.col(key_col) == F.col("__rkey"))
        & (F.col(rts) >= F.col(lts) - F.expr(f"INTERVAL {lookback}"))
        & (F.col(rts) <= F.col(lts))
    )
    return lf.join(rf, cond, "inner").drop("__rkey")


def run_interval_join_stream(
    spark,
    left_path: str,
    right_path: str,
    out_path: str,
    checkpoint: str,
    schema,
    key_col: str = "user_id",
    ts_col: str = "ts",
    lookback: str = "1 hour",
    watermark: str = "2 hours",
) -> None:
    """Drain pending files on both sides through the interval join
    (availableNow). Inner stream-stream joins emit rows as matches arrive,
    so append mode needs no watermark-crossing to produce output; the
    checkpoint persists both sides' buffered state, so a later drain joins
    newly arrived rows against previously seen opposite-side rows that are
    still inside the watermark (the incremental-parity test exercises
    exactly this restart path)."""
    lf = spark.readStream.schema(schema).parquet(left_path)
    rf = spark.readStream.schema(schema).parquet(right_path)
    joined = interval_join(
        lf, rf, key_col=key_col, ts_col=ts_col, lookback=lookback, watermark=watermark
    )
    q = (
        joined.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
