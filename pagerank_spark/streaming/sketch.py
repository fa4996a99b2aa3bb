"""Streaming sketch maintenance: keep a count-min sketch current over an
unbounded key stream.

Sketches are the natural streaming aggregate — cells MERGE BY SUM
(operators/sketches.py), so each micro-batch writes only its own
``depth x width`` partial cells (foreachBatch append, exactly-once via the
checkpoint's batch-id tracking) and the live sketch is the cell-wise sum of
everything written so far. State never grows with the stream: the sink holds
one bounded cell table per batch and readers collapse it on demand
(:func:`read_cms`), compactable at any time by rewriting the summed cells.

The parity contract (repo-wide): drain N files through the stream, and the
summed cells equal ``cms_build`` over the same rows as one batch — which is
what the test asserts, micro-batch boundaries and restarts included.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.sketches import cms_build

__all__ = ["run_cms_stream", "read_cms"]


def run_cms_stream(
    spark,
    in_path: str,
    out_path: str,
    checkpoint: str,
    schema,
    key_col: str,
    depth: int = 3,
    width: int = 128,
    salt: int = 17,
) -> None:
    """Drain pending files, appending each micro-batch's partial CMS cells
    (availableNow; incremental runs against the same checkpoint process only
    new files)."""

    def _build_batch(batch_df: DataFrame, batch_id: int) -> None:
        cms_build(batch_df, key_col, depth=depth, width=width, salt=salt).write.mode(
            "append"
        ).parquet(out_path)

    stream = spark.readStream.schema(schema).parquet(in_path)
    q = (
        stream.writeStream.foreachBatch(_build_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def read_cms(spark, out_path: str) -> DataFrame:
    """The live sketch: cell-wise sum of all appended partials."""
    return (
        spark.read.parquet(out_path)
        .groupBy("row", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )
