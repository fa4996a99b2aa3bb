"""Streaming corpus-quality scoring: stream-static joins against a trained
reference model.

The production shape for in-flight data curation: the LM count tables
(operators/lm.py) are trained ONCE on a trusted batch corpus, then every
arriving document is scored inside the stream — a stream-static equi-join,
which Structured Streaming executes stateless (the static side is planned
per micro-batch; with AQE it broadcasts when small). No state store, no
watermark needed: scoring is a pure per-row enrichment, so the operator
survives unbounded streams at any rate.

Unified batch/stream API: the same function on a batch DataFrame is exactly
``operators.lm.lm_score`` — the streamed union of micro-batch outputs must
equal the batch result on the same rows, which is what the parity test
asserts (the repo-wide streaming contract, cf. streaming/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.lm import lm_score

__all__ = ["score_stream"]


def score_stream(
    docs: DataFrame,
    unigrams: DataFrame,
    bigrams: DataFrame,
    vocab_size: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    add_k: int = 1,
) -> DataFrame:
    """Per-document LM surprisal on a (possibly streaming) document frame.

    ``unigrams`` / ``bigrams`` / ``vocab_size`` come from a batch
    ``train_bigram_lm`` run (they must be static — training on the stream
    itself would need a different, stateful design). The per-document
    aggregation keys on ``id_col`` only, so in streaming mode the plan is
    explode -> stream-static joins -> per-micro-batch grouped sum in
    APPEND-per-batch semantics via ``foreachBatch`` or complete-mode sinks;
    document rows are assumed not to straddle micro-batches (one row per
    document — the ingest contract)."""
    if unigrams.isStreaming or bigrams.isStreaming:
        raise ValueError("the LM count tables must be static (batch-trained)")
    return lm_score(
        docs, unigrams, bigrams, vocab_size, id_col=id_col, text_col=text_col, add_k=add_k
    )


def run_quality_stream(
    spark,
    in_path: str,
    out_path: str,
    checkpoint: str,
    schema,
    unigrams: DataFrame,
    bigrams: DataFrame,
    vocab_size: int,
    add_k: int = 1,
) -> None:
    """Drain pending document files through LM scoring (availableNow).

    Scoring is a pure per-document enrichment (one row in, one row out),
    so it runs in ``foreachBatch``: each micro-batch is scored as a batch
    frame (the stream-static joins against the trained LM broadcast under
    AQE) and appended — no state store, exactly-once via the checkpoint's
    batch-id dedup on the parquet sink side. Incremental runs against the
    same checkpoint score only new files."""

    def _score_batch(batch_df: DataFrame, batch_id: int) -> None:
        scored = score_stream(batch_df, unigrams, bigrams, vocab_size, add_k=add_k)
        scored.write.mode("append").parquet(out_path)

    stream = spark.readStream.schema(schema).parquet(in_path)
    q = (
        stream.writeStream.foreachBatch(_score_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
