"""Streaming LM scoring (streaming/quality.py): streamed union of
micro-batch outputs == batch lm_score on the same documents."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from pagerank_spark.operators.lm import lm_score, train_bigram_lm
from pagerank_spark.streaming.quality import run_quality_stream, score_stream

DOC_SCHEMA = StructType(
    [StructField("doc_id", LongType()), StructField("text", StringType())]
)


def _docs(spark, lo, hi):
    from pagerank_spark.sources.docs import synth_docs

    return synth_docs(spark, hi, dup_every=10).filter(
        (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
    )


def test_streamed_scores_match_batch(spark, tmp_path):
    in_dir, out_dir, ck = (str(tmp_path / d) for d in ("in", "out", "ck"))
    train = _docs(spark, 0, 80)
    uni, bi, v = train_bigram_lm(train)

    # two incremental drains against the same checkpoint
    _docs(spark, 0, 50).write.mode("append").parquet(in_dir)
    run_quality_stream(spark, in_dir, out_dir, ck, DOC_SCHEMA, uni, bi, v)
    _docs(spark, 50, 120).write.mode("append").parquet(in_dir)
    run_quality_stream(spark, in_dir, out_dir, ck, DOC_SCHEMA, uni, bi, v)

    got = {
        r["doc_id"]: (r["n_bigrams"], r["surprisal_micro"], r["avg_surprisal_micro"])
        for r in spark.read.parquet(out_dir).collect()
    }
    want = {
        r["doc_id"]: (r["n_bigrams"], r["surprisal_micro"], r["avg_surprisal_micro"])
        for r in lm_score(_docs(spark, 0, 120), uni, bi, v).collect()
    }
    assert got == want  # every doc scored exactly once, values batch-equal


def test_streaming_lm_tables_rejected(spark, tmp_path):
    in_dir = str(tmp_path / "in2")
    _docs(spark, 0, 10).write.parquet(in_dir)
    stream = spark.readStream.schema(DOC_SCHEMA).parquet(in_dir)
    uni, bi, v = train_bigram_lm(_docs(spark, 0, 10))
    with pytest.raises(ValueError):
        score_stream(_docs(spark, 0, 10), stream.select(F.col("doc_id").alias("w1"), F.lit(1).alias("c1")), bi, v)
