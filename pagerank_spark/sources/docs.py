"""Deterministic synthetic document corpus (columnar, scales to any N).

Generates pseudo-text docs entirely with JVM column expressions (no Python,
no driver-side data): each doc is ``n_tokens`` pseudo-words drawn from a
hash-derived vocabulary. A ``dup_every`` fraction of docs are exact
duplicates of their predecessor (content is derived from a *content key*,
so doc ``i`` with ``i % dup_every == 1`` shares the key of doc ``i-1``) —
planted groups for dedup benchmarks where the expected group structure is
known in closed form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def synth_docs(
    spark: SparkSession,
    n: int,
    n_tokens: int = 20,
    vocab: int = 5000,
    dup_every: int = 100,
    seed: int = 33,
) -> DataFrame:
    """``(doc_id long, text string)``: docs with ``i % dup_every == 1``
    exact-duplicating doc ``i-1``; everything else unique w.h.p."""
    ids = spark.range(n).select(F.col("id").alias("doc_id"))
    ckey = F.when(
        (F.col("doc_id") % dup_every == 1) & (F.col("doc_id") > 0),
        F.col("doc_id") - 1,
    ).otherwise(F.col("doc_id"))
    words = F.transform(
        F.sequence(F.lit(0), F.lit(n_tokens - 1)),
        lambda i: F.concat(
            F.lit("w"),
            F.pmod(F.xxhash64(ckey, i, F.lit(seed)), F.lit(vocab)).cast("string"),
        ),
    )
    return ids.select("doc_id", F.array_join(words, " ").alias("text"))
