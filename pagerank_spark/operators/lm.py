"""N-gram language-model training and perplexity-style document scoring.

CCNet (Wenzek et al. 2020, "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data" — public methodology) filters web corpora by
language-model perplexity: documents whose text is improbable under a model
trained on a trusted corpus are dropped or down-weighted. CCNet uses a
pretrained KenLM; this module implements the same pipeline shape natively —
a bigram LM with add-k smoothing trained distributively on a reference
corpus, then applied as a per-document score.

Scale shape (the 100-TB lens):

* **Training** is two map-side-combined aggregates (unigram counts, bigram
  counts) over the exploded token stream — the classic word-count plan.
  The count tables are vocabulary-sized (weeks of crawl → millions of rows,
  not trillions) and live as DataFrames partitioned by token key.
* **Scoring** explodes each document's bigrams once and joins them against
  the count tables on the n-gram key. Both sides shuffle-partition on the
  same key, so the join is co-located; when the LM fits in memory Spark's
  AQE broadcasts it instead. The corpus is scanned exactly once.
* **No Python anywhere** — tokenization, n-gram construction, smoothing,
  and the log-sum are all codegen'd Catalyst expressions.

Hash-stable outputs: each bigram's log-probability is rounded to integer
microunits *before* the per-document sum, so the sum is an exact BIGINT and
independent of reduction order (the repo-wide discipline for float-derived
gate outputs). Reference parity target: estherlyoon/pagerank has no text
pipeline; this extends the engine's LLM-data-prep surface (SURVEY §2c).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["train_bigram_lm", "lm_score"]


def _bigrams_expr(text_col: str) -> str:
    """Space-joined adjacent word pairs of ``split(text, ' ')`` — identical
    to the convention in :mod:`.textops` (top_ngrams), so LM scores and
    repetition signals see the same tokens."""
    return (
        f"IF(size(split({text_col}, ' ')) < 2, array(),"
        f" transform(sequence(1, size(split({text_col}, ' ')) - 1),"
        f" i -> concat(element_at(split({text_col}, ' '), i), ' ',"
        f" element_at(split({text_col}, ' '), i + 1))))"
    )


def train_bigram_lm(docs: DataFrame, text_col: str = "text") -> tuple[DataFrame, DataFrame, int]:
    """Count-based bigram LM over the reference corpus.

    Returns ``(unigrams, bigrams, vocab_size)`` where ``unigrams`` is
    ``(w1, c1)`` (occurrences of each word anywhere in the stream),
    ``bigrams`` is ``(bigram, c12)`` and ``vocab_size`` the distinct word
    count. Two shuffles total, both map-side combined; one small action for
    the vocabulary size (a single BIGINT to the driver).
    """
    words = docs.select(F.explode(F.split(F.col(text_col), " ")).alias("w1"))
    # training IS materialization: localCheckpoint the count tables so the
    # scoring join reads the trained LM instead of re-running both
    # aggregates inside its own plan (they'd execute once per downstream
    # action otherwise)
    unigrams = words.groupBy("w1").agg(F.count(F.lit(1)).alias("c1")).localCheckpoint()
    bigrams = (
        docs.select(F.explode(F.expr(_bigrams_expr(text_col))).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("c12"))
        .localCheckpoint()
    )
    vocab_size = unigrams.count()
    return unigrams, bigrams, vocab_size


def lm_score(
    docs: DataFrame,
    unigrams: DataFrame,
    bigrams: DataFrame,
    vocab_size: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    add_k: int = 1,
) -> DataFrame:
    """Per-document bigram log-likelihood under the trained LM.

    ``P(w2 | w1) = (c(w1 w2) + k) / (c(w1) + k * V)`` — add-k smoothing, so
    out-of-vocabulary bigrams score finitely. Per-term surprisal
    ``-LN(p)`` is rounded to integer microunits *before* summing, making
    the document score an exact, reduction-order-independent BIGINT.
    Surprisal is strictly positive (``p < 1`` always under add-k with
    ``V > 1``), which keeps the rounding and the integer mean away from
    engine-divergent negative-division semantics.

    Returns ``(id_col, n_bigrams, surprisal_micro, avg_surprisal_micro)``:
    total bigram count, summed micro-surprisal, and its exact integer mean
    (0 for documents shorter than two words). Higher average ⇒ higher
    perplexity ⇒ less like the training corpus — CCNet drops or
    down-weights the top tail.
    """
    terms = docs.select(
        F.col(id_col), F.explode_outer(F.expr(_bigrams_expr(text_col))).alias("bigram")
    ).withColumn("w1", F.expr("split(bigram, ' ')[0]"))
    scored = (
        terms.join(bigrams, "bigram", "left")
        .join(unigrams, "w1", "left")
        .select(
            F.col(id_col),
            F.when(
                F.col("bigram").isNull(), F.lit(None).cast("bigint")
            ).otherwise(
                F.round(
                    -F.log(
                        (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(add_k)).cast("double")
                        / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(add_k) * F.lit(vocab_size))
                    )
                    * F.lit(1000000.0)
                ).cast("bigint")
            ).alias("sp_micro"),
        )
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("sp_micro").alias("n_bigrams"),
            F.coalesce(F.sum("sp_micro"), F.lit(0)).alias("surprisal_micro"),
        )
        .select(
            id_col,
            "n_bigrams",
            "surprisal_micro",
            F.expr("IF(n_bigrams = 0, 0L, surprisal_micro div n_bigrams)").alias(
                "avg_surprisal_micro"
            ),
        )
    )
