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

__all__ = ["train_bigram_lm", "lm_score", "train_kneser_ney", "kneser_ney_score", "min_k_surprisal"]


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


def train_kneser_ney(
    docs: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame, int]:
    """Interpolated Kneser-Ney bigram statistics (Kneser & Ney 1995; Chen &
    Goodman 1999 — public methodology; the smoothing KenLM implements and
    CCNet scores with).

    Returns ``(pairs, ctx, cont, b_types)``:

    * ``pairs``  = ``(bigram, c12)`` — bigram occurrence counts,
    * ``ctx``    = ``(w1, c1, n1f)`` — per-context total count and distinct
      successor-type count ``N1+(w1, ·)``,
    * ``cont``   = ``(w2, n1b)`` — distinct predecessor-type count
      ``N1+(·, w2)`` (the continuation counts — KN's insight is that a
      word's probability mass under backoff should track in how many
      CONTEXTS it appears, not how often),
    * ``b_types`` = total distinct bigram types ``N1+(·, ·)``.

    Scale shape: three map-side-combined aggregates over ONE exploded
    bigram stream (``ctx``/``cont``/``b_types`` all derive from ``pairs``,
    which is localCheckpointed so the corpus is scanned once). All count
    tables are vocabulary-sized. One small driver action (``b_types``).
    """
    pairs = (
        docs.select(F.explode(F.expr(_bigrams_expr(text_col))).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("c12"))
        .localCheckpoint()
    )
    split_w = pairs.select(
        F.expr("split(bigram, ' ')[0]").alias("w1"),
        F.expr("split(bigram, ' ')[1]").alias("w2"),
        "c12",
    )
    ctx = (
        split_w.groupBy("w1")
        .agg(F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("n1f"))
        .localCheckpoint()
    )
    cont = (
        split_w.groupBy("w2").agg(F.count(F.lit(1)).alias("n1b")).localCheckpoint()
    )
    b_types = pairs.count()
    return pairs, ctx, cont, b_types


def kneser_ney_score(
    docs: DataFrame,
    pairs: DataFrame,
    ctx: DataFrame,
    cont: DataFrame,
    b_types: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document surprisal under the interpolated KN bigram model with
    absolute discount ``D = 3/4``:

    ``P(w2|w1) = (max(c12 - D, 0) + D · N1f(w1) · Pcont(w2)) / c1``,
    ``Pcont(w2) = N1b(w2) / B``.

    Every probability is the exact rational ``num / den`` with

    ``num = max(4·c12 − 3, 0)·B + 3·N1f·max(N1b, 1)``, ``den = 4·c1·B``

    (the 3/4 discount cleared to integers — no float constants), and the
    fallback for an unseen context is the continuation unigram
    ``max(N1b, 1) / B``. Since interpolated KN is a proper distribution,
    ``num ≤ den`` and surprisal is non-negative. Per-term surprisal
    ``LN(den) − LN(num)`` is computed as two LNs of exactly-representable
    BIGINTs, each rounded to integer NANOunits before the subtraction and
    the per-document sum — the document score is an exact,
    reduction-order-independent BIGINT (repo-wide hash-stability
    discipline).

    Returns ``(id_col, n_bigrams, kn_nano, avg_kn_nano)``. Scale shape:
    the corpus is exploded once; three co-partitioned (or AQE-broadcast)
    left joins against vocabulary-sized stats tables; no Python.
    """
    terms = (
        docs.select(
            F.col(id_col), F.explode_outer(F.expr(_bigrams_expr(text_col))).alias("bigram")
        )
        .withColumn("w1", F.expr("split(bigram, ' ')[0]"))
        .withColumn("w2", F.expr("split(bigram, ' ')[1]"))
    )
    B = F.lit(int(b_types))
    joined = (
        terms.join(pairs, "bigram", "left")
        .join(ctx, "w1", "left")
        .join(cont, "w2", "left")
        .select(
            F.col(id_col),
            F.col("bigram"),
            F.coalesce(F.col("c12"), F.lit(0)).alias("c12n"),
            F.coalesce(F.col("c1"), F.lit(0)).alias("c1n"),
            F.coalesce(F.col("n1f"), F.lit(0)).alias("n1fn"),
            F.greatest(F.coalesce(F.col("n1b"), F.lit(0)), F.lit(1)).alias("n1b1"),
        )
    )
    num = F.when(
        F.col("c1n") > 0,
        F.greatest(F.lit(4) * F.col("c12n") - F.lit(3), F.lit(0)) * B
        + F.lit(3) * F.col("n1fn") * F.col("n1b1"),
    ).otherwise(F.lit(4) * F.col("n1b1"))
    den = F.when(F.col("c1n") > 0, F.lit(4) * F.col("c1n") * B).otherwise(F.lit(4) * B)
    sp = (
        F.round(F.log(den.cast("double")) * F.lit(1000000000.0)).cast("bigint")
        - F.round(F.log(num.cast("double")) * F.lit(1000000000.0)).cast("bigint")
    )
    scored = joined.select(
        F.col(id_col),
        F.when(F.col("bigram").isNull(), F.lit(None).cast("bigint")).otherwise(sp).alias(
            "sp_nano"
        ),
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count("sp_nano").alias("n_bigrams"),
            F.coalesce(F.sum("sp_nano"), F.lit(0)).alias("kn_nano"),
        )
        .select(
            id_col,
            "n_bigrams",
            "kn_nano",
            F.expr("IF(n_bigrams = 0, 0L, kn_nano div n_bigrams)").alias("avg_kn_nano"),
        )
    )


def min_k_surprisal(
    docs: DataFrame,
    unigrams: DataFrame,
    bigrams: DataFrame,
    vocab_size: int,
    k_pct: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
    add_k: int = 1,
) -> DataFrame:
    """Min-K% Prob membership-inference signal (Shi et al. 2023,
    "Detecting Pretraining Data from Large Language Models" — public
    methodology): a document the model has memorized has NO
    low-probability outlier tokens, so the mean log-likelihood of its k%
    LEAST-probable tokens (= highest-surprisal, under this engine's
    bigram LM) separates trained-on from unseen text better than full-doc
    perplexity. The deduplication/decontamination counterpart to
    :func:`lm_score`: run it over candidate training docs against an
    eval-set-trained LM to flag leakage.

    Per document: the same add-k bigram micro-surprisals as
    :func:`lm_score`, sorted descending inside one grouped
    ``sort_array(collect_list(...))``, the top ``m = ceil(n·k/100)``
    summed with a codegen'd fold. Exact BIGINTs end to end.

    Scale shape: identical to lm_score (one explode, two co-partitioned
    joins) plus one grouped sort whose per-key state is the document's own
    bigram count — the sessionization bound. Returns
    ``(id_col, n_bigrams, m_topk, mink_sum_micro, mink_avg_micro)``.
    """
    if not (0 < k_pct <= 100):
        raise ValueError("k_pct must be in (0, 100]")
    terms = docs.select(
        F.col(id_col), F.explode_outer(F.expr(_bigrams_expr(text_col))).alias("bigram")
    ).withColumn("w1", F.expr("split(bigram, ' ')[0]"))
    sp = F.when(F.col("bigram").isNull(), F.lit(None).cast("bigint")).otherwise(
        F.round(
            -F.log(
                (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(add_k)).cast("double")
                / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(add_k) * F.lit(vocab_size))
            )
            * F.lit(1000000.0)
        ).cast("bigint")
    )
    scored = (
        terms.join(bigrams, "bigram", "left")
        .join(unigrams, "w1", "left")
        .select(F.col(id_col), sp.alias("sp_micro"))
    )
    agg = scored.groupBy(id_col).agg(
        F.count("sp_micro").alias("n_bigrams"),
        F.reverse(F.sort_array(F.collect_list("sp_micro"))).alias("__arr"),
    )
    m = F.expr(f"(n_bigrams * {int(k_pct)} + 99) div 100")
    return agg.select(
        id_col,
        "n_bigrams",
        m.alias("m_topk"),
        F.expr(
            "aggregate(slice(__arr, 1, CAST(m_topk AS INT)), 0L, (a, x) -> a + x)"
        ).alias("mink_sum_micro"),
        F.expr(
            f"IF(n_bigrams = 0, 0L, "
            f"aggregate(slice(__arr, 1, CAST(m_topk AS INT)), 0L, (a, x) -> a + x) "
            f"div ((n_bigrams * {int(k_pct)} + 99) div 100))"
        ).alias("mink_avg_micro"),
    )
