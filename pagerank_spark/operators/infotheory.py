"""Token-distribution divergence between corpus slices — entropy, KL, JS.

The data-mixture diagnostics an LLM-training pipeline runs before blending
sources (Kullback & Leibler 1951; Lin 1991 for Jensen-Shannon — public
methodology): given two corpus slices A and B, estimate their unigram
distributions P and Q over the union vocabulary with add-k smoothing
(``p = (c + k) / (T + k*V)`` — smoothing keeps every KL term finite) and
report Shannon entropies H(P), H(Q), both directed divergences
KL(P||Q) / KL(Q||P), and the symmetric bounded JS divergence.

Distributed shape (100-TB lens): tokens are exploded ONCE over the two
slices and reduced by a single map-side-combined ``groupBy(tok)`` into a
vocabulary-sized table with both slice counts as conditional aggregates —
the corpus is scanned once and shuffled once, by token. Totals and the
vocabulary size ride back into the plan as a one-row cross join (no
driver round-trip), and every per-token term is a codegen'd expression.
Output is ONE row.

Hash-stability (repo discipline, operators/lm.py:24 / hyptest.py): each
per-token float term is rounded to integer NANO units BEFORE the final
sum, so the BIGINT sums are reduction-order independent; the smoothed
probabilities are exact-integer ratios evaluated with one correctly-
rounded IEEE divide, and ``LN`` is the only transcendental (same exposure
as the LM/NB/BM25 gates, guarded by the strict sweep).

Reference parity: none (single-query reference); LLM-ops mandate breadth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["token_divergence", "mutual_information", "transition_entropy", "token_class_chi2", "psi"]

_NANO = 1_000_000_000


def _nano(col):
    return F.round(col * _NANO).cast("long")


def token_divergence(
    docs: DataFrame,
    group_col: str,
    group_a: str,
    group_b: str,
    text_col: str = "text",
    add_k: int = 1,
) -> DataFrame:
    """One row: exact counts + nano-unit entropy/KL/JS between two slices.

    Columns: ``n_vocab, tot_a, tot_b`` (exact BIGINT over the union
    vocabulary / slice token totals) and ``entropy_a_nano, entropy_b_nano,
    kl_ab_nano, kl_ba_nano, js_nano`` (BIGINT sums of per-token
    nano-rounded terms; natural log).
    """
    from pagerank_spark.operators.classify import _tokens

    toks = _tokens(
        docs.filter(F.col(group_col).isin([group_a, group_b])),
        [group_col],
        text_col,
    )
    # the vocab table feeds BOTH the totals aggregate and the terms
    # projection — materialize it once (plan barrier, similarity.py:196
    # precedent) so the corpus is tokenized/shuffled exactly once
    vocab = toks.groupBy("tok").agg(
        F.sum(F.when(F.col(group_col) == group_a, 1).otherwise(0)).alias("c_a"),
        F.sum(F.when(F.col(group_col) == group_b, 1).otherwise(0)).alias("c_b"),
    ).localCheckpoint()
    totals = vocab.agg(
        F.count(F.lit(1)).alias("n_vocab"),
        F.sum("c_a").alias("tot_a"),
        F.sum("c_b").alias("tot_b"),
    )
    k = F.lit(float(add_k))
    p = (F.col("c_a") + k) / (F.col("tot_a") + k * F.col("n_vocab"))
    q = (F.col("c_b") + k) / (F.col("tot_b") + k * F.col("n_vocab"))
    terms = vocab.crossJoin(F.broadcast(totals)).select(
        "n_vocab",
        "tot_a",
        "tot_b",
        _nano(-p * F.log(p)).alias("ha"),
        _nano(-q * F.log(q)).alias("hb"),
        _nano(p * F.log(p / q)).alias("kab"),
        _nano(q * F.log(q / p)).alias("kba"),
        _nano(
            F.lit(0.5)
            * (p * F.log(p / ((p + q) / F.lit(2.0)))
               + q * F.log(q / ((p + q) / F.lit(2.0))))
        ).alias("js"),
    )
    return terms.groupBy("n_vocab", "tot_a", "tot_b").agg(
        F.sum("ha").alias("entropy_a_nano"),
        F.sum("hb").alias("entropy_b_nano"),
        F.sum("kab").alias("kl_ab_nano"),
        F.sum("kba").alias("kl_ba_nano"),
        F.sum("js").alias("js_nano"),
    )


def mutual_information(
    df: DataFrame,
    label_expr: str,
    features: dict[str, str],
) -> DataFrame:
    """Mutual information I(feature; label) per integer-binned feature — the
    standard filter-method feature ranking (Cover & Thomas, public
    methodology), over a binary label.

    ``features`` maps name -> integer SQL bin expression (the
    operators/trees.py convention — caller owns the grid); ``label_expr``
    is a boolean SQL expression. NULL bins are excluded per feature.

    Scale shape: identical to the stump histogram — one scan, one explode,
    one map-side-combined count keyed by ``(feature, bin, label)``;
    marginals are windows over that ``n_features x n_bins x 2`` reduction,
    never the corpus. Exact BIGINT cell counts; each cell's
    ``(n_xy/T) * ln(n_xy*T/(n_x*n_y))`` term is one fixed IEEE sequence
    nano-rounded BEFORE the per-feature sum (reduction-order free).
    Returns ``(feature, n_cells, n_rows, mi_nano)``.
    """
    if not features:
        raise ValueError("mutual_information: need at least one feature")
    pairs = ", ".join(
        f"named_struct('f', '{name}', 'b', CAST(({expr}) AS BIGINT))"
        for name, expr in sorted(features.items())
    )
    cells = (
        df.select(
            F.expr(f"array({pairs})").alias("fb"),
            F.expr(label_expr).cast("boolean").cast("int").alias("y"),
        )
        .select(F.explode("fb").alias("fb"), "y")
        .select(F.col("fb.f").alias("feature"), F.col("fb.b").alias("bin"), "y")
        .filter(F.col("bin").isNotNull())
        .groupBy("feature", "bin", "y")
        .agg(F.count(F.lit(1)).alias("n_xy"))
    )
    wf = Window.partitionBy("feature")
    wx = Window.partitionBy("feature", "bin")
    wy = Window.partitionBy("feature", "y")
    m = cells.select(
        "feature",
        F.col("n_xy").cast("double").alias("nxy"),
        F.sum("n_xy").over(wx).cast("double").alias("nx"),
        F.sum("n_xy").over(wy).cast("double").alias("ny"),
        F.sum("n_xy").over(wf).cast("double").alias("t"),
    )
    term = (F.col("nxy") / F.col("t")) * F.log(
        F.col("nxy") * F.col("t") / (F.col("nx") * F.col("ny"))
    )
    return m.groupBy("feature").agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.max(F.col("t").cast("long")).alias("n_rows"),
        F.sum(_nano(term)).alias("mi_nano"),
    )


def transition_entropy(
    events: DataFrame,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Per-state next-step entropy of the first-order behavior chain:
    H(next | cur = s) over consecutive same-key event pairs — the
    predictability profile of a Markov process (a state with near-zero
    entropy is a deterministic funnel step; a high-entropy state is a
    branching point).

    Shape: one keyed lead window derives the (cur, next) pairs, one
    map-side-combined groupBy counts cells, totals ride back via a
    broadcast join, and each cell's ``-p ln p`` term is nano-rounded
    BEFORE the per-state BIGINT sum (module discipline — reduction-order
    free; LN is the only transcendental, strict-sweep guarded).

    Returns ``(state, n_pairs, n_next_states, entropy_nano)``.
    """
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(tiebreak_col))
    pairs = (
        events.withColumn("__nxt", F.lead(state_col).over(w))
        .where(F.col("__nxt").isNotNull())
        .select(F.col(state_col).alias("cur"), F.col("__nxt"))
    )
    cells = pairs.groupBy("cur", "__nxt").agg(F.count(F.lit(1)).alias("c"))
    totals = cells.groupBy("cur").agg(
        F.sum("c").alias("t"), F.count(F.lit(1)).alias("n_next_states")
    )
    p = F.col("c").cast("double") / F.col("t").cast("double")
    terms = cells.join(totals, "cur").select(
        "cur", "t", "n_next_states", _nano(-p * F.log(p)).alias("h")
    )
    return terms.groupBy(F.col("cur").alias("state")).agg(
        F.max("t").alias("n_pairs"),
        F.max("n_next_states").alias("n_next_states"),
        F.sum("h").alias("entropy_nano"),
    )


def token_class_chi2(
    docs: DataFrame,
    class_col,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_df: int = 2,
    k: int = 30,
) -> DataFrame:
    """Chi-square feature selection (Yang & Pedersen 1997 — public
    methodology): for every token, the 2x2 chi-square of the
    token-presence x class contingency table over DOCUMENTS, one-vs-rest
    against the binary ``class_col`` — the standard screen for picking
    class-predictive vocabulary before training a text classifier.

    With a = class docs containing the token, b = other docs containing
    it, c = class docs without it, d = the rest, and N the corpus size:

        chi2 = N * (a*d - b*c)^2 / ((a+b) * (c+d) * (a+c) * (b+d))

    Every cell is an exact BIGINT from ONE distinct-presence shuffle (the
    corpus is scanned once; presence, not frequency, per the cited
    formulation); the statistic is one exact integral division in
    DECIMAL(38) (Spark decimal ``DIV`` == DuckDB HUGEINT ``//`` on
    non-negative operands — the bm25 rule; the squared numerator makes the
    sign non-negative by construction). Output is the top-``k`` tokens by
    ``(chi2_micro DESC, token ASC)`` — a deterministic unique order, so
    the result is a well-defined multiset. Tokens in fewer than ``min_df``
    documents are dropped (singleton tokens have spurious chi2).

    Returns ``(token, df, df_class, chi2_micro)``.
    """
    toks = docs.select(
        F.col(id_col).alias("__id"),
        class_col.cast("long").alias("__cls"),
        F.explode(
            F.filter(
                F.split(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"),
                lambda x: F.length(x) > 0,
            )
        ).alias("token"),
    ).distinct()
    tot = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(class_col.cast("long")).alias("n_class"),
    )
    per = (
        toks.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("__cls").alias("df_class"),
        )
        .filter(F.col("df") >= int(min_df))
        .crossJoin(tot)
    )
    chi2 = (
        "CAST(n_docs AS DECIMAL(38, 0))"
        " * (df_class * (n_docs - n_class - df + df_class)"
        "    - (df - df_class) * (n_class - df_class))"
        " * (df_class * (n_docs - n_class - df + df_class)"
        "    - (df - df_class) * (n_class - df_class))"
        " * 1000000"
        " DIV (CAST(df AS DECIMAL(38, 0)) * (n_docs - df)"
        "      * n_class * (n_docs - n_class))"
    )
    guarded = (
        "CASE WHEN df < n_docs AND n_class > 0 AND n_class < n_docs"
        f" THEN CAST(({chi2}) AS BIGINT) ELSE CAST(0 AS BIGINT) END"
    )
    return (
        per.select("token", "df", "df_class", F.expr(guarded).alias("chi2_micro"))
        .orderBy(F.col("chi2_micro").desc(), F.col("token").asc())
        .limit(int(k))
    )


def psi(
    df: DataFrame,
    slice_col,
    bin_col,
) -> DataFrame:
    """Population Stability Index (the standard credit-scoring /
    model-monitoring drift metric — public methodology; a symmetrized
    binned KL): ``PSI = sum over bins (p_b - q_b) * ln(p_b / q_b)``
    between the ``slice_col = 0`` (baseline) and ``= 1`` (current)
    populations of the caller-binned integer ``bin_col`` (binning is the
    caller's contract, the quantile/stump convention). Rule-of-thumb
    thresholds: < 0.1 stable, 0.1-0.25 drifting, > 0.25 shifted.

    Add-1 smoothing over the union bin set keeps every term finite (the
    token_divergence convention). ONE map-side-combined aggregation to the
    bin table (conditional counts per slice), totals ride back in-plan;
    each per-bin term is nano-rounded BEFORE the (order-free, BIGINT) sum.
    Returns ONE row: ``(n_base, n_cur, n_bins, psi_nano)``.
    """
    rows = df.select(
        slice_col.cast("long").alias("sl"), bin_col.cast("long").alias("b")
    )
    # one corpus scan: the bin table feeds both the totals and the terms,
    # so it is eagerly truncated (Catalyst does not dedup the two subtrees)
    bins = rows.groupBy("b").agg(
        F.sum(F.lit(1) - F.col("sl")).alias("ca"),
        F.sum("sl").alias("cb"),
    ).localCheckpoint()
    tot = bins.agg(
        F.sum("ca").alias("ta"),
        F.sum("cb").alias("tb"),
        F.count(F.lit(1)).alias("nb"),
    )
    pa = "(CAST(ca + 1 AS DOUBLE) / CAST(ta + nb AS DOUBLE))"
    pb = "(CAST(cb + 1 AS DOUBLE) / CAST(tb + nb AS DOUBLE))"
    term = f"CAST(ROUND(({pa} - {pb}) * LN({pa} / {pb}) * 1000000000.0) AS BIGINT)"
    return (
        bins.crossJoin(F.broadcast(tot))
        .select("ta", "tb", "nb", F.expr(term).alias("t"))
        .groupBy("ta", "tb", "nb")
        .agg(F.sum("t").alias("psi_nano"))
        .select(
            F.col("ta").alias("n_base"),
            F.col("tb").alias("n_cur"),
            F.col("nb").cast("long").alias("n_bins"),
            F.col("psi_nano"),
        )
    )
