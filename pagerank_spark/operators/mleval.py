"""Model-evaluation primitives — exact ROC-AUC and confusion matrices.

The two metrics every corpus-quality / routing model needs, computed as
exact integer statistics (no float reaches the output):

* :func:`auc_exact` — ROC-AUC via the Mann–Whitney U identity
  ``AUC = U / (n_pos * n_neg)`` with the standard average-rank tie
  handling. Computed WITHOUT a global sort or single-partition window:
  scores are grouped to distinct values (one map-side-combined aggregate),
  the negative-count prefix is a
  :func:`~pagerank_spark.operators.cumsum.distributed_cumsum` over that
  (distinct-score-sized) table, and
  ``2U = sum_s n_pos(s) * (2 * negs_below(s) + negs_at(s))`` — doubled so
  ties stay integral. ``auc_micro = 2U * 10^6 div (2 * n_pos * n_neg)``.
* :func:`confusion_matrix` — ``(actual, predicted, n)`` cell counts plus
  per-cell ``row_total`` so recall/precision are one division away;
  a single group-count over the joined prediction/label tables.

Scale shape: AUC's only per-row work is the score groupBy (the fact table
is scanned once); everything after runs on the distinct-score table. The
confusion matrix is one shuffle on (actual, predicted). Public
methodology: Mann & Whitney 1947; Hanley & McNeil 1982 (AUC = U
equivalence).

Reference parity: none (single-query reference); ML-evaluation mandate
breadth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .cumsum import distributed_cumsum

__all__ = ["auc_exact", "confusion_matrix", "cohen_kappa"]

_SCALE = 1_000_000


def auc_exact(df: DataFrame, score_col: str, label_col: str) -> DataFrame:
    """One row: ``(n_pos, n_neg, two_u, auc_micro)``.

    ``score_col`` must be integer-valued (micro-scale floats upstream);
    ``label_col`` is 0/1 (1 = positive). Higher score should mean "more
    positive"; ties contribute the standard 1/2.
    """
    g = (
        df.select(
            F.col(score_col).cast("long").alias("s"),
            F.col(label_col).cast("long").alias("y"),
        )
        .groupBy("s")
        .agg(
            F.sum("y").alias("np_s"),
            F.sum(F.lit(1) - F.col("y")).alias("nn_s"),
        )
    )
    c = distributed_cumsum(g, ["s"], "nn_s")
    terms = c.select(
        "np_s",
        "nn_s",
        (F.col("np_s") * (2 * (F.col("cumsum") - F.col("nn_s")) + F.col("nn_s"))).alias(
            "t2u"
        ),
    )
    return (
        terms.groupBy()
        .agg(
            F.sum("np_s").alias("n_pos"),
            F.sum("nn_s").alias("n_neg"),
            F.sum("t2u").alias("two_u"),
        )
        .select(
            "n_pos",
            "n_neg",
            "two_u",
            F.expr(f"two_u * {_SCALE} DIV (2 * n_pos * n_neg)").alias("auc_micro"),
        )
    )


def confusion_matrix(
    predictions: DataFrame,
    actual_col: str,
    predicted_col: str,
) -> DataFrame:
    """``(actual, predicted, n, row_total)`` — observed cells only."""
    cells = (
        predictions.select(
            F.col(actual_col).alias("actual"), F.col(predicted_col).alias("predicted")
        )
        .groupBy("actual", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rows = cells.groupBy("actual").agg(F.sum("n").alias("row_total"))
    return cells.join(F.broadcast(rows), "actual").select(
        "actual", "predicted", "n", "row_total"
    )


def cohen_kappa(
    predictions: DataFrame,
    actual_col: str,
    predicted_col: str,
) -> DataFrame:
    """One row: ``(total, diag, chance, kappa_micro)`` — inter-rater
    agreement (Cohen 1960, public methodology).

    With ``D`` = agreeing pairs, ``n`` = total, and ``S = sum_c row_c *
    col_c`` the chance-agreement numerator,
    ``kappa = (D/n - S/n^2) / (1 - S/n^2) = (D*n - S) / (n*n - S)`` —
    the output keeps ``n``/``D``/``S`` as exact BIGINTs and derives
    ``kappa_micro`` with ONE correctly-rounded double division, so the
    result is hash-stable (and negative kappa never hits the Spark-vs-
    DuckDB integer-division sign mismatch).

    Scale shape: one shuffle to the class-pair cells; rows/cols/S are
    class-count-sized aggregates of that tiny table.
    """
    cells = (
        predictions.select(
            F.col(actual_col).alias("a"), F.col(predicted_col).alias("p")
        )
        .groupBy("a", "p")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint()  # cells feed 4 aggregates below — one shuffle total
    )
    rows = cells.groupBy("a").agg(F.sum("n").alias("rt"))
    cols = cells.groupBy("p").agg(F.sum("n").alias("ct"))
    s = (
        rows.join(cols, rows["a"] == cols["p"], "inner")
        .agg(F.coalesce(F.sum(F.col("rt") * F.col("ct")), F.lit(0)).alias("chance"))
    )
    tot = cells.agg(
        F.sum("n").alias("total"),
        F.sum(F.when(F.col("a") == F.col("p"), F.col("n")).otherwise(0)).alias("diag"),
    )
    return tot.crossJoin(s).select(
        "total",
        "diag",
        "chance",
        F.round(
            (F.col("diag") * F.col("total") - F.col("chance")).cast("double")
            / (F.col("total") * F.col("total") - F.col("chance")).cast("double")
            * _SCALE
        )
        .cast("long")
        .alias("kappa_micro"),
    )


def reliability_curve(
    scored: DataFrame, score_col: str, label_col: str, n_bins: int = 10
) -> DataFrame:
    """Calibration / reliability curve: rank-based equal-mass score bins,
    per-bin mean score and empirical positive rate — the diagram behind
    ECE and every "is this score a probability?" check.

    Bin edges are the exact discrete quantiles ``i/n_bins`` from
    :func:`..operators.packing.exact_quantiles` (value histogram +
    distributed prefix sum — no sort, no value buffering); the edge list
    (n_bins-1 integers) is collected into ONE broadcast array and each row's
    bin is a codegen'd fold ``sum(score > edge_i)`` — ties lump into the
    lower bin, deterministically. Integer scores in, exact BIGINT sums per
    bin, two correctly-rounded divides out.

    Returns ``(bin, n, sum_score, pos, mean_score, pos_rate)``.
    """
    from .packing import exact_quantiles

    edges = exact_quantiles(
        scored.select(score_col), score_col, [(i, n_bins) for i in range(1, n_bins)]
    )
    earr = edges.groupBy().agg(F.sort_array(F.collect_list("value")).alias("__edges"))
    binned = scored.crossJoin(F.broadcast(earr)).select(
        F.expr(
            f"aggregate(__edges, 0, (b, t) -> b + IF({score_col} > t, 1, 0))"
        ).alias("bin"),
        F.col(score_col).cast("long").alias("__s"),
        F.col(label_col).cast("long").alias("__y"),
    )
    agg = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__s").alias("sum_score"),
        F.sum("__y").alias("pos"),
    )
    return agg.select(
        "bin",
        "n",
        "sum_score",
        "pos",
        (F.col("sum_score").cast("double") / F.col("n").cast("double")).alias("mean_score"),
        (F.col("pos").cast("double") / F.col("n").cast("double")).alias("pos_rate"),
    )


def partition_agreement(
    labels_a: DataFrame, labels_b: DataFrame, id_col: str = "id", label_col: str = "label"
) -> DataFrame:
    """Adjusted Rand Index between two vertex partitions (Hubert & Arabie
    1985, public methodology) — the standard clustering-agreement score,
    e.g. "do label propagation and connected components carve the graph
    the same way?".

    Pure pair-counting algebra, all exact BIGINTs from the (la, lb)
    contingency cells of the inner-joined id domain::

        sc = sum_ij C(n_ij, 2)   sa = sum_i C(a_i, 2)   sb = sum_j C(b_j, 2)
        ARI = (sc - sa*sb/T) / ((sa + sb)/2 - sa*sb/T),  T = C(n, 2)

    The only floats are the final fixed-sequence ratio (``sa*sb`` is
    lifted to double — exact while < 2^53; quantize by sharding if either
    partition exceeds ~3e9 same-cluster pairs). Emitted micro-scaled via
    floor(x+0.5); the degenerate denominator (both partitions trivial)
    emits NULL.

    Shape: one id-keyed join, one cell aggregation, marginals re-derived
    from the cell table (clusters-sized). Returns ``(n, sum_cells_pairs,
    sum_a_pairs, sum_b_pairs, ari_micro)``.
    """
    cells = (
        labels_a.select(F.col(id_col).alias("__i"), F.col(label_col).alias("__la"))
        .join(
            labels_b.select(F.col(id_col).alias("__i"), F.col(label_col).alias("__lb")),
            "__i",
        )
        .groupBy("__la", "__lb")
        .agg(F.count(F.lit(1)).alias("__c"))
        .localCheckpoint()  # feeds the cell sum + both marginals
    )
    pairs = lambda c: F.expr(f"{c} * ({c} - 1) DIV 2")  # noqa: E731  (exact BIGINT)
    sc = cells.groupBy().agg(
        F.sum("__c").alias("n"), F.sum(pairs("__c")).alias("sum_cells_pairs")
    )
    sa = (
        cells.groupBy("__la")
        .agg(F.sum("__c").alias("__c"))
        .groupBy()
        .agg(F.sum(pairs("__c")).alias("sum_a_pairs"))
    )
    sb = (
        cells.groupBy("__lb")
        .agg(F.sum("__c").alias("__c"))
        .groupBy()
        .agg(F.sum(pairs("__c")).alias("sum_b_pairs"))
    )
    j = sc.crossJoin(F.broadcast(sa)).crossJoin(F.broadcast(sb))
    expect = F.expr(
        "CAST(sum_a_pairs AS DOUBLE) * sum_b_pairs / (CAST(n AS DOUBLE) * (n - 1) / 2.0)"
    )
    num = F.col("sum_cells_pairs").cast("double") - expect
    den = (
        (F.col("sum_a_pairs") + F.col("sum_b_pairs")).cast("double") / 2.0 - expect
    )
    return j.select(
        "n",
        "sum_cells_pairs",
        "sum_a_pairs",
        "sum_b_pairs",
        F.when(den != 0, F.floor(num / den * F.lit(1_000_000) + F.lit(0.5)))
        .cast("long")
        .alias("ari_micro"),
    )


def ndcg_weights(k: int) -> list[int]:
    """Per-rank DCG discounts as integer micro-units:
    ``floor(1e6 / log2(rank+1) + 0.5)`` for rank 1..k. Computed ONCE in
    Python and inlined as literals on both engines — log2 is not
    correctly-rounded IEEE across engines, so it must never be evaluated
    engine-side (the Benford-gate rule)."""
    import math

    return [int(1_000_000 / math.log2(i + 1) + 0.5) for i in range(1, k + 1)]


def ndcg_at_k(
    ranked: DataFrame,
    rel_col: str = "rel",
    rank_col: str = "rank",
    k: int = 10,
) -> DataFrame:
    """NDCG@k of a ranking against graded relevance labels — all-integer:
    ``dcg_micro`` = sum(rel * w[rank]) with the literal micro discounts
    from :func:`ndcg_weights`, ``idcg_micro`` over the ideal reordering of
    the SAME retrieved set (rel desc, original rank as tiebreak — the
    local-ideal NDCG variant), and ``ndcg_micro`` = dcg*1e6 DIV idcg
    (non-negative, truncate == floor).

    The ideal re-rank is a global row_number over at most ``k`` rows —
    constant-size by construction, not a scale concern. Returns one row
    ``(k, n_ranked, dcg_micro, idcg_micro, ndcg_micro)``.
    """
    from pyspark.sql import Window

    warr = F.array([F.lit(x) for x in ndcg_weights(k)])
    d = ranked.where(F.col(rank_col) <= k).select(
        F.col(rank_col).cast("int").alias("__rk"),
        F.col(rel_col).cast("long").alias("__rel"),
    )
    iw = Window.orderBy(F.col("__rel").desc(), F.col("__rk").asc())
    d2 = d.withColumn("__irk", F.row_number().over(iw))
    agg = d2.agg(
        F.count(F.lit(1)).alias("n_ranked"),
        F.sum(F.col("__rel") * F.element_at(warr, F.col("__rk"))).alias("dcg_micro"),
        F.sum(F.col("__rel") * F.element_at(warr, F.col("__irk"))).alias("idcg_micro"),
    )
    return agg.select(
        F.lit(k).cast("long").alias("k"),
        F.col("n_ranked").cast("long").alias("n_ranked"),
        "dcg_micro",
        "idcg_micro",
        F.when(
            F.col("idcg_micro") > 0,
            F.expr("dcg_micro * 1000000 DIV idcg_micro"),
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("ndcg_micro"),
    )


def bleu_pairs(
    pairs: DataFrame,
    id_col: str = "pair_id",
    cand_col: str = "cand",
    ref_col: str = "ref",
    max_n: int = 4,
) -> DataFrame:
    """Sentence-level BLEU statistics (Papineni et al. 2002 — public
    methodology) for (candidate, reference) text pairs — the standard
    generation-eval metric a training pipeline runs over model outputs.

    Per pair and per order ``n = 1..max_n``: clipped n-gram matches
    ``m_n = Σ_g min(count_cand(g), count_ref(g))`` and candidate totals
    ``t_n`` — exact BIGINTs. The combined score is emitted in LOG space
    (no exp — keeps the output an exact integer):

    ``log_bleu_nano = bp_nano + (Σ_n [R9(LN(m_n+1)) − R9(LN(t_n+1))]) div max_n``

    with brevity penalty ``bp_nano = R9(1 − ref_len/cand_len)`` when the
    candidate is shorter (else 0; empty candidates score the defined 0 with
    all-zero counts). All orders are add-1 smoothed (the Lin & Och 2004
    smoothing-1 flavor) so zero-match orders stay finite; every LN is
    nano-rounded on an exact BIGINT before any arithmetic (hash-stability
    discipline). ``BLEU = exp(log_bleu_nano / 1e9)`` when a float is wanted.

    Scale shape: ONE explode producing (pair, n, gram) rows for both sides
    (the flattened per-order transform — no UDFs), two map-side-combined
    group-counts, one co-partitioned left join on (pair, n, gram), one
    final per-pair aggregate. Never an all-pairs join: the pairing is the
    caller's input.
    """
    if max_n < 1:
        raise ValueError("max_n must be >= 1")

    def _toks(col: str) -> str:
        return (
            f"CASE WHEN trim({col}) = '' THEN CAST(array() AS ARRAY<STRING>) "
            f"ELSE split(trim({col}), '\\\\s+') END"
        )

    def _grams(col: str) -> str:
        # flattened [(n, gram)] structs for n = 1..max_n
        return (
            f"flatten(transform(sequence(1, {max_n}), n -> "
            f"IF(size({_toks(col)}) < n, array(), "
            f"transform(sequence(1, size({_toks(col)}) - n + 1), "
            f"i -> struct(n AS n, array_join(slice({_toks(col)}, i, n), ' ') AS gram)))))"
        )

    def _side_counts(col: str, cname: str) -> DataFrame:
        return (
            pairs.select(F.col(id_col), F.explode(F.expr(_grams(col))).alias("g"))
            .select(id_col, F.col("g.n").alias("n"), F.col("g.gram").alias("gram"))
            .groupBy(id_col, "n", "gram")
            .agg(F.count(F.lit(1)).alias(cname))
        )

    cand = _side_counts(cand_col, "cc")
    ref = _side_counts(ref_col, "rc")
    per_n = (
        cand.join(ref, [id_col, "n", "gram"], "left")
        .groupBy(id_col, "n")
        .agg(
            F.sum(F.least(F.col("cc"), F.coalesce(F.col("rc"), F.lit(0)))).alias("m"),
            F.sum("cc").alias("t"),
        )
    )
    nano = 1000000000.0
    plog = F.round(F.log((F.col("m") + 1).cast("double")) * F.lit(nano)).cast(
        "bigint"
    ) - F.round(F.log((F.col("t") + 1).cast("double")) * F.lit(nano)).cast("bigint")
    stats = per_n.groupBy(id_col).agg(
        F.sum(F.when(F.col("n") == 1, F.col("t")).otherwise(0)).alias("cand_len"),
        *[
            F.sum(F.when(F.col("n") == i, F.col("m")).otherwise(0)).alias(f"m{i}")
            for i in range(1, max_n + 1)
        ],
        *[
            F.sum(F.when(F.col("n") == i, F.col("t")).otherwise(0)).alias(f"t{i}")
            for i in range(1, max_n + 1)
        ],
        F.coalesce(F.sum(plog), F.lit(0)).alias("__psum_partial"),
    )
    # orders with no candidate n-grams produced no per_n row; their smoothed
    # plog is LN(1)-LN(1) = 0, so the partial sum IS the full sum
    rlen = pairs.select(
        F.col(id_col), F.expr(f"size({_toks(ref_col)})").cast("long").alias("ref_len")
    )
    out = (
        pairs.select(F.col(id_col))
        .join(stats, id_col, "left")
        .join(rlen, id_col, "left")
    )
    cand_len = F.coalesce(F.col("cand_len"), F.lit(0))
    bp = F.when(
        (cand_len >= F.col("ref_len")) | (cand_len == 0), F.lit(0).cast("bigint")
    ).otherwise(
        F.round(
            (F.lit(1.0) - F.col("ref_len").cast("double") / cand_len.cast("double"))
            * F.lit(nano)
        ).cast("bigint")
    )
    cols = [F.col(id_col), cand_len.alias("cand_len"), F.col("ref_len")]
    for i in range(1, max_n + 1):
        cols.append(F.coalesce(F.col(f"m{i}"), F.lit(0)).alias(f"m{i}"))
        cols.append(F.coalesce(F.col(f"t{i}"), F.lit(0)).alias(f"t{i}"))
    cols.append(
        (bp + F.expr(f"coalesce(__psum_partial, 0L) div {max_n}")).alias("log_bleu_nano")
    )
    return out.select(*cols)


def rouge_l_pairs(
    pairs: DataFrame,
    id_col: str = "pair_id",
    cand_col: str = "cand",
    ref_col: str = "ref",
) -> DataFrame:
    """ROUGE-L (Lin 2004 — public methodology): longest-common-subsequence
    recall/precision between candidate and reference token streams — the
    summarization-eval companion to :func:`bleu_pairs`.

    The m×n LCS DP runs as ONE codegen'd nested array fold per pair (the
    third instance of the sequential-DP-in-aggregate pattern after DTW and
    LZ78): outer fold over candidate tokens, state = the previous DP row
    (``array<bigint>`` of length m+1), inner fold builds the new row left
    to right. Tokens are compared via their engine-neutral poly31 codes,
    NOT raw strings — a (vanishingly rare) hash collision merges two
    tokens identically on every engine, keeping the output bit-stable
    cross-engine (the DuckDB oracle replays the same codes; exact parity
    beats cosmetic exactness that diverges).

    Returns ``(id_col, cand_len, ref_len, lcs, rouge_l_f_micro)`` with
    ``rouge_l_f_micro = 2·lcs·10^6 div (cand_len + ref_len)`` (the LCS F1
    identity; 0 when both sides are empty) — all exact BIGINTs.

    Scale: zero shuffles (per-row expression work only); cost is
    O(|cand|·|ref|) per pair, the exact-DP baseline — truncate upstream if
    pairing books instead of messages.
    """
    poly = (
        "aggregate(transform(split({t}, ''), ch -> CAST(ascii(ch) AS BIGINT)), "
        "0L, (a, c) -> pmod(a * 31 + c, 2147483648L))"
    )

    def _codes(col: str) -> str:
        toks = (
            f"CASE WHEN trim({col}) = '' THEN CAST(array() AS ARRAY<STRING>) "
            f"ELSE split(trim({col}), '\\\\s+') END"
        )
        return f"transform({toks}, t -> {poly.format(t='t')})"

    lcs = (
        "IF(size(__cc) = 0 OR size(__rc) = 0, 0L, "
        "element_at(aggregate(__cc, array_repeat(0L, size(__rc) + 1), "
        "(acc, e) -> aggregate(sequence(1, size(__rc)), array(0L), "
        "(racc, j) -> concat(racc, array(IF(e = element_at(__rc, CAST(j AS INT)), "
        "element_at(acc, CAST(j AS INT)) + 1L, "
        "greatest(element_at(acc, CAST(j AS INT) + 1), "
        "element_at(racc, size(racc)))))))), size(__rc) + 1))"
    )
    base = pairs.select(
        F.col(id_col),
        F.expr(_codes(cand_col)).alias("__cc"),
        F.expr(_codes(ref_col)).alias("__rc"),
    ).select(
        F.col(id_col),
        F.size("__cc").cast("long").alias("cand_len"),
        F.size("__rc").cast("long").alias("ref_len"),
        F.expr(lcs).alias("lcs"),
    )
    return base.select(
        id_col,
        "cand_len",
        "ref_len",
        "lcs",
        F.expr(
            "IF(cand_len + ref_len = 0, 0L, "
            "(2 * lcs * 1000000) div (cand_len + ref_len))"
        ).alias("rouge_l_f_micro"),
    )


def bradley_terry(
    outcomes: DataFrame,
    winner_col: str = "winner",
    loser_col: str = "loser",
    iters: int = 8,
) -> DataFrame:
    """Bradley-Terry preference strengths (Bradley & Terry 1952; the MM
    fixed point of Hunter 2004 — public methodology): the model behind
    pairwise-preference ranking (RLHF reward-model data, "which tool/policy
    wins head-to-head" leaderboards).

    MM update, run ``iters`` supersteps: ``s_i ← W_i / Σ_j n_ij/(s_i+s_j)``
    then rescale so ``Σ s = n_items · 10^9``. Determinism discipline:
    strengths live as NANO-scaled BIGINTs; each pair term is
    ``round(n_ij · 10^12 / (s_i + s_j))`` (one double division of two exact
    integers — bit-identical on any engine), the denominator sum is an
    exact BIGINT (never a float reduction), and the rescale is one
    multiply + one divide on exact integers. Wins are +1 smoothed and
    strengths floored at 1, so items that never win stay finite.

    Scale shape: one shuffle to the per-pair count table; per superstep the
    strength table joins the (item-keyed) pair table twice and aggregates —
    the same join-propagate-aggregate shape as a PageRank superstep, with
    per-superstep ``localCheckpoint`` lineage truncation. No collect of
    anything larger than one scalar.

    Returns ``(item, wins, games, strength_nano)``.
    """
    if iters < 0:
        raise ValueError("iters must be >= 0")
    # self-games carry no preference information (and would double-count
    # through the symmetric pair closure) — dropped up front
    outcomes = outcomes.filter(F.col(winner_col) != F.col(loser_col))
    w = F.col(winner_col).alias("a")
    l = F.col(loser_col).alias("b")
    # unordered pair totals + per-item win counts (one pass each)
    ordered = outcomes.select(
        F.least(w, l).alias("i"), F.greatest(w, l).alias("j")
    )
    pairs = (
        ordered.groupBy("i", "j").agg(F.count(F.lit(1)).alias("n")).localCheckpoint()
    )
    wins = (
        outcomes.select(F.col(winner_col).alias("item"))
        .groupBy("item")
        .agg((F.count(F.lit(1)) + 1).alias("wins_s"))
    )
    items = (
        outcomes.select(F.col(winner_col).alias("item"))
        .unionByName(outcomes.select(F.col(loser_col).alias("item")))
        .dropDuplicates()
    )
    n_items = items.count()
    state = (
        items.join(wins, "item", "left")
        .select(
            "item",
            F.coalesce(F.col("wins_s"), F.lit(1)).alias("w"),
            F.lit(1000000000).cast("bigint").alias("s"),
        )
        .localCheckpoint()
    )
    sym = pairs.select("i", "j", "n").unionByName(
        pairs.select(F.col("j").alias("i"), F.col("i").alias("j"), "n")
    ).localCheckpoint()
    for _ in range(iters):
        si = state.select(F.col("item").alias("i"), F.col("s").alias("s_i"))
        sj = state.select(F.col("item").alias("j"), F.col("s").alias("s_j"))
        denom = (
            sym.join(si, "i")
            .join(sj, "j")
            .select(
                F.col("i").alias("item"),
                F.round(
                    F.col("n").cast("double")
                    * F.lit(1e12)
                    / (F.col("s_i") + F.col("s_j")).cast("double")
                )
                .cast("bigint")
                .alias("term_pico"),
            )
            .groupBy("item")
            .agg(F.sum("term_pico").alias("denom_pico"))
        )
        raw = state.join(denom, "item", "left").select(
            "item",
            "w",
            F.greatest(
                F.when(
                    F.col("denom_pico").isNull(), F.col("s")
                ).otherwise(
                    F.round(
                        F.col("w").cast("double")
                        * F.lit(1e12)
                        / F.col("denom_pico").cast("double")
                        * F.lit(1e9)
                    ).cast("bigint")
                ),
                F.lit(1).cast("bigint"),
            ).alias("s"),
        )
        total = raw.agg(F.sum("s")).collect()[0][0]
        state = raw.select(
            "item",
            "w",
            F.greatest(
                F.round(
                    F.col("s").cast("double")
                    * F.lit(float(n_items) * 1e9)
                    / F.lit(float(total))
                ).cast("bigint"),
                F.lit(1).cast("bigint"),
            ).alias("s"),
        ).localCheckpoint()
    games = sym.groupBy(F.col("i").alias("item")).agg(F.sum("n").alias("games"))
    return (
        state.join(games, "item", "left")
        .select(
            "item",
            (F.col("w") - 1).alias("wins"),
            F.coalesce(F.col("games"), F.lit(0)).alias("games"),
            F.col("s").alias("strength_nano"),
        )
    )


def ece_exact(
    scored: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Exact-integer Expected Calibration Error (Naeini et al. 2015 —
    public methodology) over a MICRO-scaled probability score
    (``score_col`` in ``[0, 10^6]``, e.g. a classifier confidence):
    fixed-width bins ``bin = score·n_bins div (10^6 + 1)``, per-bin
    calibration gap as the exact BIGINT ``|pos·10^6 − Σ score|`` (the
    common |accuracy − confidence| numerator cleared of divisions), and
    ``ece_micro = Σ gaps div N`` — every value an exact integer, no float
    reduction anywhere (the quantile-binned float sibling is
    :func:`reliability_curve`).

    Returns per-bin rows ``(bin, n, pos, sum_score, gap)`` plus the
    constant ``ece_micro`` column. One map-side-combined shuffle on the
    bin id; the total rides in via a broadcast single-row cross join.
    """
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    binned = scored.select(
        F.expr(f"CAST({score_col} AS BIGINT) * {int(n_bins)} div 1000001").alias("bin"),
        F.col(score_col).cast("long").alias("__s"),
        F.col(label_col).cast("long").alias("__y"),
    )
    per = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__y").alias("pos"),
        F.sum("__s").alias("sum_score"),
    )
    per = per.select(
        "bin", "n", "pos", "sum_score",
        F.abs(F.col("pos") * F.lit(1000000) - F.col("sum_score")).alias("gap"),
    )
    tot = per.agg(
        F.sum("n").alias("__total_n"), F.sum("gap").alias("__total_gap")
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "bin", "n", "pos", "sum_score", "gap",
        F.expr("__total_gap div __total_n").alias("ece_micro"),
    )


def chrf_pairs(
    pairs: DataFrame,
    id_col: str = "pair_id",
    cand_col: str = "cand",
    ref_col: str = "ref",
    max_n: int = 6,
    beta: int = 2,
) -> DataFrame:
    """chrF (Popović 2015 — public methodology): character n-gram F-score,
    the tokenization-free third member of the eval trio (BLEU / ROUGE-L /
    chrF). Whitespace is stripped (the standard preprocessing), n-grams
    run n = 1..``max_n`` over the remaining character stream.

    Per order: clipped matches ``m_n`` against candidate totals ``ct_n``
    and reference totals ``rt_n`` — exact BIGINTs. Precision/recall per
    order are micro-scaled integer divisions; their means run over the
    orders where the respective side HAS n-grams (the effective-order
    rule); the F-β combine stays integral:

    ``chrf_micro = (1+β²)·P·R div (β²·P + R)``  (0 when either mean is 0).

    Returns ``(id_col, cand_chars, ref_chars, p_avg_micro, r_avg_micro,
    chrf_micro)``. Scale shape identical to :func:`bleu_pairs`: one
    flattened explode per side, two map-side-combined counts, one
    co-partitioned join, one per-pair aggregate — no Python.
    """
    if max_n < 1 or beta < 1:
        raise ValueError("max_n and beta must be >= 1")

    def _chars(col: str) -> str:
        return f"regexp_replace(coalesce({col}, ''), '\\\\s+', '')"

    def _grams(col: str) -> str:
        s = _chars(col)
        return (
            f"flatten(transform(sequence(1, {max_n}), n -> "
            f"IF(length({s}) < n, array(), "
            f"transform(sequence(1, length({s}) - n + 1), "
            f"i -> struct(n AS n, substring({s}, i, n) AS gram)))))"
        )

    def _side(col: str, cname: str) -> DataFrame:
        return (
            pairs.select(F.col(id_col), F.explode(F.expr(_grams(col))).alias("g"))
            .select(id_col, F.col("g.n").alias("n"), F.col("g.gram").alias("gram"))
            .groupBy(id_col, "n", "gram")
            .agg(F.count(F.lit(1)).alias(cname))
        )

    cand = _side(cand_col, "cc")
    ref = _side(ref_col, "rc")
    per_n = (
        cand.join(ref, [id_col, "n", "gram"], "full")
        .groupBy(id_col, "n")
        .agg(
            F.sum(
                F.least(
                    F.coalesce(F.col("cc"), F.lit(0)), F.coalesce(F.col("rc"), F.lit(0))
                )
            ).alias("m"),
            F.sum(F.coalesce(F.col("cc"), F.lit(0))).alias("ct"),
            F.sum(F.coalesce(F.col("rc"), F.lit(0))).alias("rt"),
        )
    )
    stats = per_n.groupBy(id_col).agg(
        F.sum(F.when(F.col("ct") > 0, F.expr("m * 1000000 div ct")).otherwise(0)).alias(
            "__psum"
        ),
        F.sum(F.when(F.col("ct") > 0, 1).otherwise(0)).alias("__po"),
        F.sum(F.when(F.col("rt") > 0, F.expr("m * 1000000 div rt")).otherwise(0)).alias(
            "__rsum"
        ),
        F.sum(F.when(F.col("rt") > 0, 1).otherwise(0)).alias("__ro"),
    )
    lens = pairs.select(
        F.col(id_col),
        F.length(F.expr(_chars(cand_col))).cast("long").alias("cand_chars"),
        F.length(F.expr(_chars(ref_col))).cast("long").alias("ref_chars"),
    )
    b2 = beta * beta
    return (
        lens.join(stats, id_col, "left")
        .select(
            id_col,
            "cand_chars",
            "ref_chars",
            F.expr("IF(coalesce(__po, 0L) = 0, 0L, __psum div __po)").alias(
                "p_avg_micro"
            ),
            F.expr("IF(coalesce(__ro, 0L) = 0, 0L, __rsum div __ro)").alias(
                "r_avg_micro"
            ),
        )
        .select(
            id_col,
            "cand_chars",
            "ref_chars",
            "p_avg_micro",
            "r_avg_micro",
            F.expr(
                f"IF(p_avg_micro = 0 OR r_avg_micro = 0, 0L, "
                f"({1 + b2} * p_avg_micro * r_avg_micro) div "
                f"({b2} * p_avg_micro + r_avg_micro))"
            ).alias("chrf_micro"),
        )
    )


def map_mrr_at_k(
    ranked: DataFrame,
    rel_col: str = "rel",
    rank_col: str = "rank",
    k: int = 10,
) -> DataFrame:
    """MAP@k and MRR@k of a ranking against binary relevance (rel > 0) —
    the other two standard retrieval metrics next to :func:`ndcg_at_k`
    (public methodology; TREC evaluation measures). All-integer:

    * ``first_rel_rank`` — smallest rank with a relevant doc (0 if none)
    * ``mrr_micro`` = 1e6 DIV first_rel_rank (exact truncated rational)
    * per relevant rank i: precision term ``(cumrel_i * 1e9) DIV i``
      (cumrel over the retrieved order, exact BIGINTs)
    * ``ap_nano`` = sum(terms) DIV n_rel_in_k — average precision with
      every division an exact non-negative integer truncation, so the
      output is representation-stable by construction (no doubles at all).

    The cum-relevance prefix is a fold inside the collected rank array —
    the ranked input is top-k (constant-size by construction, the
    ndcg_at_k contract), never a scale concern. Returns one row
    ``(k, n_ranked, n_rel, first_rel_rank, mrr_micro, ap_nano)``.
    """
    d = ranked.where(F.col(rank_col) <= k).select(
        F.col(rank_col).cast("long").alias("__rk"),
        (F.col(rel_col).cast("long") > 0).cast("long").alias("__rel"),
    )
    one = d.agg(
        F.count(F.lit(1)).alias("n_ranked"),
        F.sum("__rel").alias("n_rel"),
        F.min(F.when(F.col("__rel") == 1, F.col("__rk"))).alias("__fr"),
        F.sort_array(F.collect_list(F.struct("__rk", "__rel"))).alias("arr"),
    )
    # sum over relevant positions of (cumrel_i * 1e9) DIV rank_i — the
    # prefix count is an exact integer fold over the ordered array
    terms = F.expr(
        "aggregate(arr, named_struct('c', CAST(0 AS BIGINT), 's', CAST(0 AS BIGINT)),"
        " (a, x) -> named_struct("
        "   'c', a.c + x.__rel,"
        "   's', a.s + CASE WHEN x.__rel = 1"
        "        THEN (a.c + x.__rel) * 1000000000 DIV x.__rk ELSE 0 END),"
        " a -> a.s)"
    )
    return one.withColumn("__s", terms).select(
        F.lit(k).cast("long").alias("k"),
        F.col("n_ranked").cast("long").alias("n_ranked"),
        F.col("n_rel").cast("long").alias("n_rel"),
        F.coalesce(F.col("__fr"), F.lit(0)).cast("long").alias("first_rel_rank"),
        F.when(F.col("__fr").isNotNull(), F.expr("1000000 DIV __fr"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("mrr_micro"),
        F.when(F.col("n_rel") > 0, F.expr("__s DIV n_rel"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("ap_nano"),
    )


def rbo_weights(k: int, p: float = 0.9) -> list[int]:
    """Suffix-summed RBO weights as integer nano-units:
    ``W[m] = sum_{d=m..k} (1-p) * p^(d-1) / d`` for m = 1..k, each term
    computed ONCE in Python and inlined as literals on both engines
    (engine-side POW is not correctly-rounded IEEE — the ndcg_weights /
    Benford rule)."""
    terms = [(1.0 - p) * p ** (d - 1) / d for d in range(1, k + 1)]
    return [int(round(sum(terms[m - 1:]) * 1e9)) for m in range(1, k + 1)]


def rbo_at_k(
    rank_a: DataFrame,
    rank_b: DataFrame,
    k: int = 10,
    p: float = 0.9,
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Truncated Rank-Biased Overlap (Webber, Moffat & Zobel 2010, TOIS —
    public methodology) between two top-``k`` rankings: ``RBO@k = (1-p) *
    sum_{d=1..k} p^(d-1) * |A_d ∩ B_d| / d`` — the standard top-weighted
    ranking-similarity metric (search-quality regression tests, ranker
    A/B diffs), robust to non-conjoint lists where Kendall's tau is not.

    Exactness trick: swapping the summation order gives ``RBO@k = sum
    over docs in BOTH prefixes of W[max(r_A, r_B)]`` with ``W`` the
    suffix-summed weight array from :func:`rbo_weights` — so the whole
    metric is ONE inner join + one literal-array lookup + one exact
    BIGINT sum of nano weights. No per-depth pass, no floats engine-side.

    Returns ONE row: ``(k, n_a, n_b, n_common, rbo_nano)`` — rbo_nano in
    [0, 1e9]; 1e9 iff the prefixes are identical as sets at every depth.
    """
    warr = F.array([F.lit(x) for x in rbo_weights(k, p)])
    a = rank_a.filter(F.col(rank_col) <= k).select(
        F.col(id_col).alias("__id"), F.col(rank_col).cast("int").alias("__ra")
    )
    b = rank_b.filter(F.col(rank_col) <= k).select(
        F.col(id_col).alias("__id"), F.col(rank_col).cast("int").alias("__rb")
    )
    j = a.join(b, "__id").select(
        F.element_at(warr, F.greatest(F.col("__ra"), F.col("__rb"))).alias("__w")
    )
    na = a.count()
    nb = b.count()
    return j.agg(
        F.coalesce(F.sum("__w"), F.lit(0)).alias("rbo_nano"),
        F.count(F.lit(1)).alias("n_common"),
    ).select(
        F.lit(k).cast("long").alias("k"),
        F.lit(na).cast("long").alias("n_a"),
        F.lit(nb).cast("long").alias("n_b"),
        F.col("n_common").cast("long").alias("n_common"),
        F.col("rbo_nano").cast("long").alias("rbo_nano"),
    )
