"""Histogram-based decision-stump split finding — the gradient-boosting
histogram pattern as one Catalyst aggregation.

The split-finding kernel of every histogram GBDT (Chen & Guestrin 2016,
"XGBoost"; Ke et al. 2017, "LightGBM" — public methodology): bin each
feature to a small integer grid, build per-(feature, bin) class histograms,
and score every bin boundary as a candidate split by the impurity decrease.
This is THE relational formulation of tree training:

* **Histogram build is the only scale-bearing stage** — one corpus scan,
  per-feature bin expressions in a single codegen'd projection, one explode
  to ``(feature, bin, label)``, one map-side-combined count aggregation.
  Output is ``n_features x n_bins`` rows regardless of corpus size (the
  reduction every GBDT library performs on its workers before the
  driver-side split scan).
* **Split scoring runs on that tiny table** — the per-feature cumulative
  window partitions into ``n_features`` groups of ``n_bins`` rows, so the
  WindowExec here is histogram-sized, never corpus-sized (contrast the
  banned global-order windows: this one's input is already a reduction).

Split semantics: candidate ``(feature, thr)`` sends ``bin <= thr`` left;
every boundary except the last bin of each feature is scored (both children
non-empty by construction since histogram rows have count >= 1).

Hash-stable scoring: all counts are exact BIGINTs. The Gini purity of a
child with ``p`` positives out of ``t`` is scored as
``(p^2 + (t-p)^2) / t`` (monotone in the impurity decrease for fixed
parent), each term computed in double with one correctly-rounded division
and micro-rounded to an integer BEFORE the left+right sum (the
operators/hyptest.py discipline) — reduction-order independent and
representation-stable across engines. Squares are exact in double for
counts below 2^26; above that the sequence is still deterministic (same
IEEE ops both engines), just correctly rounded rather than exact.

Reference parity: none (the reference is a single-query link-graph
accelerator); LLM-training-pipeline mandate breadth — quality-classifier /
router training over corpus-derived features.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["stump_candidates", "best_stump"]

_SCALE = 1_000_000


def _purity_micro(p, t):
    """round(1e6 * (p^2 + (t-p)^2) / t) as BIGINT — exact counts in, one
    correctly-rounded division, one rounding. Larger = purer children."""
    pd = p.cast("double")
    nd = (t - p).cast("double")
    return F.round((pd * pd + nd * nd) / t.cast("double") * _SCALE).cast("long")


def stump_candidates(
    df: DataFrame,
    label_expr: str,
    features: dict[str, str],
) -> DataFrame:
    """Score every (feature, bin-boundary) split of ``df``.

    ``label_expr`` is a boolean SQL expression (the positive class);
    ``features`` maps feature name -> integer-valued SQL bin expression
    (caller owns the binning so the grid is explicit and engine-portable).
    Rows where a feature expression is NULL are excluded from that
    feature's histogram only (per-feature totals keep each feature's
    parent purity honest).

    Returns one row per candidate: ``(feature, thr, t_left, p_left,
    t_right, p_right, purity_micro, gain_micro)`` where ``purity_micro``
    is the micro-rounded left+right children purity and ``gain_micro``
    subtracts the feature's parent purity (>= 0 up to rounding).
    """
    if not features:
        raise ValueError("stump_candidates: need at least one feature")
    pairs = ", ".join(
        f"named_struct('f', '{name}', 'b', CAST(({expr}) AS BIGINT))"
        for name, expr in sorted(features.items())
    )
    hist = (
        df.select(
            F.expr(f"array({pairs})").alias("fb"),
            F.expr(label_expr).cast("boolean").alias("y"),
        )
        .select(F.explode("fb").alias("fb"), "y")
        .select(F.col("fb.f").alias("feature"), F.col("fb.b").alias("bin"), "y")
        .filter(F.col("bin").isNotNull())
        .groupBy("feature", "bin")
        .agg(
            F.count(F.lit(1)).alias("t"),
            F.sum(F.col("y").cast("long")).alias("p"),
        )
    )
    # everything below runs on the n_features x n_bins reduction
    w = Window.partitionBy("feature").orderBy("bin")
    wall = Window.partitionBy("feature")
    cum = hist.select(
        "feature",
        F.col("bin").alias("thr"),
        F.sum("t").over(w).alias("t_left"),
        F.sum("p").over(w).alias("p_left"),
        F.sum("t").over(wall).alias("t_all"),
        F.sum("p").over(wall).alias("p_all"),
        F.max("bin").over(wall).alias("max_bin"),
    ).filter(F.col("thr") < F.col("max_bin"))
    t_r = F.col("t_all") - F.col("t_left")
    p_r = F.col("p_all") - F.col("p_left")
    purity = _purity_micro(F.col("p_left"), F.col("t_left")) + _purity_micro(
        p_r, t_r
    )
    parent = _purity_micro(F.col("p_all"), F.col("t_all"))
    return cum.select(
        "feature",
        "thr",
        "t_left",
        "p_left",
        t_r.alias("t_right"),
        p_r.alias("p_right"),
        purity.alias("purity_micro"),
        (purity - parent).alias("gain_micro"),
    )


def best_stump(
    df: DataFrame, label_expr: str, features: dict[str, str]
) -> DataFrame:
    """The argmax candidate — highest ``gain_micro``, ties broken by
    lexicographically smallest feature then smallest threshold (the
    one-row orderBy runs on the histogram-sized candidate table)."""
    cand = stump_candidates(df, label_expr, features)
    return cand.orderBy(
        F.col("gain_micro").desc(), F.col("feature").asc(), F.col("thr").asc()
    ).limit(1)


def adaboost_stumps(
    df: DataFrame,
    label_expr: str,
    feature_expr: str,
    id_col: str = "event_id",
    rounds: int = 3,
) -> DataFrame:
    """AdaBoost over threshold stumps (Freund & Schapire 1997 — public
    methodology): the boosting family. Each round fits the weighted-error-
    minimal stump ``h(x) = [x <= thr]`` (either polarity) on integer
    micro-weights, reweights multiplicatively, and records the stump with
    its ``alpha``.

    Determinism discipline: weights are micro-scaled BIGINTs (init 10^6,
    floored at 1); the per-round error/total are exact BIGINT sums; the
    two reweight factors are each ONE sqrt of ONE double division of the
    exact integers (``sqrt((tot−err)/err)`` and ``sqrt(err/(tot−err))`` —
    computed as separate expressions, never as reciprocals, so both
    engines evaluate identical operand trees); per-row reweights are
    rounded back to micro BIGINTs before the next round's sums. Error is
    clamped to ``[1, tot−1]`` so a perfect stump stays finite.

    Scale shape per round: one map-side-combined weighted histogram over
    the (caller-binned) feature, cumulative sums on the bin-count-sized
    table, a one-row collect of the argmin stump, one codegen'd reweight
    projection with ``localCheckpoint`` (superstep discipline).

    Returns one row per round: ``(round, thr, polarity, err_w, tot_w,
    alpha_micro, ensemble_correct, ensemble_total)`` — the last two are
    the FINAL weighted-vote training accuracy, constant across rows.
    """
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    base = df.select(
        F.col(id_col).alias("__id"),
        F.expr(feature_expr).cast("long").alias("x"),
        F.expr(label_expr).cast("boolean").cast("long").alias("y"),
    ).filter(F.col("x").isNotNull())
    state = base.withColumn("w", F.lit(1000000).cast("bigint")).localCheckpoint()

    stumps = []
    for r in range(rounds):
        hist = state.groupBy("x").agg(
            F.sum("w").alias("tw"),
            F.sum(F.col("w") * F.col("y")).alias("pw"),
        )
        # two distributed prefix sums over the bin-sized histogram — the
        # repo's no-global-window discipline (same as auc_exact), even
        # though the table is tiny
        from .cumsum import distributed_cumsum

        cum = distributed_cumsum(
            distributed_cumsum(hist, ["x"], "tw", out_col="cum_t"),
            ["x"],
            "pw",
            out_col="cum_p",
        ).select(F.col("x").alias("thr"), "cum_t", "cum_p")
        tots = hist.agg(
            F.sum("tw").alias("tot"), F.sum("pw").alias("tot_p")
        ).collect()[0]
        tot, tot_p = int(tots["tot"]), int(tots["tot_p"])
        # polarity +1: predict y=1 iff x <= thr  ->  err = neg_left + pos_right
        cand = cum.select(
            "thr",
            ((F.col("cum_t") - F.col("cum_p")) + (F.lit(tot_p) - F.col("cum_p"))).alias(
                "err_pos"
            ),
        ).select(
            "thr",
            F.col("err_pos"),
            (F.lit(tot) - F.col("err_pos")).alias("err_neg"),
        )
        best = (
            cand.select(
                "thr",
                F.explode(
                    F.array(
                        F.struct(F.col("err_pos").alias("e"), F.lit(1).alias("pol")),
                        F.struct(F.col("err_neg").alias("e"), F.lit(-1).alias("pol")),
                    )
                ).alias("c"),
            )
            .select("thr", F.col("c.e").alias("e"), F.col("c.pol").alias("pol"))
            .orderBy(F.col("e").asc(), F.col("thr").asc(), F.col("pol").desc())
            .limit(1)
            .collect()[0]
        )
        thr, pol = int(best["thr"]), int(best["pol"])
        err = min(max(int(best["e"]), 1), tot - 1)
        fac_wrong = math.sqrt((tot - err) / err)
        fac_right = math.sqrt(err / (tot - err))
        alpha_micro = math.floor(math.log((tot - err) / err) * 500000 + 0.5)
        stumps.append((r, thr, pol, int(best["e"]), tot, alpha_micro))
        pred = (
            F.when(F.col("x") <= F.lit(thr), F.lit(1)).otherwise(F.lit(0))
            if pol == 1
            else F.when(F.col("x") <= F.lit(thr), F.lit(0)).otherwise(F.lit(1))
        )
        correct = pred == F.col("y")
        state = state.select(
            "__id",
            "x",
            "y",
            F.greatest(
                F.round(
                    F.col("w").cast("double")
                    * F.when(correct, F.lit(fac_right)).otherwise(F.lit(fac_wrong))
                ).cast("bigint"),
                F.lit(1).cast("bigint"),
            ).alias("w"),
        ).localCheckpoint()

    # final weighted-vote accuracy: sign of sum(alpha * (2h-1))
    vote = F.lit(0).cast("bigint")
    for r, thr, pol, _e, _t, am in stumps:
        h = (
            F.when(F.col("x") <= F.lit(thr), F.lit(1)).otherwise(F.lit(-1))
            if pol == 1
            else F.when(F.col("x") <= F.lit(thr), F.lit(-1)).otherwise(F.lit(1))
        )
        vote = vote + F.lit(am) * h
    acc = base.select(
        F.when((vote > 0) == (F.col("y") == 1), 1).otherwise(0).alias("ok")
    ).agg(F.sum("ok").alias("c"), F.count(F.lit(1)).alias("n")).collect()[0]
    spark = df.sparkSession
    return spark.createDataFrame(
        [
            (r, thr, pol, e, t, am, int(acc["c"]), int(acc["n"]))
            for r, thr, pol, e, t, am in stumps
        ],
        "round long, thr long, polarity long, err_w long, tot_w long, "
        "alpha_micro long, ensemble_correct long, ensemble_total long",
    )


def gbm_stumps(
    df: DataFrame,
    target_expr: str,
    feature_expr: str,
    id_col: str = "event_id",
    rounds: int = 3,
) -> DataFrame:
    """Gradient-boosted regression stumps, squared loss (Friedman 2001 —
    public methodology): the regression sibling of
    :func:`adaboost_stumps`. ``F_0`` = truncated mean; each round fits the
    variance-gain-maximal threshold split of the current residuals, steps
    with shrinkage 1/2, and the residuals carry to the next round.

    Determinism discipline: targets live as MILLI-scaled BIGINTs (the
    milli grid keeps the final Σr² under 2^63 with headroom); per-round
    split statistics (n, Σr per bin + prefix sums via
    :func:`..cumsum.distributed_cumsum` — no global window) are exact; the
    split criterion ``S_l²/n_l + S_r²/n_r`` is evaluated as two double
    divisions of exact integers (identical operand trees cross-engine) and
    the argmax is ordered (gain DESC, thr ASC); leaf values and the
    shrinkage step are truncated integer divisions. Every residual stays
    an exact BIGINT between rounds.

    Returns one row per round: ``(round, thr, n_left, v_left_milli,
    v_right_milli, f0_milli, sse_after)`` — ``f0_milli`` and the
    final-model training SSE (milli², exact) are constant across rows.
    """
    from .cumsum import distributed_cumsum

    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    base = df.select(
        F.col(id_col).alias("__id"),
        F.expr(feature_expr).cast("long").alias("x"),
        F.expr(target_expr).cast("long").alias("y"),
    ).filter(F.col("x").isNotNull() & F.col("y").isNotNull())
    t0 = base.agg(F.sum("y").alias("s"), F.count(F.lit(1)).alias("n")).collect()[0]
    f0 = _trunc_div(int(t0["s"]), int(t0["n"]))
    state = base.select(
        "__id", "x", (F.col("y") - F.lit(f0)).alias("r")
    ).localCheckpoint()

    out_rows = []
    for k in range(rounds):
        hist = state.groupBy("x").agg(
            F.count(F.lit(1)).alias("n"), F.sum("r").alias("s")
        )
        cum = distributed_cumsum(
            distributed_cumsum(hist, ["x"], "n", out_col="n_l"),
            ["x"],
            "s",
            out_col="s_l",
        )
        tot = hist.agg(F.sum("n").alias("n"), F.sum("s").alias("s")).collect()[0]
        tn, ts = int(tot["n"]), int(tot["s"])
        best = (
            cum.select(
                F.col("x").alias("thr"),
                "n_l",
                "s_l",
                (F.lit(tn) - F.col("n_l")).alias("n_r"),
                (F.lit(ts) - F.col("s_l")).alias("s_r"),
            )
            .filter(F.col("n_r") > 0)
            .select(
                "thr",
                "n_l",
                "s_l",
                "n_r",
                "s_r",
                (
                    (F.col("s_l") * F.col("s_l")).cast("double") / F.col("n_l").cast("double")
                    + (F.col("s_r") * F.col("s_r")).cast("double") / F.col("n_r").cast("double")
                ).alias("gain"),
            )
            .orderBy(F.col("gain").desc(), F.col("thr").asc())
            .limit(1)
            .collect()[0]
        )
        thr = int(best["thr"])
        v_l = _trunc_div(_trunc_div(int(best["s_l"]), int(best["n_l"])), 2)
        v_r = _trunc_div(_trunc_div(int(best["s_r"]), int(best["n_r"])), 2)
        out_rows.append((k, thr, int(best["n_l"]), v_l, v_r))
        state = state.select(
            "__id",
            "x",
            (
                F.col("r")
                - F.when(F.col("x") <= F.lit(thr), F.lit(v_l)).otherwise(F.lit(v_r))
            ).alias("r"),
        ).localCheckpoint()

    sse = int(
        state.agg(F.sum(F.col("r") * F.col("r")).alias("q")).collect()[0]["q"]
    )
    spark = df.sparkSession
    return spark.createDataFrame(
        [(k, thr, nl, vl, vr, f0, sse) for k, thr, nl, vl, vr in out_rows],
        "round long, thr long, n_left long, v_left_milli long, "
        "v_right_milli long, f0_milli long, sse_after long",
    )


def _trunc_div(a: int, b: int) -> int:
    """Truncation-toward-zero integer division — the semantics Spark's
    ``div`` and DuckDB's ``//`` share (Python ``//`` floors)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q
