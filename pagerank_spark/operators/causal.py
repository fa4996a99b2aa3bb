"""Observational causal estimators: coarsened exact matching.

CEM (Iacus, King & Porro 2012 — public methodology): coarsen covariates
into discrete strata, keep only strata containing BOTH treated and control
units, and compare outcome means within strata — the simplest
credible-at-scale treatment-effect estimator, and a pure groupBy in Spark
(one shuffle on the stratum key, no per-unit matching joins, no ordering
dependence — the reason CEM distributes where nearest-neighbor propensity
matching does not).

Exactness discipline: outcomes are exact integer units (cents); per-stratum
sums/counts are BIGINT; the within-stratum mean gap is emitted as
``diff_micro`` = (sum_t*1e6 DIV n_t) - (sum_c*1e6 DIV n_c) — each DIV acts
on non-negative integers (truncate == floor), so the subtraction of the two
exact terms is engine-stable even when negative.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def cem_strata(
    units: DataFrame,
    treated: Column,
    outcome: Column,
    strata: dict[str, Column],
) -> DataFrame:
    """Per-stratum matched treatment/control table.

    ``units``: one row per unit. ``treated``: boolean column. ``outcome``:
    a NON-NEGATIVE exact-integer column (pre-scale currency to cents).
    ``strata``: name -> coarsened covariate expression (discrete values).

    Returns one row per matched stratum (>=1 treated AND >=1 control):
    the stratum keys, ``n_treated``/``n_control``, exact outcome sums, and
    ``diff_micro`` — the treated-minus-control mean gap in micro-units.
    The weighted ATT is then ``sum(n_treated * diff_micro) /
    sum(n_treated)`` over this table (see :func:`cem_att`).
    """
    t = treated.cast("int")
    keyed = units.select(
        *[c.alias(n) for n, c in strata.items()],
        t.alias("__t"),
        outcome.cast("long").alias("__y"),
    )
    g = keyed.groupBy(*strata.keys()).agg(
        F.sum("__t").alias("n_treated"),
        F.sum(1 - F.col("__t")).alias("n_control"),
        F.sum(F.col("__t") * F.col("__y")).alias("sum_treated"),
        F.sum((1 - F.col("__t")) * F.col("__y")).alias("sum_control"),
    )
    matched = g.where((F.col("n_treated") > 0) & (F.col("n_control") > 0))
    return matched.withColumn(
        "diff_micro",
        F.expr("sum_treated * 1000000 DIV n_treated - sum_control * 1000000 DIV n_control"),
    )


def cem_att(strata_table: DataFrame) -> DataFrame:
    """One-row weighted ATT over a :func:`cem_strata` table: the
    treated-weighted mean of the stratum gaps, plus the matched counts.
    One exact integer sum per term, a single correctly-rounded division."""
    return strata_table.agg(
        F.sum("n_treated").alias("n_treated_matched"),
        F.sum("n_control").alias("n_control_matched"),
        F.round(
            F.sum(F.col("n_treated") * F.col("diff_micro")).cast("double")
            / F.sum("n_treated").cast("double")
            / F.lit(1000000.0),
            6,
        ).alias("att"),
    )


def diff_in_diff(
    df: DataFrame,
    treat_col: str,
    post_col: str,
    y_col: str,
) -> DataFrame:
    """Two-by-two difference-in-differences estimator (Card & Krueger 1994
    canonical design): ``DiD = (ybar_T,post - ybar_T,pre) - (ybar_C,post -
    ybar_C,pre)`` over integer-valued outcomes (quantize upstream — cents,
    counts).

    One grouped aggregation produces the four cell sums/counts as exact
    BIGINTs; the estimate is four correctly-rounded IEEE divides combined
    in one fixed literal expression and micro-rounded ONCE — the same
    hash-stability contract as the repo's other test statistics. Output is
    one row: the four cells (pivoted to columns, exact) +
    ``did_micro``. Degenerate designs (an empty cell) yield NULL rather
    than a misleading zero.

    Scale shape: a single map-side-combined aggregation over the scan —
    the 100-TB cost is the scan itself. ``treat_col`` / ``post_col`` must
    be 0/1 integers.
    """
    cells = df.groupBy().agg(
        *[
            agg
            for t in (0, 1)
            for p in (0, 1)
            for agg in (
                F.sum(
                    F.when((F.col(treat_col) == t) & (F.col(post_col) == p), 1).otherwise(0)
                ).cast("long").alias(f"n_{t}{p}"),
                F.sum(
                    F.when(
                        (F.col(treat_col) == t) & (F.col(post_col) == p),
                        F.col(y_col).cast("long"),
                    ).otherwise(0)
                ).cast("long").alias(f"s_{t}{p}"),
            )
        ]
    )
    return cells.select(
        "n_00", "s_00", "n_01", "s_01", "n_10", "s_10", "n_11", "s_11",
        F.expr(
            "CASE WHEN n_00 > 0 AND n_01 > 0 AND n_10 > 0 AND n_11 > 0 THEN "
            "CAST(FLOOR((CAST(s_11 AS DOUBLE) / n_11 - CAST(s_10 AS DOUBLE) / n_10 "
            "- CAST(s_01 AS DOUBLE) / n_01 + CAST(s_00 AS DOUBLE) / n_00) "
            "* 1000000 + 0.5) AS BIGINT) END"
        ).alias("did_micro"),
    )


def ipw_ate(
    df: DataFrame,
    treat_expr: str,
    outcome_expr: str,
    bin_expr: str,
) -> DataFrame:
    """Inverse-propensity-weighted average treatment effect (Horvitz &
    Thompson 1952; Rosenbaum & Rubin 1983 — public methodology): the
    third causal estimator next to CEM matching and diff-in-diff.

    Propensities are the EXACT rationals ``e(b) = treated_b / n_b`` of the
    caller-binned covariate (``bin_expr`` owns the discretization, same
    contract as the stump/quantile operators) — never a fitted float
    model, so each row's weighted term is one truncated integer division:
    ``y_milli · n_b div treated_b`` for treated rows, minus
    ``y_milli · n_b div (n_b − treated_b)`` for controls. Rows in bins
    without overlap (no treated or no control — the positivity
    requirement) are EXCLUDED and counted, never silently imputed.

    ``ate_milli = Σ terms div n_overlap`` — every output an exact BIGINT.
    Scale shape: one map-side-combined bin aggregate (broadcastable), one
    join back, one total. Returns one row
    ``(n_rows, n_overlap, n_excluded, sum_term_milli, ate_milli)``.
    """
    base = df.select(
        F.expr(bin_expr).cast("long").alias("b"),
        F.expr(treat_expr).cast("boolean").cast("long").alias("t"),
        F.expr(outcome_expr).cast("long").alias("y"),
    ).filter(F.col("b").isNotNull() & F.col("y").isNotNull())
    bins = base.groupBy("b").agg(
        F.count(F.lit(1)).alias("n_b"), F.sum("t").alias("t_b")
    )
    j = base.join(F.broadcast(bins), "b")
    overlap = (F.col("t_b") > 0) & (F.col("t_b") < F.col("n_b"))
    term = F.when(
        F.col("t") == 1, F.expr("y * n_b div t_b")
    ).otherwise(-F.expr("y * n_b div (n_b - t_b)"))
    agg = j.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(overlap, 1).otherwise(0)).alias("n_overlap"),
        F.sum(F.when(~overlap, 1).otherwise(0)).alias("n_excluded"),
        F.coalesce(F.sum(F.when(overlap, term)), F.lit(0)).alias("sum_term_milli"),
    )
    return agg.select(
        "n_rows",
        "n_overlap",
        "n_excluded",
        "sum_term_milli",
        F.expr(
            "IF(n_overlap = 0, 0L, sum_term_milli div n_overlap)"
        ).alias("ate_milli"),
    )


def rdd_sharp(
    units: DataFrame,
    running: Column,
    outcome: Column,
    cutoff: int,
    bandwidth: int,
) -> DataFrame:
    """Sharp regression-discontinuity estimate (Thistlethwaite & Campbell
    1960; Imbens & Lemieux 2008 — public methodology): fit a separate
    local-linear regression on each side of ``cutoff`` within
    ``bandwidth`` of it, and report the jump between the two fitted values
    AT the cutoff — the standard quasi-experimental estimator when
    treatment flips deterministically at a threshold (spend tiers, score
    cutoffs, rollout cohorts).

    ``running`` must be an exact integer column; ``outcome`` an exact
    integer column (pre-scale currency to cents). The whole estimator is
    ONE map-side-combined aggregation producing the ten per-side OLS
    moments (n, Su, Sy, Suu, Suy over ``u = running - cutoff``) as exact
    BIGINTs — no joins, no window, no second scan — then the closed-form
    slope/intercept in an identical double expression tree on both
    engines, micro-rounded once per output (the regress.py discipline).
    Left side is ``u in [-bandwidth, 0)``, right is ``u in [0, bandwidth]``
    (treatment starts AT the cutoff).

    Returns ONE row: ``(n_l, n_r, yhat_l_micro, yhat_r_micro, tau_micro,
    slope_l_micro, slope_r_micro)`` — fitted values at the cutoff per
    side, their difference (the RD effect), and the side slopes. If either
    side is degenerate (fewer than 2 points, or zero running-variable
    variance — checked in exact integers: ``n*Suu - Su^2 = 0``), every
    fitted output is the 0 sentinel (the repo-wide never-NULL gate rule;
    ANSI mode makes the division a hard error otherwise) and callers must
    check ``n_l``/``n_r``.
    """
    if bandwidth < 1:
        raise ValueError("bandwidth must be >= 1")
    u = (running.cast("long") - F.lit(int(cutoff))).alias("u")
    y = outcome.cast("long").alias("y")
    rows = units.select(u, y).filter(
        (F.col("u") >= -int(bandwidth)) & (F.col("u") <= int(bandwidth))
    )
    side = (F.col("u") >= 0).cast("long")
    m = rows.select(F.col("u"), F.col("y"), side.alias("r")).agg(
        F.sum(F.lit(1) - F.col("r")).alias("n_l"),
        F.sum("r").alias("n_r"),
        F.sum((1 - F.col("r")) * F.col("u")).alias("su_l"),
        F.sum(F.col("r") * F.col("u")).alias("su_r"),
        F.sum((1 - F.col("r")) * F.col("y")).alias("sy_l"),
        F.sum(F.col("r") * F.col("y")).alias("sy_r"),
        F.sum((1 - F.col("r")) * F.col("u") * F.col("u")).alias("suu_l"),
        F.sum(F.col("r") * F.col("u") * F.col("u")).alias("suu_r"),
        F.sum((1 - F.col("r")) * F.col("u") * F.col("y")).alias("suy_l"),
        F.sum(F.col("r") * F.col("u") * F.col("y")).alias("suy_r"),
    )

    def _fit(s: str) -> tuple[str, str]:
        # slope = (n*Suy - Su*Sy) / (n*Suu - Su^2); intercept AT u=0 =
        # (Sy - slope*Su) / n — identical double trees both engines
        b = (
            f"((CAST(n_{s} AS DOUBLE) * CAST(suy_{s} AS DOUBLE)"
            f" - CAST(su_{s} AS DOUBLE) * CAST(sy_{s} AS DOUBLE))"
            f" / (CAST(n_{s} AS DOUBLE) * CAST(suu_{s} AS DOUBLE)"
            f" - CAST(su_{s} AS DOUBLE) * CAST(su_{s} AS DOUBLE)))"
        )
        a = (
            f"((CAST(sy_{s} AS DOUBLE) - {b} * CAST(su_{s} AS DOUBLE))"
            f" / CAST(n_{s} AS DOUBLE))"
        )
        return a, b

    a_l, b_l = _fit("l")
    a_r, b_r = _fit("r")
    ok = (
        "(n_l >= 2 AND n_r >= 2"
        " AND n_l * suu_l - su_l * su_l <> 0"
        " AND n_r * suu_r - su_r * su_r <> 0)"
    )

    def _g(expr: str, name: str) -> Column:
        return F.expr(
            f"CASE WHEN {ok} THEN CAST(ROUND({expr} * 1000000.0) AS BIGINT)"
            " ELSE CAST(0 AS BIGINT) END"
        ).alias(name)

    return m.select(
        F.col("n_l"),
        F.col("n_r"),
        _g(a_l, "yhat_l_micro"),
        _g(a_r, "yhat_r_micro"),
        _g(f"({a_r} - {a_l})", "tau_micro"),
        _g(b_l, "slope_l_micro"),
        _g(b_r, "slope_r_micro"),
    )


def cuped_adjusted_effect(
    units: DataFrame,
    treated: Column,
    outcome: Column,
    covariate: Column,
) -> DataFrame:
    """CUPED variance-reduced treatment-effect estimate (Deng, Xu, Kohavi
    & Walker 2013, WSDM — public methodology): adjust each unit's outcome
    by its PRE-experiment covariate, ``y_adj = y - theta * (x - xbar)``
    with ``theta = cov(x, y) / var(x)`` pooled over all units, then report
    the treated-vs-control difference of adjusted means. The standard
    online-experimentation trick: the adjustment leaves the expected
    effect unbiased while shrinking variance by the squared x-y
    correlation.

    ``outcome`` and ``covariate`` must be exact integer columns (pre-scale
    to cents/micro). ONE map-side-combined aggregation produces the eight
    pooled/per-arm BIGINT moments; theta and the adjusted means are
    closed-form double trees over those integers (the regress.py
    discipline), micro-rounded once per output. Returns ONE row:
    ``(n_t, n_c, theta_micro, effect_raw_micro, effect_cuped_micro)``.
    If ``var(x) = 0`` (checked in exact integers) theta is the 0 sentinel
    and the CUPED effect equals the raw effect.
    """
    t = treated.cast("long").alias("t")
    rows = units.select(
        t, outcome.cast("long").alias("y"), covariate.cast("long").alias("x")
    )
    m = rows.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum("t").alias("n_t"),
        F.sum(F.col("t") * F.col("y")).alias("sy_t"),
        F.sum(F.col("t") * F.col("x")).alias("sx_t"),
    )
    theta = (
        "((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
        " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))"
    )
    # adjusted-mean difference: (ybar_t - ybar_c) - theta * (xbar_t - xbar_c)
    raw = (
        "(CAST(sy_t AS DOUBLE) / CAST(n_t AS DOUBLE)"
        " - CAST(sy - sy_t AS DOUBLE) / CAST(n - n_t AS DOUBLE))"
    )
    xdiff = (
        "(CAST(sx_t AS DOUBLE) / CAST(n_t AS DOUBLE)"
        " - CAST(sx - sx_t AS DOUBLE) / CAST(n - n_t AS DOUBLE))"
    )
    okv = "(n * sxx - sx * sx <> 0)"
    okn = "(n_t > 0 AND n - n_t > 0)"
    return m.select(
        F.col("n_t"),
        (F.col("n") - F.col("n_t")).alias("n_c"),
        F.expr(
            f"CASE WHEN {okv} THEN CAST(ROUND({theta} * 1000000.0) AS BIGINT)"
            " ELSE CAST(0 AS BIGINT) END"
        ).alias("theta_micro"),
        F.expr(
            f"CASE WHEN {okn} THEN CAST(ROUND({raw} * 1000000.0) AS BIGINT)"
            " ELSE CAST(0 AS BIGINT) END"
        ).alias("effect_raw_micro"),
        F.expr(
            f"CASE WHEN {okn} THEN CAST(ROUND(CASE WHEN {okv}"
            f" THEN {raw} - {theta} * {xdiff} ELSE {raw} END"
            " * 1000000.0) AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        ).alias("effect_cuped_micro"),
    )


def aipw_ate(
    df: DataFrame,
    treat_expr: str,
    outcome_expr: str,
    bin_expr: str,
) -> DataFrame:
    """Doubly-robust AIPW average treatment effect (Robins, Rotnitzky &
    Zhao 1994 — public methodology): the augmented IPW estimator

        dr_i = (m1(b) - m0(b))
             + t_i  * (y_i - m1(b)) / e(b)
             - (1-t_i) * (y_i - m0(b)) / (1 - e(b))

    with BOTH nuisance models the exact per-bin rationals of the
    caller-binned covariate — propensity ``e(b) = t_b / n_b`` (the
    :func:`ipw_ate` contract) and outcome models ``m1(b) = sy1_b / t_b``,
    ``m0(b) = sy0_b / (n_b - t_b)``. Consistent if EITHER model is right
    — the sixth causal estimator, completing CEM / DiD / IPW / RD / CUPED.

    Exactness: outcomes pre-scaled to integer units by ``outcome_expr``;
    every division is a truncated integer division over BIGINTs (Spark
    ``div`` == DuckDB ``//`` truncate-toward-zero INCLUDING negatives —
    the documented rule; residuals can be negative). Non-overlap bins are
    excluded and counted (the positivity contract). One bin aggregate
    (broadcast), one join back, one total. Returns one row
    ``(n_rows, n_overlap, n_excluded, sum_term, ate_unit)`` in the
    outcome's integer units.
    """
    base = df.select(
        F.expr(bin_expr).cast("long").alias("b"),
        F.expr(treat_expr).cast("boolean").cast("long").alias("t"),
        F.expr(outcome_expr).cast("long").alias("y"),
    ).filter(F.col("b").isNotNull() & F.col("y").isNotNull())
    bins = base.groupBy("b").agg(
        F.count(F.lit(1)).alias("n_b"),
        F.sum("t").alias("t_b"),
        F.sum(F.col("t") * F.col("y")).alias("sy1"),
        F.sum((1 - F.col("t")) * F.col("y")).alias("sy0"),
    )
    j = base.join(F.broadcast(bins), "b")
    overlap = (F.col("t_b") > 0) & (F.col("t_b") < F.col("n_b"))
    m1 = "(sy1 div t_b)"
    m0 = "(sy0 div (n_b - t_b))"
    term = F.expr(
        f"({m1} - {m0})"
        f" + IF(t = 1, ((y - {m1}) * n_b) div t_b,"
        f"            -(((y - {m0}) * n_b) div (n_b - t_b)))"
    )
    agg = j.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(overlap, 1).otherwise(0)).alias("n_overlap"),
        F.sum(F.when(~overlap, 1).otherwise(0)).alias("n_excluded"),
        F.coalesce(F.sum(F.when(overlap, term)), F.lit(0)).alias("sum_term"),
    )
    return agg.select(
        "n_rows",
        "n_overlap",
        "n_excluded",
        "sum_term",
        F.expr("IF(n_overlap = 0, 0L, sum_term div n_overlap)").alias("ate_unit"),
    )
