"""Hypothesis testing over grouped facts — Welch two-sample t and the
chi-square independence test, the experimentation (A/B) analytics pair.

Both tests reduce to EXACT INTEGER sufficient statistics computed in one
map-side-combined aggregation — counts, sums, sums of squares, contingency
cells — which is the whole 100-TB story: the fact table is scanned once,
one tiny shuffle of partial aggregates, and the test statistic itself is
driver-free in-plan arithmetic over a handful of BIGINTs.

Determinism/hash-stability: every emitted statistic either IS one of the
exact BIGINT moments, or is a double computed from those BIGINTs by a
fixed sequence of IEEE-correctly-rounded ops (division, sqrt) — identical
on any engine — and micro-rounded ONCE at the end (the repo-wide
discipline; see operators/lm.py). Value columns must be pre-scaled to
integer units (cents/micros) upstream.

Public methodology: Welch 1947 (unequal-variance t), Pearson 1900
(chi-square); Welch–Satterthwaite degrees of freedom.

Reference parity: none (single-query reference); experimentation-analytics
mandate breadth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["welch_ttest", "chi_square", "mann_kendall", "anova_oneway"]

_SCALE = 1_000_000


def welch_ttest(
    df: DataFrame,
    variant_col: str,
    value_col: str,
    variant_a: str,
    variant_b: str,
) -> DataFrame:
    """One row: ``(n_a, n_b, sum_a, sum_b, sumsq_a, sumsq_b, t_micro,
    df_micro)`` — Welch's unequal-variance two-sample t.

    ``value_col`` must be integer-valued. The six moments are exact
    BIGINTs; ``t`` and the Welch–Satterthwaite degrees of freedom are
    derived from them in-plan and micro-rounded once. Requires >= 2 rows
    per variant (sample variance) — emits NULL statistics otherwise is
    avoided by construction: callers gate on experiment arms with data.
    """
    base = df.select(
        F.col(variant_col).alias("g"), F.col(value_col).cast("long").alias("v")
    ).filter(F.col("g").isin([variant_a, variant_b]))
    m = base.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s1"),
        F.sum(F.col("v") * F.col("v")).alias("s2"),
    )
    a = m.filter(F.col("g") == variant_a).select(
        F.col("n").alias("n_a"), F.col("s1").alias("sum_a"), F.col("s2").alias("sumsq_a")
    )
    b = m.filter(F.col("g") == variant_b).select(
        F.col("n").alias("n_b"), F.col("s1").alias("sum_b"), F.col("s2").alias("sumsq_b")
    )
    # doubles derived from exact ints by division/multiplication/sqrt only
    # (all IEEE-correctly-rounded, unlike POW) — identical on any engine
    j = (
        a.crossJoin(b)
        .withColumn(
            "va",
            F.expr("((sumsq_a - CAST(sum_a AS DOUBLE) * sum_a / n_a) / (n_a - 1)) / n_a"),
        )
        .withColumn(
            "vb",
            F.expr("((sumsq_b - CAST(sum_b AS DOUBLE) * sum_b / n_b) / (n_b - 1)) / n_b"),
        )
    )
    t = F.expr("(CAST(sum_a AS DOUBLE) / n_a - CAST(sum_b AS DOUBLE) / n_b) / SQRT(va + vb)")
    dfw = F.expr("(va + vb) * (va + vb) / (va * va / (n_a - 1) + vb * vb / (n_b - 1))")
    return j.select(
        "n_a",
        "n_b",
        "sum_a",
        "sum_b",
        "sumsq_a",
        "sumsq_b",
        F.round(t * _SCALE).cast("long").alias("t_micro"),
        F.round(dfw * _SCALE).cast("long").alias("df_micro"),
    )


def chi_square(df: DataFrame, row_col: str, col_col: str) -> DataFrame:
    """One row: ``(n_cells, n_rows_cat, n_cols_cat, total, chi2_micro)`` —
    Pearson chi-square for independence of two categoricals.

    Contingency cells, margins, and the total are exact BIGINTs from ONE
    aggregation over the fact table (margins re-derived from the cell
    table, which is categories-sized). Unobserved (r, c) pairs contribute
    their expectation; the closed form ``chi2 = T * (sum o^2/(r*c) - 1)``
    needs only OBSERVED cells — no dense category cross join.

    Reduction-order independence: the only float reduction is the sum of
    per-cell ``o^2/(r*c)`` fractions, so each fraction is rounded to
    NANO-units first (a BIGINT), the sum is exact, and chi2 is derived
    from that single integer: ``chi2_micro = ROUND(T * (S_nano - 1e9) /
    1000)``. Bias <= 0.5e-9 per cell, identical on both engines. Bound:
    ``T * S_nano`` must stay under 2^63 — fine through ~10^9 facts per
    test; shard larger experiments by stratum.
    """
    cells = (
        df.select(F.col(row_col).alias("r"), F.col(col_col).alias("c"))
        .groupBy("r", "c")
        .agg(F.count(F.lit(1)).alias("o"))
    )
    rm = cells.groupBy("r").agg(F.sum("o").alias("rn"))
    cm = cells.groupBy("c").agg(F.sum("o").alias("cn"))
    tot = cells.groupBy().agg(F.sum("o").alias("t"), F.count(F.lit(1)).alias("n_cells"))
    term = (
        cells.join(F.broadcast(rm), "r")
        .join(F.broadcast(cm), "c")
        .crossJoin(F.broadcast(tot))
        .select(
            "n_cells",
            "t",
            F.round(
                F.col("o").cast("double")
                * F.col("o")
                / (F.col("rn").cast("double") * F.col("cn"))
                * F.lit(1_000_000_000)
            )
            .cast("long")
            .alias("frac_nano"),
        )
    )
    return (
        term.groupBy("n_cells", "t")
        .agg(F.sum("frac_nano").alias("s_nano"))
        .crossJoin(F.broadcast(rm.groupBy().agg(F.count(F.lit(1)).alias("n_rows_cat"))))
        .crossJoin(F.broadcast(cm.groupBy().agg(F.count(F.lit(1)).alias("n_cols_cat"))))
        .select(
            "n_cells",
            "n_rows_cat",
            "n_cols_cat",
            F.col("t").alias("total"),
            F.round(
                (F.col("t") * (F.col("s_nano") - F.lit(1_000_000_000))) / F.lit(1000.0)
            )
            .cast("long")
            .alias("chi2_micro"),
        )
    )


def benford_test(df: DataFrame, value_col: str) -> DataFrame:
    """Benford first-digit goodness-of-fit over a positive integer column
    (fraud/synthetic-data screening: natural multiplicative data follows
    P(d) = log10(1 + 1/d); uniform or fabricated figures don't).

    The first digit comes from the BIGINT's string form (no float log in
    the digit path), so the whole scan is one codegen'd projection + one
    9-bucket map-side-combined aggregate. Expected probabilities are the
    nine constants inlined as full-precision literals computed by Python's
    math.log10 — not engine log10 (log is NOT correctly rounded IEEE and
    may differ across engines; a literal is bit-identical everywhere). The
    per-digit chi-square term is then a fixed sequence of correctly-rounded
    ops (cast, *, -, /) over the exact counts; terms are emitted per digit
    (no float sum anywhere — callers can sum the 9 rounded terms if they
    want the scalar statistic).

    Returns ``(digit, observed, expected, term)`` for digits 1..9, where
    ``expected = n * P(d)`` and ``term = (observed - expected)^2 /
    expected``, both rounded to 6 dp.
    """
    import math

    v = F.col(value_col)
    digits = df.where(v > 0).select(
        F.substring(v.cast("string"), 1, 1).cast("int").alias("digit")
    )
    obs = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("observed"))
    n = digits.groupBy().agg(F.count(F.lit(1)).alias("__n"))
    # all 9 digits present even when observed == 0
    base = (
        obs.sparkSession.range(1, 10)
        .select(F.col("id").cast("int").alias("digit"))
        .join(obs, "digit", "left")
        .select("digit", F.coalesce("observed", F.lit(0)).alias("observed"))
        .crossJoin(F.broadcast(n))
    )
    p_case = "CASE digit " + " ".join(
        f"WHEN {d} THEN {math.log10(1.0 + 1.0 / d)!r}" for d in range(1, 10)
    ) + " END"
    return base.select(
        "digit",
        "observed",
        F.round(F.expr(f"CAST(__n AS DOUBLE) * ({p_case})"), 6).alias("expected"),
        F.round(
            F.expr(
                f"(CAST(observed AS DOUBLE) - CAST(__n AS DOUBLE) * ({p_case}))"
                f" * (CAST(observed AS DOUBLE) - CAST(__n AS DOUBLE) * ({p_case}))"
                f" / (CAST(__n AS DOUBLE) * ({p_case}))"
            ),
            6,
        ).alias("term"),
    )


def poisson_bootstrap_mean(
    df: DataFrame, value_col: str, id_col: str, n_boot: int = 100
) -> DataFrame:
    """Poisson bootstrap of the mean: ``n_boot`` deterministic resample
    means in ONE scan (the classic scale-out bootstrap — Chamandy et al.,
    "Estimating Uncertainty for Massive Data Streams", Google 2012: at
    large n, multinomial resampling factorizes into independent
    Poisson(1) weights per row, so no global resample pass is needed).

    Each (row, replicate) weight is Poisson(1)-distributed but fully
    deterministic: a Knuth multiplicative hash of (id, b) produces a
    32-bit uniform, inverted through the Poisson CDF as INTEGER threshold
    literals precomputed in Python (floor(cdf_k * 2^32)) — no engine RNG,
    no float in the weight path, repartition-stable and SQL-replayable.
    Replicate means are exact BIGINT weighted sums divided once.

    Scale shape: the explode costs n_boot x the scan IN ONE JOB (no
    driver loop, no shuffle of the raw table — the only shuffle carries
    n_boot partial rows per partition). Weights are capped at 10
    (P ~ 1e-8 tail); the CI consumer reads the n_boot-row output.

    Returns ``(b, n_eff, mean)`` — one row per replicate.
    """
    import math

    thresholds = []
    acc, fact = 0.0, 1
    for k in range(10):
        if k:
            fact *= k
        acc += math.exp(-1.0) / fact
        thresholds.append(int(math.floor(acc * 4294967296.0)))
    w_case = (
        "CASE "
        + " ".join(f"WHEN __h < {t} THEN {k}" for k, t in enumerate(thresholds))
        + " ELSE 10 END"
    )
    rep = df.select(
        F.col(id_col).alias("__id"),
        F.col(value_col).cast("long").alias("__x"),
        F.explode(F.expr(f"sequence(1, {int(n_boot)})")).alias("b"),
    )
    weighted = (
        rep.withColumn("__h1", F.expr("pmod(__id * 2654435761, 4294967296) % 1000003"))
        .withColumn("__h", F.expr("pmod((__h1 + b * 7919) * 2654435761, 4294967296)"))
        .withColumn("__w", F.expr(w_case).cast("long"))
    )
    out = weighted.groupBy("b").agg(
        F.sum(F.col("__w") * F.col("__x")).alias("__sx"),
        F.sum("__w").alias("n_eff"),
    )
    return out.select(
        F.col("b").cast("int").alias("b"),
        "n_eff",
        F.expr(
            "CASE WHEN n_eff > 0 THEN CAST(__sx AS DOUBLE) / CAST(n_eff AS DOUBLE) END"
        ).alias("mean"),
    )


def mann_kendall(
    df: DataFrame, key_col: str, time_col: str, value_col: str
) -> DataFrame:
    """Per-key Mann-Kendall monotonic-trend test (Mann 1945, Kendall 1975
    — the standard nonparametric "is this series drifting" screen) over a
    pre-aggregated time series: ``S = sum_{i<j} sign(x_j - x_i)`` ordered
    by ``time_col``, plus the tie-corrected variance in EXACT 18x units:
    ``var18 = n(n-1)(2n+5) - sum_g t_g(t_g-1)(2t_g+5)`` (so
    ``Var(S) = var18/18`` exactly — no float anywhere; consumers needing a
    z-score divide once).

    Contract: one row per (key, time) — callers pre-aggregate raw facts to
    a bounded grid (daily/weekly/monthly) first, which is also the 100-TB
    scale story: the pair enumeration is a within-key self-join, quadratic
    in the per-key SERIES length (bounded by the grid, e.g. 120 months),
    never in the fact count; it shuffles once on the key. ``value_col``
    must be integer-valued (pre-scale to cents/micros).

    Returns ``(grp, n, s, var18)`` — all BIGINT.
    """
    ser = df.select(
        F.col(key_col).alias("k"),
        F.col(time_col).alias("t"),
        F.col(value_col).cast("long").alias("x"),
    )
    a, b = ser.alias("a"), ser.alias("b")
    sg = (
        F.when(F.col("b.x") > F.col("a.x"), F.lit(1))
        .when(F.col("b.x") < F.col("a.x"), F.lit(-1))
        .otherwise(F.lit(0))
    )
    s = (
        a.join(b, (F.col("a.k") == F.col("b.k")) & (F.col("a.t") < F.col("b.t")))
        .groupBy(F.col("a.k").alias("k"))
        .agg(F.sum(sg).alias("s"))
    )
    nn = ser.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    ties = (
        ser.groupBy("k", "x")
        .agg(F.count(F.lit(1)).alias("tp"))
        .groupBy("k")
        .agg(
            F.sum(
                F.col("tp") * (F.col("tp") - 1) * (2 * F.col("tp") + 5)
            ).alias("tie_term")
        )
    )
    return (
        nn.join(ties, "k")
        .join(s, "k", "left")
        .select(
            F.col("k").alias("grp"),
            F.col("n").cast("long").alias("n"),
            F.coalesce(F.col("s"), F.lit(0)).cast("long").alias("s"),
            (
                F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                - F.col("tie_term")
            )
            .cast("long")
            .alias("var18"),
        )
    )


def sprt_binomial(
    df: DataFrame,
    arm_col: str,
    success_col: str,
    p0: float = 0.18,
    p1: float = 0.22,
    alpha: float = 0.05,
    beta: float = 0.05,
) -> DataFrame:
    """Per-arm binomial SPRT (Wald 1945, Sequential Probability Ratio
    Test — the always-valid A/B stopping rule): the log-likelihood ratio
    for H1: p = p1 vs H0: p = p0 after n trials with s successes is
    ``LLR = s*ln(p1/p0) + (n-s)*ln((1-p1)/(1-p0))``; accept H1 when LLR >=
    ln((1-beta)/alpha), accept H0 when LLR <= ln(beta/(1-alpha)),
    otherwise keep sampling.

    Determinism: the four log constants are computed by PYTHON's math.log
    and inlined as repr literals (engine ln is not correctly-rounded IEEE
    and must never cross engines — the Benford rule); s and n are exact
    BIGINT from one map-side-combined aggregation, so the LLR is two
    correctly-rounded multiplies and one add.

    Returns ``(arm, n, successes, llr, decision)``.
    """
    import math

    la = math.log(p1 / p0)
    lb = math.log((1.0 - p1) / (1.0 - p0))
    hi = math.log((1.0 - beta) / alpha)
    lo = math.log(beta / (1.0 - alpha))
    agg = df.groupBy(F.col(arm_col).alias("arm")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(success_col).cast("long")).alias("successes"),
    )
    llr = F.expr(
        f"CAST(successes AS DOUBLE) * {la!r}"
        f" + CAST(n - successes AS DOUBLE) * {lb!r}"
    )
    return agg.select("arm", "n", "successes", llr.alias("llr")).select(
        "arm",
        "n",
        "successes",
        "llr",
        F.when(F.col("llr") >= hi, F.lit("accept_h1"))
        .when(F.col("llr") <= lo, F.lit("accept_h0"))
        .otherwise(F.lit("continue"))
        .alias("decision"),
    )


def anova_oneway(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """One row ``(n, k, s_total, ssq, t_milli_sum, f_micro)`` — one-way
    ANOVA F across all groups (Fisher 1925, public methodology).

    Sufficient statistics are exact BIGINTs from ONE aggregation
    (per-group count and sum, plus the global sum of squares);
    ``value_col`` must be integer-quantized by the caller so squares stay
    under 2^53 when lifted to double. The cross-group reduction
    ``sum_g s_g^2 / n_g`` uses the shared trick: each group's term is
    rounded once to MILLI units via floor(x+0.5) (exact IEEE both
    engines), the sum is an exact BIGINT, and::

        SSB = t_milli_sum/1000 - S^2/N      (between-group)
        SSW = SSQ - t_milli_sum/1000        (within-group)
        F   = (SSB/(k-1)) / (SSW/(N-k))

    is a fixed sequence of correctly-rounded ops over integers. Degenerate
    inputs (k < 2, N <= k, or SSW <= 0 — all groups internally constant)
    emit f_micro = -1 rather than dividing by zero.
    """
    base = df.select(
        F.col(group_col).alias("__g"), F.col(value_col).cast("long").alias("__v")
    )
    grp = base.groupBy("__g").agg(
        F.count(F.lit(1)).alias("__ng"), F.sum("__v").alias("__sg")
    )
    tot = base.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__v").alias("s_total"),
        F.sum(F.col("__v") * F.col("__v")).alias("ssq"),
    )
    terms = grp.groupBy().agg(
        F.count(F.lit(1)).alias("k"),
        F.sum(
            F.floor(
                F.col("__sg").cast("double") * F.col("__sg") / F.col("__ng")
                * F.lit(1000.0)
                + F.lit(0.5)
            ).cast("long")
        ).alias("t_milli_sum"),
    )
    j = tot.crossJoin(F.broadcast(terms))
    ssb = F.expr(
        "CAST(t_milli_sum AS DOUBLE) / 1000.0"
        " - CAST(s_total AS DOUBLE) * s_total / n"
    )
    ssw = F.expr("CAST(ssq AS DOUBLE) - CAST(t_milli_sum AS DOUBLE) / 1000.0")
    f_stat = (ssb / (F.col("k") - 1)) / (ssw / (F.col("n") - F.col("k")))
    return j.select(
        "n",
        "k",
        "s_total",
        "ssq",
        "t_milli_sum",
        F.when(
            (F.col("k") < 2) | (F.col("n") <= F.col("k")) | (ssw <= 0), F.lit(-1)
        )
        .otherwise(F.floor(f_stat * F.lit(1_000_000) + F.lit(0.5)))
        .cast("long")
        .alias("f_micro"),
    )


def bh_fdr(
    tests: DataFrame,
    key_col: str,
    p_micro_col: str,
    alpha_num: int = 1,
    alpha_den: int = 10,
) -> DataFrame:
    """Benjamini-Hochberg step-up FDR control (Benjamini & Hochberg 1995,
    public methodology) over a table of hypotheses with micro-unit
    p-values (``p_micro = p * 1e6`` as BIGINT): find the largest rank k
    with ``p_(k) <= alpha * k / m`` and reject ranks 1..k.

    Entirely integer — the threshold test is
    ``p_micro * m * alpha_den <= rank * 1000000 * alpha_num`` — so both
    engines agree bit-for-bit. Ranks are ``row_number`` ordered by
    ``(p_micro, key)`` (deterministic ties; the REJECTION SET is
    tie-order-invariant because the cut uses the max passing rank).

    The window is a single partition BY DESIGN OVER THE HYPOTHESIS TABLE —
    one row per already-aggregated test, thousands at most, never raw
    data; the data-sized work happened upstream in whatever produced the
    p-values. Returns ``(key_col, p_micro, rank, rejected)``.
    """
    from pyspark.sql import Window

    t = tests.select(
        F.col(key_col).alias("k"), F.col(p_micro_col).cast("long").alias("p_micro")
    )
    w = Window.orderBy("p_micro", "k")
    ranked = t.select(
        "k", "p_micro", F.row_number().over(w).cast("long").alias("rank")
    ).localCheckpoint(eager=False)
    m = ranked.groupBy().agg(F.count(F.lit(1)).alias("m"))
    cut = (
        ranked.crossJoin(m)
        .filter(
            F.col("p_micro") * F.col("m") * F.lit(alpha_den)
            <= F.col("rank") * F.lit(1000000) * F.lit(alpha_num)
        )
        .groupBy()
        .agg(F.coalesce(F.max("rank"), F.lit(0).cast("long")).alias("kcut"))
    )
    return ranked.crossJoin(cut).select(
        F.col("k").alias(key_col),
        "p_micro",
        "rank",
        (F.col("rank") <= F.col("kcut")).cast("int").alias("rejected"),
    )


def dispersion_index(
    df: DataFrame,
    group_col: str,
    unit_col: str,
) -> DataFrame:
    """Per-group index of dispersion (variance-to-mean ratio of per-unit
    counts — Fisher 1950; public methodology): the standard
    overdispersion screen before assuming Poisson behavior (VMR = 1);
    VMR >> 1 means burst/contagion (pairs with the self-excitation
    screen), VMR < 1 means regularity/quota. Counts events per
    ``(group, unit)``, then per group the exact BIGINT moments
    ``(n_units, sum, sum_sq)`` and ``vmr_micro`` from the population
    variance — one fixed double tree, micro-rounded once; zero-mean
    groups emit the 0 sentinel. Two map-side-combined aggregations.
    Returns ``(group, n_units, n_events, vmr_micro)``.
    """
    per_unit = (
        df.select(F.col(group_col).alias("g"), F.col(unit_col).alias("u"))
        .groupBy("g", "u")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    m = per_unit.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c").alias("s"),
        F.sum(F.col("c") * F.col("c")).alias("ss"),
    )
    # population variance / mean = (n*ss - s^2) / (n * s)
    return m.select(
        F.col("g").alias(group_col),
        F.col("n").cast("long").alias("n_units"),
        F.col("s").cast("long").alias("n_events"),
        F.expr(
            "CASE WHEN s > 0 THEN CAST(ROUND("
            "(CAST(n AS DOUBLE) * CAST(ss AS DOUBLE)"
            " - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))"
            " / (CAST(n AS DOUBLE) * CAST(s AS DOUBLE))"
            " * 1000000.0) AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        ).alias("vmr_micro"),
    )
