"""Distributed linear regression by exact-integer normal equations.

The scale operator is :func:`moment_matrix`: for integer-valued columns
``x_1..x_D`` and target ``y`` it computes every second moment of the
augmented vector ``z = [1, x_1, .., x_D, y]`` — that is ``n``, the Gram
matrix ``X^T X`` (with intercept), ``X^T y`` and ``y^T y`` — in ONE
map-side-combined aggregation producing a single driver row of
``(D+2)(D+3)/2`` BIGINT sums. No matter how many rows the table has, the
shuffle is one partial-aggregate row per partition: this is the textbook
100-TB shape for OLS/ridge (and for covariance/correlation matrices, which
are rational functions of the same moments). All sums are exact int64
arithmetic — order-independent, repartition-stable, engine-reproducible —
so the ``ols_lineitem`` gate hash-matches a plain SUM-of-products DuckDB
oracle with no float normalization at all.

Solving the (D+2)x(D+2) system is a driver-side micro-task (D is the
feature count, not the row count): :func:`solve_normal_equations` runs exact
Gauss-Jordan elimination over ``fractions.Fraction``, so the coefficient
vector is the mathematically exact rational OLS solution of the quantized
problem — deterministic to the last bit, no LAPACK nondeterminism —
verified against ``numpy.linalg.lstsq`` in tests/test_regress.py. Ridge
regularization is the same system with ``lam`` added to the diagonal
(intercept excluded, standard convention).

Overflow contract: with ``|x_i| <= m_i`` bounded and N rows, each moment is
bounded by ``N * m_i * m_j``; callers quantize (see
operators/clustering.quantize_vectors for the grid rationale) so the worst
product stays under 2^63. :func:`moment_matrix` cannot check value bounds
cheaply, so the bound is the caller's contract, documented per call site.

Reference parity: no regression exists in the reference (single-query
PageRank accelerator); this is LLM-pipeline mandate breadth — quality-score
calibration and heuristic-filter fitting are regressions over corpus
statistics.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def moment_matrix(df: DataFrame, x_cols: list[str], y_col: str) -> DataFrame:
    """Upper-triangle second moments of ``z = [1, *x_cols, y_col]``.

    Returns ``(i, j, s)`` rows, ``0 <= i <= j <= D+1``, where ``s =
    sum(z_i * z_j)`` as exact BIGINT: ``s[0][0]`` is the row count, row 0 vs
    feature i the feature sums, the top-left block ``X^T X``, the last
    column ``X^T y`` / ``y^T y``. Inputs must be integer-valued (cast
    happens here; quantize floats upstream).
    """
    zcols = [F.lit(1).cast("long")] + [F.col(c).cast("long") for c in [*x_cols, y_col]]
    d = len(zcols)
    aggs = []
    for i in range(d):
        for j in range(i, d):
            aggs.append(F.sum(zcols[i] * zcols[j]).alias(f"s_{i}_{j}"))
    one = df.groupBy().agg(*aggs)
    pairs = [(i, j) for i in range(d) for j in range(i, d)]
    stack = ", ".join(f"{i}, {j}, s_{i}_{j}" for i, j in pairs)
    return one.selectExpr(
        f"stack({len(pairs)}, {stack}) AS (i, j, s)"
    ).select(F.col("i").cast("int"), F.col("j").cast("int"), F.col("s").cast("long"))


def solve_normal_equations(
    moments: list[tuple[int, int, int]], d_features: int, lam: Fraction | int = 0
) -> list[Fraction]:
    """Exact rational OLS/ridge coefficients ``[b0 (intercept), b1..bD]``.

    ``moments`` are the (i, j, s) rows of :func:`moment_matrix` (upper
    triangle over z = [1, x.., y] with y at index D+1); ``lam`` is added to
    the diagonal of the non-intercept block (ridge). Gauss-Jordan over
    Fraction — exact, deterministic, and singularity is a real error (a
    collinear feature set raises instead of returning a LAPACK-dependent
    pseudo-inverse pick).
    """
    dz = d_features + 2
    s: dict[tuple[int, int], int] = {}
    for i, j, v in moments:
        s[(i, j)] = int(v)
        s[(j, i)] = int(v)
    n_unk = d_features + 1  # intercept + features
    a = [
        [Fraction(s[(i, j)]) for j in range(n_unk)] + [Fraction(s[(i, dz - 1)])]
        for i in range(n_unk)
    ]
    for i in range(1, n_unk):
        a[i][i] += Fraction(lam)
    for col in range(n_unk):
        piv = next((r for r in range(col, n_unk) if a[r][col] != 0), None)
        if piv is None:
            raise ValueError(f"singular normal equations at column {col} (collinear features?)")
        a[col], a[piv] = a[piv], a[col]
        inv = 1 / a[col][col]
        a[col] = [v * inv for v in a[col]]
        for r in range(n_unk):
            if r != col and a[r][col] != 0:
                f = a[r][col]
                a[r] = [rv - f * cv for rv, cv in zip(a[r], a[col])]
    return [a[r][n_unk] for r in range(n_unk)]


def linear_fit(
    df: DataFrame, x_cols: list[str], y_col: str, lam: int = 0
) -> tuple[list[Fraction], DataFrame]:
    """Fit ``y ~ 1 + x_cols`` end-to-end: one aggregation pass, exact
    driver-side solve. Returns ``(coefficients, moments_df)`` so callers can
    reuse/emit the moments (the gate surface) alongside the fit."""
    m = moment_matrix(df, x_cols, y_col)
    rows = [(r["i"], r["j"], r["s"]) for r in m.collect()]
    return solve_normal_equations(rows, len(x_cols), lam), m


def corr_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Exact-moment Pearson correlation matrix over integer-valued columns.

    ONE map-side-combined aggregation computes ``n``, per-column sums, and
    all pairwise product sums as exact BIGINT (the moment_matrix shape: the
    shuffle is one partial row per partition regardless of row count), then
    each pair's correlation is the closed form over those integers::

        corr = (n*S_xy - S_x*S_y)
               / (sqrt(n*S_xx - S_x^2) * sqrt(n*S_yy - S_y^2))

    The integer numerators/variances are exact and order-free; every float
    op after them (int->double cast, sqrt, *, /) is correctly-rounded IEEE,
    so the double is reduction-order-independent and engine-reproducible
    bit-for-bit.

    Overflow contract (caller's, as in moment_matrix): ``n * max|x_i*x_j|``
    and ``S_i * S_j`` must stay under 2^63 — quantize wide columns down
    first (Pearson is scale/translation-invariant, so rescaling only enters
    through the quantization grid itself, which the caller owns).

    Returns ``(col_a, col_b, corr)`` for the strict upper triangle; a
    constant column yields NULL corr (zero variance) rather than NaN.
    """
    d = len(cols)
    zs = [F.col(c).cast("long") for c in cols]
    aggs = [F.count(F.lit(1)).alias("n")]
    aggs += [F.sum(zs[i]).alias(f"s_{i}") for i in range(d)]
    for i in range(d):
        for j in range(i, d):
            aggs.append(F.sum(zs[i] * zs[j]).alias(f"s_{i}_{j}"))
    one = df.groupBy().agg(*aggs)
    pair_structs = []
    for i in range(d):
        for j in range(i + 1, d):
            num = f"(n * s_{i}_{j} - s_{i} * s_{j})"
            va = f"(n * s_{i}_{i} - s_{i} * s_{i})"
            vb = f"(n * s_{j}_{j} - s_{j} * s_{j})"
            corr = (
                f"CASE WHEN {va} > 0 AND {vb} > 0 THEN CAST({num} AS DOUBLE)"
                f" / (sqrt(CAST({va} AS DOUBLE)) * sqrt(CAST({vb} AS DOUBLE))) END"
            )
            pair_structs.append(
                f"struct('{cols[i]}' AS col_a, '{cols[j]}' AS col_b, {corr} AS corr)"
            )
    return (
        one.select(F.explode(F.expr("array(" + ", ".join(pair_structs) + ")")).alias("p"))
        .select("p.col_a", "p.col_b", "p.corr")
    )


def spearman_corr(df: DataFrame, col_x: str, col_y: str) -> DataFrame:
    """Spearman rank correlation with exact tie-averaged ranks, no global
    sort, no window.

    Average ranks are computed per DISTINCT value: the LUT ``groupBy(v)``
    count is run through :func:`distributed_cumsum
    <..operators.cumsum.distributed_cumsum>` (two-phase prefix sum — the
    100-TB substitute for a single-partition ``Window.orderBy``), giving the
    DOUBLED average rank ``r2 = 2*cum - cnt + 1`` as an exact BIGINT (ties
    average to halves; doubling keeps integers). Rows join the LUT back
    (broadcast when the value domain is small), are centered by the exact
    doubled-rank mean ``n + 1`` (so the three comoment sums need no ``n *``
    rescale and stay under 2^63 for n up to ~2M rows — ranks are the
    worst-case wide column), and ONE aggregation produces the exact BIGINT
    S_xy/S_xx/S_yy; the correlation is the same correctly-rounded IEEE
    closed form as :func:`corr_matrix`.

    Returns one row ``(n, spearman)``.
    """
    from .cumsum import distributed_cumsum

    def rank_lut(col: str, out: str) -> DataFrame:
        cnt = df.groupBy(F.col(col).alias("__v")).agg(F.count(F.lit(1)).alias("__c"))
        cum = distributed_cumsum(cnt, ["__v"], "__c", out_col="__cum")
        return cum.select(
            F.col("__v").alias(col),
            (2 * F.col("__cum") - F.col("__c") + 1).alias(out),
        )

    ranked = (
        df.select(col_x, col_y)
        .join(F.broadcast(rank_lut(col_x, "__rx")), col_x)
        .join(F.broadcast(rank_lut(col_y, "__ry")), col_y)
    )
    nrow = df.groupBy().agg(F.count(F.lit(1)).alias("__n"))
    cen = ranked.crossJoin(F.broadcast(nrow)).select(
        (F.col("__rx") - (F.col("__n") + 1)).alias("cx"),
        (F.col("__ry") - (F.col("__n") + 1)).alias("cy"),
        "__n",
    )
    agg = cen.groupBy().agg(
        F.max("__n").alias("n"),
        F.sum(F.col("cx") * F.col("cy")).alias("sxy"),
        F.sum(F.col("cx") * F.col("cx")).alias("sxx"),
        F.sum(F.col("cy") * F.col("cy")).alias("syy"),
    )
    return agg.select(
        "n",
        F.expr(
            "CASE WHEN sxx > 0 AND syy > 0 THEN CAST(sxy AS DOUBLE)"
            " / (sqrt(CAST(sxx AS DOUBLE)) * sqrt(CAST(syy AS DOUBLE))) END"
        ).alias("spearman"),
    )


def isotonic_fit(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Distributed isotonic regression (least-squares monotone fit of y on
    x — the standard score-calibration primitive) via the minimax
    representation::

        fit(x_i) = max_{j<=i} min_{k>=i} mean(y over blocks x_j..x_k)

    (Robertson–Wright–Dykstra 1988, eq. 1.9–1.13 — equivalent to PAV but
    expressible as relational algebra instead of a sequential pooling
    loop.)

    Scale shape: y is aggregated to EXACT BIGINT (sum, count) per DISTINCT
    x first — the raw table is scanned once and everything after runs on
    the distinct-value table D, with prefix sums from the two-phase
    distributed cumsum (no global window). The pair stages are D^2
    self-joins of that aggregated table: isotonic calibration inputs have
    bounded distinct scores (quantize continuous x upstream), and the
    bound is documented, not silent. Block means are one correctly-rounded
    divide over exact integers, and min/max over doubles are exact
    selections, so the fit is reduction-order-free and engine-identical.

    Returns ``(x, n, fit)`` per distinct x; ``fit`` is non-decreasing in x.
    """
    from .cumsum import distributed_cumsum

    g = df.groupBy(F.col(x_col).alias("x")).agg(
        F.sum(F.col(y_col).cast("long")).alias("sy"),
        F.count(F.lit(1)).alias("c"),
    )
    ps = distributed_cumsum(g, ["x"], "sy", out_col="ps").select("x", "sy", "c", "ps")
    pc = distributed_cumsum(g.select("x", "c"), ["x"], "c", out_col="pc").select("x", "pc")
    base = ps.join(pc, "x")
    lo = base.select(
        F.col("x").alias("xj"),
        (F.col("ps") - F.col("sy")).alias("ps0"),
        (F.col("pc") - F.col("c")).alias("pc0"),
    )
    hi = base.select(F.col("x").alias("xk"), "ps", "pc")
    # mean over the contiguous block x_j..x_k, exact ints -> one divide
    block = lo.join(hi, F.col("xj") <= F.col("xk")).select(
        "xj",
        "xk",
        (
            (F.col("ps") - F.col("ps0")).cast("double")
            / (F.col("pc") - F.col("pc0")).cast("double")
        ).alias("avg"),
    )
    # m(j, i) = min_{k >= i} mean(x_j..x_k) is needed per (j, i); the
    # max-min collapses in two grouped passes because min over k >= i of a
    # row (j, k) depends only on (j, k >= i): first attach each block mean
    # to every i in [j, k]... that is D^3. Instead use the standard
    # two-sided form fit(i) = max_{j<=i} min_{k>=j} avg(j, k), valid at
    # the PAV solution (RWD eq. 1.13): min over k first, then max over j.
    mins = block.groupBy("xj").agg(F.min("avg").alias("mj"))
    idx = base.select(F.col("x"), F.col("c").alias("n"))
    fit = (
        idx.join(mins, F.col("xj") <= F.col("x"))
        .groupBy("x", "n")
        .agg(F.max("mj").alias("fit"))
    )
    return fit.select("x", "n", "fit")


def grouped_trend(
    df: DataFrame, key_col: str, t_col: str, x_col: str
) -> DataFrame:
    """Per-key linear trend (1-D OLS slope/intercept) from exact integer
    moments: ONE map-side-combined groupBy computes (n, St, Sx, Stt, Stx)
    as BIGINT, then ``slope = (n*Stx - St*Sx) / (n*Stt - St^2)`` and
    ``intercept = (Sx - slope*St) / n`` are correctly-rounded IEEE over
    those integers — per-key regression at fact-table scale with no
    window, no per-key iteration (the degenerate-D=1 sibling of
    :func:`moment_matrix`, kept closed-form to stay in one aggregation).

    Overflow contract (caller's): ``n_k * max(t)^2`` and ``n_k * max|t*x|``
    under 2^63 — shift/quantize t (slope is shift-invariant in t).

    Returns ``(key, n, slope, intercept)``; slope NULL for keys with zero
    time variance (single timestamp).
    """
    t = F.col(t_col).cast("long")
    x = F.col(x_col).cast("long")
    agg = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(t).alias("st"),
        F.sum(x).alias("sx"),
        F.sum(t * t).alias("stt"),
        F.sum(t * x).alias("stx"),
    )
    return agg.select(
        "key",
        "n",
        F.expr(
            "CASE WHEN n * stt - st * st > 0 THEN CAST(n * stx - st * sx AS DOUBLE)"
            " / CAST(n * stt - st * st AS DOUBLE) END"
        ).alias("slope"),
        F.expr(
            "CASE WHEN n * stt - st * st > 0 THEN"
            " (CAST(sx AS DOUBLE) - (CAST(n * stx - st * sx AS DOUBLE)"
            "  / CAST(n * stt - st * st AS DOUBLE)) * CAST(st AS DOUBLE))"
            " / CAST(n AS DOUBLE) END"
        ).alias("intercept"),
    )


def theil_sen(
    df: DataFrame, key_col: str, time_col: str, value_col: str
) -> DataFrame:
    """Per-key Theil-Sen slope (Theil 1950 / Sen 1968 — the robust
    median-of-pairwise-slopes trend estimator, the standard companion to
    the Mann-Kendall screen in :mod:`..operators.hyptest`).

    Contract mirrors ``mann_kendall``: one row per (key, time) — callers
    pre-aggregate raw facts to a bounded grid first, so the pair
    enumeration is quadratic only in the per-key SERIES length, never the
    fact count, and shuffles once on the key. ``time_col`` and
    ``value_col`` must be integer-valued (pre-scale).

    Each pairwise slope is floor-scaled ONCE to an exact micro BIGINT
    (``floor(1e6 * dy / dt)`` — floor toward -inf on both engines), and
    the per-key median is the LOWER median (smallest slope whose
    cumulative pair count >= ceil(n/2)) computed by the same keyed-window
    histogram machinery as :func:`..operators.packing.grouped_exact_quantiles`
    — per-key distinct slopes, never buffered raw pairs.

    Returns ``(grp, n_pairs, med_slope_micro)``.
    """
    from pyspark.sql import Window

    ser = df.select(
        F.col(key_col).alias("k"),
        F.col(time_col).cast("long").alias("t"),
        F.col(value_col).cast("long").alias("x"),
    )
    a, b = ser.alias("a"), ser.alias("b")
    slopes = a.join(b, (F.col("a.k") == F.col("b.k")) & (F.col("a.t") < F.col("b.t"))).select(
        F.col("a.k").alias("k"),
        F.floor(
            F.lit(1_000_000.0)
            * (F.col("b.x") - F.col("a.x"))
            / (F.col("b.t") - F.col("a.t"))
        )
        .cast("long")
        .alias("slope"),
    )
    h = slopes.groupBy("k", "slope").agg(F.count(F.lit(1)).alias("__c"))
    w = Window.partitionBy("k").orderBy("slope")
    cum = h.select("k", "slope", F.sum("__c").over(w).alias("__cum"))
    ng = cum.groupBy("k").agg(F.max("__cum").alias("n_pairs"))
    med = (
        cum.join(ng, "k")
        .where(F.col("__cum") >= F.expr("(n_pairs + 1) DIV 2"))
        .groupBy("k", "n_pairs")
        .agg(F.min("slope").alias("med_slope_micro"))
    )
    return med.select(F.col("k").alias("grp"), "n_pairs", "med_slope_micro")


def conformal_interval(
    units: DataFrame,
    x: Column,
    y: Column,
    calib: Column,
    q_num: int = 9,
    q_den: int = 10,
) -> DataFrame:
    """Split-conformal regression interval (Papadopoulos et al 2002; Lei
    et al 2018, JASA — public methodology): fit a simple regression on the
    proper-training split, take the level-``q`` empirical quantile of the
    CALIBRATION split's absolute residuals with the finite-sample
    ``(n+1)`` correction, and ``yhat ± qhat`` covers a fresh point with
    probability >= q — distribution-free. The standard uncertainty wrapper
    around any point forecaster.

    ``x``/``y`` must be exact integers; ``calib`` is 0 (fit) / 1
    (calibration). The fit is the closed-form d=2 OLS over one exact
    BIGINT moment aggregation (the rdd_sharp tree); each calibration
    residual ``|y - (a + b x)|`` is micro-rounded ONCE to an integer, and
    the quantile is the exact k-th order statistic — value histogram +
    two-phase distributed prefix sum + ``k = min(n_cal,
    ceil(q*(n_cal+1)))`` — never a global sort, never a float comparison
    (the exact_quantiles machinery). Returns ONE row: ``(n_fit, n_cal,
    a_micro, b_micro, qhat_micro, cov_cal_micro)`` where ``cov_cal_micro``
    is the achieved calibration coverage (>= q by construction).
    Degenerate fits (n_fit < 2 or zero x-variance) emit 0 sentinels.
    """
    from .cumsum import distributed_cumsum

    rows = units.select(
        x.cast("long").alias("x"),
        y.cast("long").alias("y"),
        calib.cast("long").alias("cal"),
    ).localCheckpoint()
    m = rows.filter(F.col("cal") == 0).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    r0 = m.collect()[0]
    n_fit = r0["n"]
    ok = n_fit >= 2 and r0["n"] * r0["sxx"] - r0["sx"] * r0["sx"] != 0
    if not ok:
        return units.sparkSession.createDataFrame(
            [(int(n_fit), 0, 0, 0, 0, 0)],
            "n_fit long, n_cal long, a_micro long, b_micro long,"
            " qhat_micro long, cov_cal_micro long",
        )
    n_cal_eager = rows.filter(F.col("cal") == 1).count()
    if n_cal_eager == 0:
        # empty calibration split: the histogram/cumsum/qhat chain below
        # would collapse to ZERO rows — mirror the degenerate-fit branch
        # with a one-row sentinel instead (round-5 advice). a/b replay the
        # in-plan double tree exactly (same operand order, same casts).
        bb = (float(n_fit) * float(r0["sxy"]) - float(r0["sx"]) * float(r0["sy"])) / (
            float(n_fit) * float(r0["sxx"]) - float(r0["sx"]) * float(r0["sx"])
        )
        aa = (float(r0["sy"]) - bb * float(r0["sx"])) / float(n_fit)

        def _r(v):  # SQL ROUND = half away from zero (Python round is banker's)
            import math

            return int(math.copysign(math.floor(abs(v) + 0.5), v))

        return units.sparkSession.createDataFrame(
            [(int(n_fit), 0, _r(aa * 1e6), _r(bb * 1e6), 0, 0)],
            "n_fit long, n_cal long, a_micro long, b_micro long,"
            " qhat_micro long, cov_cal_micro long",
        )
    # a/b recomputed in-plan from the SAME integer moments (identical
    # double trees both engines; the one-row moment frame rides along as a
    # cross join, no literal embedding needed)
    b_expr = (
        "((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
        " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))"
    )
    a_expr = f"((CAST(sy AS DOUBLE) - {b_expr} * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE))"
    cal_res = (
        rows.filter(F.col("cal") == 1)
        .crossJoin(F.broadcast(m))
        .select(
            F.expr(
                f"CAST(ROUND(ABS(CAST(y AS DOUBLE) - ({a_expr} + {b_expr} * CAST(x AS DOUBLE)))"
                " * 1000000.0) AS BIGINT)"
            ).alias("r")
        )
    )
    h = cal_res.groupBy("r").agg(F.count(F.lit(1)).alias("c"))
    cum = distributed_cumsum(h, ["r"], "c", out_col="cum").select("r", "cum")
    nrow = cum.agg(F.max("cum").alias("n_cal"))
    k = F.expr(
        f"LEAST(n_cal, ((n_cal + 1) * {int(q_num)} + {int(q_den)} - 1) DIV {int(q_den)})"
    )
    qhat = (
        cum.crossJoin(F.broadcast(nrow.select("n_cal", k.alias("k"))))
        .filter(F.col("cum") >= F.col("k"))
        .groupBy("n_cal")
        .agg(F.min("r").alias("qhat"))
    )
    cov = (
        cum.crossJoin(F.broadcast(qhat))
        .filter(F.col("r") <= F.col("qhat"))
        .groupBy("n_cal", "qhat")
        .agg(F.max("cum").alias("n_cov"))
    )
    return cov.crossJoin(F.broadcast(m)).select(
        F.col("n").alias("n_fit"),
        F.col("n_cal"),
        F.expr(f"CAST(ROUND({a_expr} * 1000000.0) AS BIGINT)").alias("a_micro"),
        F.expr(f"CAST(ROUND({b_expr} * 1000000.0) AS BIGINT)").alias("b_micro"),
        F.col("qhat").alias("qhat_micro"),
        F.expr("n_cov * 1000000 DIV n_cal").alias("cov_cal_micro"),
    )
