"""Nonparametric rank tests — two-sample Kolmogorov-Smirnov, Kruskal-Wallis,
and the Pettitt changepoint test: the distribution-shift screens a data
pipeline runs between corpus snapshots / experiment arms / time windows.

All three reduce to EXACT INTEGER rank machinery with no global sort and no
single-partition window: per-distinct-value count LUTs are prefix-summed by
the two-phase :func:`distributed_cumsum
<pagerank_spark.operators.cumsum.distributed_cumsum>`, tie-averaged ranks are
kept DOUBLED (``r2 = 2*cum - cnt + 1``) so ties stay integral, and every
emitted statistic is either an exact BIGINT or derived from exact BIGINTs by
a fixed sequence of correctly-rounded IEEE ops (the repo-wide
hash-stability discipline; see operators/hyptest.py).

100-TB shape: the fact table is scanned once into a distinct-value LUT
(bounded by the value domain, not the row count); ranks join back via a
broadcast; the test statistics are one map-side-combined aggregation each.
KS additionally needs a max over the pooled distinct values — again
LUT-sized, never row-sized.

Public methodology: Kolmogorov 1933 / Smirnov 1939 (two-sample D),
Kruskal & Wallis 1952 (H with tie correction), Pettitt 1979 (rank-based
single changepoint, U_t = t(n+1) - sum_{tau<=t} r2_tau via the
Mann-Whitney identity).

Reference parity: none (single-query reference); analytics-breadth mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .cumsum import distributed_cumsum, distributed_lead

__all__ = ["ks_two_sample", "kruskal_wallis", "pettitt_test"]


def ks_two_sample(
    df: DataFrame,
    group_col: str,
    value_col: str,
    group_a: str,
    group_b: str,
) -> DataFrame:
    """One row ``(n_a, n_b, d_num, d_micro)`` — two-sample KS distance.

    ``D = max_v |F_a(v) - F_b(v)|`` over the pooled distinct values; with
    ``cumA/cumB`` the exact cumulative counts, ``d_num = max |n_b*cumA -
    n_a*cumB|`` is an exact BIGINT and ``D = d_num / (n_a*n_b)`` exactly;
    ``d_micro = (10^6 * d_num) div (n_a*n_b)`` (floor — both engines agree
    on non-negative operands). ``value_col`` must be integer-valued
    (pre-scale to cents/micros).

    Plan: one scan -> per-(value) conditional counts; ONE prefix-sum pass
    over the distinct-value LUT carries both groups' counts; the max is a
    LUT-sized aggregation. Bound: ``n_b * cumA < 2^63`` — fine to ~3e9 rows
    per side.
    """
    base = df.select(
        F.col(group_col).alias("__g"), F.col(value_col).cast("long").alias("__v")
    ).filter(F.col("__g").isin([group_a, group_b]))
    lut = base.groupBy("__v").agg(
        F.sum(F.when(F.col("__g") == group_a, 1).otherwise(0)).alias("__ca"),
        F.sum(F.when(F.col("__g") == group_b, 1).otherwise(0)).alias("__cb"),
    )
    cum = distributed_cumsum(lut, ["__v"], "__ca", out_col="__cuma")
    cum = distributed_cumsum(cum, ["__v"], "__cb", out_col="__cumb")
    tot = base.groupBy().agg(
        F.sum(F.when(F.col("__g") == group_a, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("__g") == group_b, 1).otherwise(0)).alias("n_b"),
    )
    gap = cum.crossJoin(F.broadcast(tot)).select(
        "n_a",
        "n_b",
        F.abs(F.col("n_b") * F.col("__cuma") - F.col("n_a") * F.col("__cumb")).alias(
            "__gap"
        ),
    )
    return gap.groupBy("n_a", "n_b").agg(F.max("__gap").alias("d_num")).select(
        "n_a",
        "n_b",
        "d_num",
        F.expr("CAST(d_num * 1000000 DIV (n_a * n_b) AS BIGINT)").alias("d_micro"),
    )


def kruskal_wallis(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """One row ``(n, k, tie_num, h_milli_sum, h_micro, hc_micro)`` —
    Kruskal-Wallis H across all groups, with the standard tie correction.

    Deviation form keeps magnitudes bounded: with doubled tie-averaged
    ranks, ``H = 3/(N(N+1)) * sum_g d_g^2 / n_g`` where ``d_g = R2_g -
    n_g*(N+1)`` is the exact BIGINT centered doubled-rank sum. Each group
    term ``d_g^2/n_g`` is rounded once to MILLI units (a BIGINT, so the
    cross-group sum is exact and reduction-order independent — the float
    trick from operators/hyptest.py::chi_square); rounding is
    ``floor(x + 0.5)`` — floor is exact IEEE on both engines, sidestepping
    the HALF_UP-vs-half-away ROUND divergence entirely (all quantities
    here are non-negative) — and the oracle replays the identical op
    sequence so any term bias is shared. Tie correction ``H_c = H *
    (N^3-N) / (N^3-N - tie_num)`` with ``tie_num = sum_t (t^3 - t)`` exact.

    Bounds (caller's contract): ``d_g^2 < 2^63`` => ``n_g * N < 3e9``, and
    ``1000 * d_g^2 / n_g < 2^63`` => per-group mean-rank deviations times N
    under ~9e15 — holds for N up to ~2e6 rows; quantize the value column
    and/or pre-aggregate beyond that.
    """
    base = df.select(
        F.col(group_col).alias("__g"), F.col(value_col).cast("long").alias("__v")
    )
    lut = base.groupBy("__v").agg(F.count(F.lit(1)).alias("__c"))
    lut = distributed_cumsum(lut, ["__v"], "__c", out_col="__cum").select(
        "__v", (2 * F.col("__cum") - F.col("__c") + 1).alias("__r2")
    )
    nrow = base.groupBy().agg(F.count(F.lit(1)).alias("__n"))
    grp = (
        base.join(F.broadcast(lut), "__v")
        .groupBy("__g")
        .agg(F.count(F.lit(1)).alias("__ng"), F.sum("__r2").alias("__rg2"))
    )
    term = grp.crossJoin(F.broadcast(nrow)).select(
        "__n",
        (F.col("__rg2") - F.col("__ng") * (F.col("__n") + 1)).alias("__d"),
        "__ng",
    )
    term = term.select(
        "__n",
        F.floor(
            F.col("__d").cast("double") * F.col("__d") / F.col("__ng") * F.lit(1000.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("__t_milli"),
    )
    ties = (
        base.groupBy("__v")
        .agg(F.count(F.lit(1)).alias("__t"))
        .groupBy()
        .agg(
            F.sum(F.col("__t") * F.col("__t") * F.col("__t") - F.col("__t")).alias(
                "tie_num"
            )
        )
    )
    k = grp.groupBy().agg(F.count(F.lit(1)).alias("k"))
    agg = (
        term.groupBy("__n")
        .agg(F.sum("__t_milli").alias("h_milli_sum"))
        .crossJoin(F.broadcast(ties))
        .crossJoin(F.broadcast(k))
    )
    h = F.expr(
        "3.0 * CAST(h_milli_sum AS DOUBLE) / 1000.0"
        " / (CAST(__n AS DOUBLE) * (CAST(__n AS DOUBLE) + 1.0))"
    )
    denom = F.expr(
        "CAST(__n AS DOUBLE) * __n * __n - __n"
    )
    return agg.select(
        F.col("__n").alias("n"),
        "k",
        "tie_num",
        "h_milli_sum",
        F.floor(h * F.lit(1_000_000) + F.lit(0.5)).cast("long").alias("h_micro"),
        # all-tied input: tie_num == n^3 - n and H == 0 — the correction is
        # undefined (0/0); emit 0 instead of dividing
        F.when(F.col("tie_num").cast("double") == denom, F.lit(0))
        .otherwise(
            F.floor(
                h * denom / (denom - F.col("tie_num").cast("double")) * F.lit(1_000_000)
                + F.lit(0.5)
            )
        )
        .cast("long")
        .alias("hc_micro"),
    )


def pettitt_test(df: DataFrame, time_col: str, value_col: str) -> DataFrame:
    """One row ``(n, k_stat, t_star)`` — Pettitt's rank-based single
    changepoint: ``K = max_t |U_t|`` with ``U_t = sum_{i<=t} sum_{j>t}
    sgn(x_j - x_i)``, located at the earliest maximizing time ``t_star``.

    The O(n^2) double sum collapses via the Mann-Whitney identity: with
    doubled tie-averaged ranks ``r2`` over the WHOLE series, ``U_t = t*(n+1)
    - sum_{tau<=t} r2_tau`` exactly (ties contribute sgn = 0 — the doubled
    averaged rank absorbs them). So the whole test is: rank LUT (distinct
    values) -> broadcast join back -> ONE time-ordered prefix sum of r2 ->
    argmax. Every quantity is an exact BIGINT; ``t_star`` tie-break is the
    smallest time index via ``min_by`` over the (-|U|, t) struct.

    Contract: one row per time point (pre-aggregate raw facts to a grid
    first); ``time_col`` must be a total order; ``value_col``
    integer-valued. Bound: ``t*(n+1) < 2^63`` — any realistic grid.
    """
    ser = df.select(
        F.col(time_col).alias("__t"), F.col(value_col).cast("long").alias("__x")
    )
    lut = ser.groupBy("__x").agg(F.count(F.lit(1)).alias("__c"))
    lut = distributed_cumsum(lut, ["__x"], "__c", out_col="__cum").select(
        "__x", (2 * F.col("__cum") - F.col("__c") + 1).alias("__r2")
    )
    ranked = ser.join(F.broadcast(lut), "__x")
    cum = distributed_cumsum(ranked, ["__t"], "__r2", out_col="__cumr2")
    nrow = ser.groupBy().agg(F.count(F.lit(1)).alias("__n"))
    # time index 1..n in time order = prefix count of ones
    idx = distributed_cumsum(
        cum.select("__t", "__cumr2", F.lit(1).alias("__one")),
        ["__t"],
        "__one",
        out_col="__i",
    )
    u = idx.crossJoin(F.broadcast(nrow)).select(
        "__n",
        "__t",
        (F.col("__i") * (F.col("__n") + 1) - F.col("__cumr2")).alias("__u"),
    )
    return (
        u.groupBy("__n")
        .agg(
            F.max(F.abs(F.col("__u"))).alias("k_stat"),
            F.expr("min_by(__t, struct(-abs(__u), __t))").alias("t_star"),
        )
        .select(F.col("__n").alias("n"), "k_stat", "t_star")
    )


def wasserstein1(
    df: DataFrame,
    group_col: str,
    value_col: str,
    a,
    b,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact 1-Wasserstein (earth-mover) distance between the ``a`` and
    ``b`` empirical distributions of integer ``value_col`` — the
    distribution-shift magnitude in value units, complementing
    :func:`ks_two_sample`'s sup-norm with the integrated L1 norm:

        W1 = integral over v of |F_a(v) - F_b(v)| dv
           = sum over the merged support of
             |cum_a(v) * n_b - cum_b(v) * n_a| * (next(v) - v) / (n_a n_b)

    Emitted as the exact BIGINT numerator ``w1_scaled`` (the sum above
    before dividing) plus ``n_a``/``n_b`` — integer end-to-end, so the
    gate hash is representation-stable; callers divide for the unit-free
    value.

    100-TB shape: one scan into a per-distinct-value count LUT, two
    :func:`~pagerank_spark.operators.cumsum.distributed_cumsum` passes and
    one :func:`~pagerank_spark.operators.cumsum.distributed_lead` over the
    LUT (bounded by the value domain, not rows), then one global sum.
    """
    f = df.filter(F.col(group_col).isin([a, b])).select(
        F.col(group_col).alias("__g"), F.col(value_col).cast("long").alias("__v")
    )
    per = f.groupBy("__v").agg(
        F.sum(F.when(F.col("__g") == a, 1).otherwise(0)).alias("__ca"),
        F.sum(F.when(F.col("__g") == b, 1).otherwise(0)).alias("__cb"),
    )
    c = distributed_cumsum(per, ["__v"], "__ca", "cum_a", num_partitions)
    c = distributed_cumsum(c, ["__v"], "__cb", "cum_b", num_partitions)
    c = distributed_lead(c, ["__v"], "__v", "__nxt", num_partitions)
    tot = f.groupBy().agg(
        F.sum(F.when(F.col("__g") == a, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("__g") == b, 1).otherwise(0)).alias("n_b"),
    )
    return (
        c.crossJoin(F.broadcast(tot))
        .select(
            (
                F.abs(F.col("cum_a") * F.col("n_b") - F.col("cum_b") * F.col("n_a"))
                * (F.coalesce(F.col("__nxt"), F.col("__v")) - F.col("__v"))
            ).alias("__t"),
            "n_a",
            "n_b",
        )
        .groupBy("n_a", "n_b")
        .agg(F.sum("__t").alias("w1_scaled"))
        .select("w1_scaled", "n_a", "n_b")
    )
