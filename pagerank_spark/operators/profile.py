"""Generic table profiler — per-column statistics in ONE pass over the data.

The data-quality primitive every pipeline runs first: row count, null
count, distinct count, and (for integer-typed columns) min/max, emitted as
one row per column. The engine analogue of ``ANALYZE TABLE``/dbt-style
profiling, kept hash-stable:

* All statistics are exact BIGINTs. Min/max are reported only for
  integer-family columns (``min_long``/``max_long``, NULL elsewhere) so no
  float/timestamp/string formatting ever reaches the output — the generic
  string-typed min/max variant is a display concern, not a gate concern.
* ONE aggregation pass: every per-column statistic is a column of the same
  ``groupBy()`` aggregate, so the table is scanned once. Exact
  ``count_distinct`` over d columns makes Catalyst plan d Expand branches
  (one shuffle each) — correct but d-fold at scale; the 100-TB swap is
  ``approx_count_distinct`` (HLL, one pass, no Expand), same contract as
  operators/sketches.py documents. ``exact=False`` selects it.
* The per-column rows are produced by unpivoting the single aggregate row
  with ``stack`` — driver traffic is one row regardless of table size.

Reference parity: none (single-query reference); data-quality mandate
breadth — the profiling sweep that precedes every corpus ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

__all__ = ["profile_table"]

_INT_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def profile_table(df: DataFrame, exact: bool = True) -> DataFrame:
    """``(column, dtype, n_rows, n_null, n_distinct, min_long, max_long)``
    — one row per input column, exact integers (min/max NULL for
    non-integer columns).

    ``exact=False`` swaps ``count_distinct`` for ``approx_count_distinct``
    (the one-pass HLL scale path).
    """
    distinct_fn = F.count_distinct if exact else F.approx_count_distinct
    aggs: list = [F.count(F.lit(1)).alias("__n")]
    stack_parts: list[str] = []
    for f in df.schema.fields:
        c = f.name
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}"))
        aggs.append(distinct_fn(F.col(c)).alias(f"__dist_{c}"))
        if isinstance(f.dataType, _INT_TYPES):
            aggs.append(F.min(F.col(c)).cast("long").alias(f"__min_{c}"))
            aggs.append(F.max(F.col(c)).cast("long").alias(f"__max_{c}"))
            mn, mx = f"`__min_{c}`", f"`__max_{c}`"
        else:
            mn, mx = "CAST(NULL AS BIGINT)", "CAST(NULL AS BIGINT)"
        stack_parts.append(
            f"'{c}', '{f.dataType.simpleString()}', `__null_{c}`, `__dist_{c}`, {mn}, {mx}"
        )
    one = df.groupBy().agg(*aggs)
    d = len(df.schema.fields)
    return one.select(
        F.expr(
            f"stack({d}, {', '.join(stack_parts)}) AS "
            "(column, dtype, n_null, n_distinct, min_long, max_long)"
        ),
        F.col("__n").alias("n_rows"),
    ).select("column", "dtype", "n_rows", "n_null", "n_distinct", "min_long", "max_long")


def gini_concentration(df: DataFrame, value_col: str, id_col: str) -> DataFrame:
    """Exact Gini coefficient of a non-negative integer value column —
    the standard concentration/skew report (revenue concentration, key-load
    imbalance before a shuffle, token-frequency inequality).

    Uses the rank form ``G = (2 * sum_i i*x_(i) - (n+1) * sum x) /
    (n * sum x)`` with ascending ranks ``i`` assigned by
    :func:`..operators.cumsum.distributed_cumsum` over the total order
    ``(value, id)`` — the two-phase prefix sum, NOT a single-partition
    global window, so ranking scales like any other shuffle. Every term is
    an exact BIGINT; the final ratio is one correctly-rounded double.

    Overflow contract (caller's): ``n * max(x)`` under ~9e18/n — quantize
    wide value columns down first (Gini is scale-invariant, the grid is
    the only approximation and the caller owns it).

    Returns one row ``(n, total, gini)``; ``gini`` NULL when the total is
    zero.
    """
    from .cumsum import distributed_cumsum

    base = df.select(
        F.col(id_col).alias("__id"), F.col(value_col).cast("long").alias("__x")
    ).withColumn("__one", F.lit(1).cast("long"))
    ranked = distributed_cumsum(base, ["__x", "__id"], "__one", out_col="__i")
    agg = ranked.groupBy().agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("__x").alias("total"),
        F.sum(F.col("__i") * F.col("__x")).alias("__si"),
    )
    return agg.select(
        "n",
        "total",
        F.expr(
            "CASE WHEN total > 0 THEN CAST(2 * __si - (n + 1) * total AS DOUBLE)"
            " / CAST(n * total AS DOUBLE) END"
        ).alias("gini"),
    )


def lorenz_curve(
    df: DataFrame, value_col: str, n_points: int = 10
) -> DataFrame:
    """Exact Lorenz curve of a non-negative integer value column — the
    concentration CURVE behind :func:`gini_concentration` (Lorenz 1905 —
    public methodology): at each population fraction ``i/n_points``, the
    share of total value held by the bottom ``k_i = ceil(i*n/n_points)``
    units. The "what % of revenue do the bottom 80% of customers carry"
    report.

    Scale shape (the exact_quantiles pattern): ONE map-side-combined value
    histogram carrying per-value counts AND value sums, the two-phase
    distributed prefix sum over it, then each probe interpolates inside
    its boundary value bucket with pure BIGINT arithmetic:
    ``cum_i = cumsum_below + (k_i - cumcnt_below) * v``. No sort, no
    value buffering, no float until the single share division per point.
    Returns ``(point, k, cum_value, share_micro)`` — n_points rows.
    """
    from .cumsum import distributed_cumsum

    if n_points < 1:
        raise ValueError("n_points must be >= 1")
    h = df.groupBy(F.col(value_col).cast("long").alias("v")).agg(
        F.count(F.lit(1)).alias("c"),
    )
    neg = h.filter(F.col("v") < 0).count()
    if neg:
        raise ValueError("lorenz_curve requires non-negative values")
    h2 = h.withColumn("s", F.col("v") * F.col("c"))
    cum = distributed_cumsum(h2, ["v"], "c", out_col="cumc")
    cum = distributed_cumsum(cum, ["v"], "s", out_col="cums").select(
        "v", "c", "s", "cumc", "cums"
    )
    tot = cum.agg(
        F.max("cumc").alias("n"), F.max("cums").alias("total")
    )
    probes = df.sparkSession.createDataFrame(
        [(i,) for i in range(1, int(n_points) + 1)], "point long"
    )
    targets = probes.crossJoin(F.broadcast(tot)).withColumn(
        "k", F.expr(f"(point * n + {int(n_points)} - 1) DIV {int(n_points)}")
    )
    picked = (
        cum.join(F.broadcast(targets), F.col("cumc") >= F.col("k"))
        .groupBy("point", "k", "n", "total")
        .agg(F.min(F.struct("v", "c", "cumc", "cums")).alias("b"))
    )
    return picked.select(
        "point",
        "k",
        F.expr("b.cums - (b.cumc - k) * b.v").alias("cum_value"),
        F.expr(
            "CASE WHEN total > 0 THEN (b.cums - (b.cumc - k) * b.v) * 1000000 DIV total"
            " ELSE CAST(0 AS BIGINT) END"
        ).alias("share_micro"),
    )
