"""Robust per-group outlier detection via median / MAD (Hampel filter).

The standard robust alternative to z-scores (Hampel 1974; Leys et al. 2013
— public methodology): a row is an outlier in its group when
``|x - median| > k * MAD`` with ``MAD = median(|x - median|)``. Unlike
mean/stddev, both statistics have a 50% breakdown point, so the outliers
themselves can't mask the threshold — the estimator of choice for
data-quality sweeps over corpus/metric columns.

Exact-integer formulation (the repo's hash-stable discipline): for an
INTEGER value column, the group median is ``x`` or ``x + 0.5``, so
``med2 = 2 * median`` is an exact BIGINT; per-row doubled deviation
``dev2 = |2x - med2|`` is a BIGINT; ``mad4 = 2 * median(dev2) = 4 * MAD``
is a BIGINT; and the Hampel test ``|x - med| > k * MAD`` becomes the pure
integer comparison ``2 * dev2 > k * mad4``. No float ever reaches the
output.

Plan shape: two group aggregations (the two medians) + one join back —
the value table is scanned twice, grouped on the same key both times (one
shuffle partitioning reused). Exact ``percentile`` is the gated mode; at
100 TB swap ``percentile_approx`` (t-digest) exactly as
operators/packing.py::quantile_bins documents for its approx mode —
thresholding tolerates approximate medians.

Degenerate groups (over half the values identical ⇒ MAD = 0) flag every
deviating row — the textbook Hampel behavior, kept as-is.

Reference parity: none (single-query reference); data-quality mandate
breadth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["mad_outliers"]


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    k: int = 3,
) -> DataFrame:
    """``(id_col, group_col, value, dev2, med2, mad4)`` — flagged rows only.

    ``value_col`` must be integer-valued (cast upstream — cents/micro
    units); ``k`` is the integer Hampel multiplier (3 ≈ 2σ for normal
    data). ``dev2 = |2*value - med2|``; a row is returned iff
    ``2 * dev2 > k * mad4``.
    """
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("g"),
        F.col(value_col).cast("long").alias("v"),
    )
    med = base.groupBy("g").agg(
        (F.expr("percentile(v, 0.5D)") * 2).cast("long").alias("med2")
    )
    dev = base.join(med, "g").withColumn(
        "dev2", F.abs(F.lit(2) * F.col("v") - F.col("med2"))
    )
    mad = dev.groupBy("g").agg(
        (F.expr("percentile(dev2, 0.5D)") * 2).cast("long").alias("mad4")
    )
    return (
        dev.join(mad, "g")
        .filter(F.lit(2) * F.col("dev2") > F.lit(int(k)) * F.col("mad4"))
        .select(
            F.col("id").alias(id_col),
            F.col("g").alias(group_col),
            F.col("v").alias(value_col),
            "dev2",
            "med2",
            "mad4",
        )
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    lo: tuple[int, int] = (1, 100),
    hi: tuple[int, int] = (99, 100),
) -> DataFrame:
    """Percentile winsorization audit — clamp an integer column at exact
    type-1 quantile cutpoints (the robust-preprocessing standard before
    moment-based stats; Tukey's taxonomy, public methodology).

    Cutpoints come from :func:`..operators.packing.exact_quantiles`
    (histogram + distributed prefix sum — no sort, no window, no value
    buffering) as exact rationals; the clamp pass is one broadcast of the
    2-row cutpoint table onto the scan. Emits the one-row audit summary
    (not the clamped rows — compose ``clamp_expr`` for that):
    ``(n, lo_cut, hi_cut, n_clamped_lo, n_clamped_hi, sum_before,
    sum_after)`` — all exact BIGINTs.
    """
    from .packing import exact_quantiles

    q = exact_quantiles(df, value_col, [lo, hi])
    cuts = q.groupBy().agg(
        F.min(F.when((F.col("q_num") * lo[1]) == (F.lit(lo[0]) * F.col("q_den")), F.col("value"))).alias("__lo"),
        F.min(F.when((F.col("q_num") * hi[1]) == (F.lit(hi[0]) * F.col("q_den")), F.col("value"))).alias("__hi"),
    )
    v = F.col(value_col).cast("long")
    return (
        df.select(v.alias("__v"))
        .crossJoin(F.broadcast(cuts))
        .groupBy()
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("__lo").alias("lo_cut"),
            F.max("__hi").alias("hi_cut"),
            F.sum(F.when(F.col("__v") < F.col("__lo"), 1).otherwise(0)).alias("n_clamped_lo"),
            F.sum(F.when(F.col("__v") > F.col("__hi"), 1).otherwise(0)).alias("n_clamped_hi"),
            F.sum("__v").alias("sum_before"),
            F.sum(F.greatest(F.least(F.col("__v"), F.col("__hi")), F.col("__lo"))).alias("sum_after"),
        )
    )


def lof_scores(
    emb: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1024,
) -> DataFrame:
    """Local Outlier Factor (Breunig et al. 2000, SIGMOD — public
    methodology) over an embedding column: density-relative outlier scores
    where LOF >> 1 marks points whose local density is far below their
    neighbors'.

    Exactness discipline: vectors snap to the integer grid (one fp op per
    component), squared distances are exact BIGINT lambda folds, and every
    float that follows is a fixed correctly-rounded sequence — sqrt for
    distances, one division per lrd, and neighbor sums folded in ascending
    neighbor-id order (sort_array before aggregate), so both engines walk
    identical IEEE ops. Deviation from the paper: the k-neighborhood is
    exactly k points (distance-then-id tiebreak), not the tie-inclusive
    set — deterministic and replayable where the original is not.

    Scale shape: the all-pairs join is the brute-force baseline (right up
    to ~10^5 vectors per blocking key); at corpus scale the LSH/IVF bucket
    generators in operators/similarity.py feed candidate pairs and this
    scoring applies within buckets. Duplicate-heavy data (k identical
    points) yields a zero reach-sum — those ids are emitted with NULL lof
    rather than an engine-divergent infinity.

    Returns ``(id_col, kdist, lrd, lof)`` — kdist/lrd/lof rounded to 6dp.
    """
    from pyspark.sql import Window

    from .clustering import quantize_vectors

    q = quantize_vectors(emb, scale, vec_col, "__qv")
    a = q.select(F.col(id_col).alias("__a"), F.col("__qv").alias("__qa"))
    b = q.select(F.col(id_col).alias("__b"), F.col("__qv").alias("__qb"))
    d2 = F.expr("aggregate(zip_with(__qa, __qb, (x, y) -> (x - y) * (x - y)), 0L, (s, v) -> s + v)")
    pairs = a.join(b, F.col("__a") != F.col("__b")).select("__a", "__b", d2.alias("__d2"))
    w = Window.partitionBy("__a").orderBy(F.col("__d2").asc(), F.col("__b").asc())
    knn = (
        pairs.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= int(k))
        .select("__a", "__b", F.sqrt(F.col("__d2").cast("double")).alias("__d"), "__rk")
    )
    kd = knn.where(F.col("__rk") == k).select(
        F.col("__a").alias("__o"), F.col("__d").alias("__kdist")
    )
    reach = knn.join(kd, knn["__b"] == kd["__o"]).select(
        "__a", "__b", F.greatest("__kdist", "__d").alias("__reach")
    )

    def _ordered_sum(val_col: str):
        return F.aggregate(
            F.sort_array(F.collect_list(F.struct("__b", val_col))),
            F.lit(0.0),
            lambda acc, s: acc + s[val_col],
        )

    lrd = (
        reach.groupBy("__a")
        .agg(_ordered_sum("__reach").alias("__rsum"))
        .select(
            "__a",
            F.when(F.col("__rsum") > 0, F.lit(float(k)) / F.col("__rsum")).alias("__lrd"),
        )
    )
    nbr = knn.join(
        lrd.select(F.col("__a").alias("__b"), F.col("__lrd").alias("__lrd_o")), "__b"
    )
    lsum = nbr.groupBy("__a").agg(_ordered_sum("__lrd_o").alias("__lsum"))
    return (
        lsum.join(lrd, "__a")
        .join(kd.select(F.col("__o").alias("__a"), "__kdist"), "__a")
        .select(
            F.col("__a").alias(id_col),
            F.round("__kdist", 6).alias("kdist"),
            F.round("__lrd", 6).alias("lrd"),
            F.round(F.col("__lsum") / (F.lit(float(k)) * F.col("__lrd")), 6).alias("lof"),
        )
    )
