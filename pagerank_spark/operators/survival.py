"""Kaplan-Meier survival / Nelson-Aalen hazard estimation over durations.

The canonical time-to-event estimators (Kaplan & Meier 1958 JASA; Aalen
1978 Ann. Stat. — public methodology): given subjects with an observed
``duration`` and an ``event`` flag (1 = the terminal event happened,
0 = right-censored at that duration), at each distinct event time ``t_i``
let ``d_i`` = events at ``t_i`` and ``n_i`` = subjects still at risk
(duration >= t_i). Then

    S(t_i) = prod_{j <= i} (1 - d_j / n_j)        (Kaplan-Meier survival)
    H(t_i) = sum_{j <= i}  d_j / n_j              (Nelson-Aalen hazard)

Distributed shape (100-TB lens): the subject table is arbitrarily large,
but the CURVE is small — its row count is the number of distinct observed
durations, which is what a human plots. So the plan is two map-side-
combined aggregations (subjects -> per-duration ``(d, c)`` counts -> one
curve row set), then the at-risk counts and the sequential products/sums
are computed INSIDE a single collected array of curve points. Subjects are
never sorted globally and never leave the executors; driver traffic is one
array of curve points. The ``bucket_s`` knob coarsens durations (e.g.
86400 = daily curve) so the curve stays bounded on corpora where raw
durations are near-unique — choosing resolution is the caller's contract,
never a silent truncation.

Determinism/hash-stability (the repo-wide fold discipline, see
operators/smoothing.py): ``d_i``/``n_i`` are exact BIGINTs; the survival
product and hazard sum run as left-to-right ``aggregate`` folds over the
duration-ordered array, so both engines execute the IDENTICAL sequence of
correctly-rounded IEEE double ops (one divide, one subtract/add, one
multiply per step) — bit-equal results, micro-rounded ONCE on output.
Censored times contribute an exact ``* 1.0`` / ``+ 0.0`` (identity), so
folding over ALL curve points (not just event times) is still exact.

Reference parity: none (the reference is a single-query PageRank
accelerator); this is LLM-ops mandate breadth — retention/churn curves
over transcript/event tables are the standard product-analytics ask.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["subjects_from_events", "kaplan_meier", "logrank", "rmst"]

_SCALE = 1_000_000


def subjects_from_events(
    events: DataFrame,
    id_col: str = "user_id",
    ts_col: str = "ts",
    event_type_col: str = "event_type",
    terminal_type: str = "purchase",
) -> DataFrame:
    """``(id, duration_s, event)`` — one row per subject.

    ``duration_s`` = seconds between the subject's first and last event
    (exact BIGINT, per-row floor-to-second before the min/max so both
    engines agree); ``event`` = 1 iff any event has ``terminal_type``
    (observed), else 0 (right-censored at last sighting).
    """
    sec = F.unix_timestamp(F.col(ts_col)).cast("long")
    return events.select(
        F.col(id_col).alias("id"),
        sec.alias("s"),
        F.when(F.col(event_type_col) == terminal_type, F.lit(1))
        .otherwise(F.lit(0))
        .alias("e"),
    ).groupBy("id").agg(
        (F.max("s") - F.min("s")).alias("duration_s"),
        F.max("e").alias("event"),
    )


def kaplan_meier(
    subjects: DataFrame,
    duration_col: str = "duration_s",
    event_col: str = "event",
    bucket_s: int = 1,
    events_only: bool = True,
) -> DataFrame:
    """``(t, d, n_risk, surv_micro, hazard_micro)`` — the survival curve.

    ``t`` = bucketed duration (``floor(duration / bucket_s) * bucket_s``),
    ``d`` = events at ``t``, ``n_risk`` = subjects with duration >= ``t``
    (both exact BIGINT), ``surv_micro`` / ``hazard_micro`` = the KM product
    and NA sum up to and including ``t``, micro-rounded once. With
    ``events_only`` (default) censoring-only times are dropped from the
    output (they don't move either estimator) but still counted in
    ``n_risk`` via the curve array.
    """
    if bucket_s < 1:
        raise ValueError("bucket_s must be >= 1")
    t = (F.col(duration_col).cast("long") / bucket_s).cast("long") * bucket_s
    per_t = (
        subjects.select(t.alias("t"), F.col(event_col).cast("long").alias("e"))
        .groupBy("t")
        .agg(F.sum("e").alias("d"), F.count(F.lit(1)).alias("c"))
    )
    one = per_t.agg(
        F.sort_array(F.collect_list(F.struct("t", "d", "c"))).alias("arr"),
        F.sum("c").alias("total"),
    )
    # At-risk per curve point: total minus subjects that already left
    # (strictly earlier duration) — an exact BIGINT prefix sum over the
    # ordered curve array, O(T^2) on T curve points (T is plot-sized).
    with_n = F.expr(
        "transform(arr, (x, i) -> struct("
        "  x.t AS t, x.d AS d,"
        "  total - aggregate(slice(arr, 1, i), CAST(0 AS BIGINT),"
        "                    (a, y) -> a + y.c) AS n))"
    )
    surv = F.expr(
        "aggregate(slice(a2, 1, i + 1), CAST(1.0 AS DOUBLE),"
        " (a, y) -> a * (CAST(1.0 AS DOUBLE)"
        "               - CAST(y.d AS DOUBLE) / CAST(y.n AS DOUBLE)))"
    )
    hazard = F.expr(
        "aggregate(slice(a2, 1, i + 1), CAST(0.0 AS DOUBLE),"
        " (a, y) -> a + CAST(y.d AS DOUBLE) / CAST(y.n AS DOUBLE))"
    )
    curve = one.select(
        F.posexplode(with_n).alias("i", "p"), with_n.alias("a2")
    ).select(
        F.col("p.t").alias("t"),
        F.col("p.d").alias("d"),
        F.col("p.n").alias("n_risk"),
        F.round(surv * _SCALE).cast("long").alias("surv_micro"),
        F.round(hazard * _SCALE).cast("long").alias("hazard_micro"),
    )
    if events_only:
        curve = curve.filter(F.col("d") > 0)
    return curve


def logrank(
    subjects: DataFrame,
    duration_col: str = "duration_s",
    event_col: str = "event",
    group_col: str = "g",
) -> DataFrame:
    """Two-sample log-rank test (Mantel 1966, public methodology): does
    group 1's time-to-event distribution differ from group 0's? At each
    distinct pooled event time ``t_i`` with ``d_i`` events, ``n_i`` at
    risk and ``n1_i``/``d1_i`` the group-1 shares, the statistic is

        chi2 = (O1 - E1)^2 / V,   O1 = sum d1_i,
        E1 = sum d_i * n1_i / n_i,
        V  = sum d_i (n1_i/n_i) ((n_i-n1_i)/n_i) ((n_i-d_i)/(n_i-1))

    — the standard A/B survival comparison (retention experiments, churn
    cohorts). ``group_col`` must be 0/1.

    Same distributed shape as :func:`kaplan_meier`: subjects collapse to
    the plot-sized per-time curve in one map-side-combined aggregation;
    at-risk counts are exact BIGINT prefix sums inside the ordered curve
    array; subjects never sort globally. Hash-stability follows the
    hyptest.py discipline: every per-time E/V term is an exact-BIGINT
    rational evaluated in an identical double expression tree and
    nano-rounded BEFORE the (order-free, integer) sums; chi2 is then one
    fixed expression over those integers. Returns ONE row:
    ``(n1, n2, o1, o2, e1_nano, v_nano, chi2_micro)``.
    """
    t = F.col(duration_col).cast("long")
    per_t = (
        subjects.select(
            t.alias("t"),
            F.col(event_col).cast("long").alias("e"),
            F.col(group_col).cast("long").alias("g"),
        )
        .groupBy("t")
        .agg(
            F.sum("e").alias("d"),
            F.count(F.lit(1)).alias("c"),
            F.sum(F.col("e") * F.col("g")).alias("d1"),
            F.sum("g").alias("c1"),
        )
    )
    one = per_t.agg(
        F.sort_array(F.collect_list(F.struct("t", "d", "c", "d1", "c1"))).alias("arr"),
        F.sum("c").alias("total"),
        F.sum("c1").alias("total1"),
    )
    # at-risk = total minus subjects gone strictly earlier (transform's i is
    # 0-based, so slice(arr, 1, i) is exactly the earlier points)
    with_n = F.expr(
        "transform(arr, (x, i) -> struct("
        "  x.t AS t, x.d AS d, x.d1 AS d1,"
        "  total - aggregate(slice(arr, 1, i), CAST(0 AS BIGINT),"
        "                    (a, y) -> a + y.c) AS n,"
        "  total1 - aggregate(slice(arr, 1, i), CAST(0 AS BIGINT),"
        "                     (a, y) -> a + y.c1) AS n1))"
    )
    pts = one.select(F.explode(with_n).alias("p"), "total", "total1")
    e1 = "(CAST(p.d AS DOUBLE) * CAST(p.n1 AS DOUBLE)) / CAST(p.n AS DOUBLE)"
    vt = (
        "(((CAST(p.d AS DOUBLE) * (CAST(p.n1 AS DOUBLE) / CAST(p.n AS DOUBLE)))"
        " * ((CAST(p.n AS DOUBLE) - CAST(p.n1 AS DOUBLE)) / CAST(p.n AS DOUBLE)))"
        " * ((CAST(p.n AS DOUBLE) - CAST(p.d AS DOUBLE)) / (CAST(p.n AS DOUBLE) - 1.0)))"
    )
    terms = pts.select(
        "total",
        "total1",
        F.col("p.d").alias("d"),
        F.col("p.d1").alias("d1"),
        F.expr(f"CAST(ROUND({e1} * 1000000000.0) AS BIGINT)").alias("e1n"),
        F.expr(
            f"CASE WHEN p.n > 1 THEN CAST(ROUND({vt} * 1000000000.0) AS BIGINT)"
            " ELSE CAST(0 AS BIGINT) END"
        ).alias("vn"),
    )
    agg = terms.groupBy("total", "total1").agg(
        F.sum("d").alias("dt"),
        F.sum("d1").alias("o1"),
        F.sum("e1n").alias("e1_nano"),
        F.sum("vn").alias("v_nano"),
    )
    chi2 = (
        "CASE WHEN v_nano > 0 THEN CAST(ROUND("
        "((CAST(o1 * 1000000000 - e1_nano AS DOUBLE) / 1000000000.0)"
        " * (CAST(o1 * 1000000000 - e1_nano AS DOUBLE) / 1000000000.0))"
        " / (CAST(v_nano AS DOUBLE) / 1000000000.0) * 1000000.0) AS BIGINT)"
        " ELSE CAST(0 AS BIGINT) END"
    )
    return agg.select(
        F.col("total1").alias("n1"),
        (F.col("total") - F.col("total1")).alias("n2"),
        F.col("o1"),
        (F.col("dt") - F.col("o1")).alias("o2"),
        "e1_nano",
        "v_nano",
        F.expr(chi2).alias("chi2_micro"),
    )


def rmst(
    subjects: DataFrame,
    tau: int,
    duration_col: str = "duration_s",
    event_col: str = "event",
    bucket_s: int = 1,
) -> DataFrame:
    """Restricted mean survival time up to ``tau`` (Royston & Parmar 2013
    — public methodology): the area under the Kaplan-Meier curve on
    [0, tau] — "expected survival seconds within the horizon", the
    recommended effect measure when hazards aren't proportional.

    Pure exact-integer composition over :func:`kaplan_meier`'s gated
    outputs: S is a step function, so ``RMST = min(t_1, tau) * 1 +
    sum_i S(t_i) * max(0, min(t_{i+1}, tau) - t_i)`` with ``t_{n+1} =
    tau`` — every term a product of the already-micro-rounded
    ``surv_micro`` and an integer width (no new float enters). The curve
    is plot-sized; the interval sum is one fold over its collected array.
    Returns ONE row: ``(tau, n_points, rmst_micro)`` (micro-seconds of
    restricted mean survival).
    """
    if tau <= 0:
        raise ValueError("tau must be positive")
    curve = kaplan_meier(
        subjects, duration_col, event_col, bucket_s=bucket_s, events_only=True
    ).select("t", "surv_micro")
    one = curve.agg(
        F.sort_array(F.collect_list(F.struct("t", "surv_micro"))).alias("arr"),
        F.count(F.lit(1)).alias("n_points"),
    )
    tl = int(tau)
    body = (
        # initial unit-survival segment [0, min(t_1, tau)); empty curves
        # survive the whole horizon
        f"CASE WHEN size(arr) = 0 THEN CAST({tl} AS BIGINT) * 1000000 ELSE "
        f"LEAST(arr[0].t, CAST({tl} AS BIGINT)) * 1000000 "
        f"+ aggregate(transform(arr, (x, i) -> x.surv_micro * "
        f"GREATEST(CAST(0 AS BIGINT), LEAST(IF(i + 1 < size(arr), arr[i + 1].t,"
        f" CAST({tl} AS BIGINT)), CAST({tl} AS BIGINT)) - LEAST(x.t, CAST({tl} AS BIGINT)))),"
        f" CAST(0 AS BIGINT), (a, v) -> a + v) END"
    )
    return one.select(
        F.lit(tl).cast("long").alias("tau"),
        F.col("n_points").cast("long").alias("n_points"),
        F.expr(body).alias("rmst_micro"),
    )
