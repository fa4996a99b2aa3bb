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

__all__ = ["subjects_from_events", "kaplan_meier"]

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
