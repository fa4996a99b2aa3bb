"""Cohort retention and funnel conversion — the two canonical product /
event analytics shapes, as pure Catalyst plans with exact-integer outputs.

* :func:`cohort_retention` — bucket every entity by the period of its FIRST
  event (the cohort), then count distinct active entities per (cohort,
  period-offset) cell. The classic retention triangle. Two aggregations:
  per-entity first period (map-side combined min), then the cell counts
  over the (entity, period) de-dup — both shuffle on the entity/cohort
  keys, no windows, no driver loops. Retention is emitted as an exact
  integer ratio in micro-units (``n_active * 10^6 div n_cohort``).
* :func:`funnel_steps` — strict-order funnel conversion: how many entities
  performed step 1, then step 2 AFTER their first step-1 event, then step
  3 after that, ... First-occurrence semantics with a total order on
  ``(ts, tiebreak)`` so equal timestamps resolve deterministically. k
  steps = k small join+min aggregations over the (pre-filtered) step
  events — each pass shrinks, the event table is scanned once per step
  with the filter pushed to the scan. Counts and step-to-step conversion
  ratios are exact BIGINTs.

Scale notes (100-TB lens): both operators aggregate to tiny outputs
(cohort x offset cells; k funnel rows), so the only shuffles are the
entity-keyed distinct/agg passes — the unavoidable minimum. No
``collect()`` of row data; the funnel's per-step state is a DataFrame
joined by entity (localCheckpoint'd per step so each pass runs once) and
driver traffic is k scalar counts.

Reference parity: none (single-query reference) — event-analytics mandate
breadth over the events/transcripts tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["cohort_retention", "funnel_steps"]

_SCALE = 1_000_000


def cohort_retention(
    events: DataFrame,
    entity_col: str = "user_id",
    ts_col: str = "ts",
    period_seconds: int = 604_800,
) -> DataFrame:
    """``(cohort_period, period_offset, n_active, n_cohort, retention_micro)``.

    ``cohort_period`` is the epoch-period index of the entity's first
    event; every cell counts the cohort's entities active at
    ``cohort_period + period_offset``. Offset 0 is the cohort size itself
    (retention_micro == 10^6) — kept so the triangle is self-describing.
    """
    ep = (
        F.floor(F.unix_timestamp(F.col(ts_col)) / F.lit(period_seconds))
        .cast("long")
        .alias("period")
    )
    act = (
        events.select(F.col(entity_col).alias("ent"), ep)
        .groupBy("ent", "period")
        .agg(F.lit(1).alias("_one"))
        .drop("_one")
    )
    first = act.groupBy("ent").agg(F.min("period").alias("cohort_period"))
    cells = (
        act.join(first, "ent")
        .groupBy("cohort_period", (F.col("period") - F.col("cohort_period")).alias("period_offset"))
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    sizes = first.groupBy("cohort_period").agg(F.count(F.lit(1)).alias("n_cohort"))
    return (
        cells.join(sizes, "cohort_period")
        .select(
            "cohort_period",
            "period_offset",
            "n_active",
            "n_cohort",
            F.expr(f"n_active * {_SCALE} DIV n_cohort").alias("retention_micro"),
        )
    )


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    entity_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """``(step_idx, step, n_entities, conv_from_first_micro,
    conv_from_prev_micro)`` — one row per funnel step.

    Step i counts entities whose first step-i event is strictly after (in
    ``(ts, tiebreak)`` order) their counted step-(i-1) event. Conversion
    ratios are exact integer micro-units; the step-1 row reads 10^6 / 10^6.
    """
    if not steps:
        raise ValueError("funnel_steps: need at least one step")
    sec = F.unix_timestamp(F.col(ts_col)).cast("long")
    ev = events.select(
        F.col(entity_col).alias("ent"),
        F.col(type_col).alias("typ"),
        F.struct(sec.alias("s"), F.col(tiebreak_col).cast("long").alias("tb")).alias("o"),
    ).filter(F.col("typ").isin(list(steps)))

    reached = (
        ev.filter(F.col("typ") == steps[0])
        .groupBy("ent")
        .agg(F.min("o").alias("o"))
        .localCheckpoint()
    )
    counts = [reached.count()]
    for step in steps[1:]:
        nxt = (
            ev.filter(F.col("typ") == step)
            .join(reached.withColumnRenamed("o", "prev"), "ent")
            .filter(
                (F.col("o.s") > F.col("prev.s"))
                | ((F.col("o.s") == F.col("prev.s")) & (F.col("o.tb") > F.col("prev.tb")))
            )
            .groupBy("ent")
            .agg(F.min("o").alias("o"))
        )
        reached = nxt.localCheckpoint()
        counts.append(reached.count())

    spark = events.sparkSession
    rows = []
    for i, (step, n) in enumerate(zip(steps, counts)):
        prev_n = counts[i - 1] if i else counts[0]
        rows.append(
            (
                i + 1,
                step,
                n,
                n * _SCALE // counts[0] if counts[0] else 0,
                n * _SCALE // prev_n if prev_n else 0,
            )
        )
    return spark.createDataFrame(
        rows,
        "step_idx int, step string, n_entities long, "
        "conv_from_first_micro long, conv_from_prev_micro long",
    )
