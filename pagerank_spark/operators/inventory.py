"""Inventory allocation: FIFO lot consumption as pure prefix-sum algebra.

The classic sequential formulation ("walk lots in order, consume until the
demand is exhausted") is a non-associative fold; the distributed form used
here is the interval identity

    consumed(lot) = clamp(demand - cum_before(lot), 0, qty(lot))

— each lot's consumption depends only on the demand and the prefix sum of
quantities before it, so ONE keyed cumulative sum (partition-local window
per key, no global order) replaces the walk. Exact BIGINT throughout.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def fifo_allocate(
    lots: DataFrame,
    demand: DataFrame,
    key_col: str = "key",
    lot_col: str = "lot_id",
    qty_col: str = "qty",
    demand_col: str = "demand",
) -> DataFrame:
    """Allocate each key's demand across its lots in ``lot_col`` order.

    ``lots``: (key, lot_id, qty) with integer qty >= 0 and (key, lot_id)
    unique. ``demand``: (key, demand) integer >= 0; keys missing a demand
    row consume nothing. Returns (key, lot_id, qty, consumed, remaining)
    for every lot. A demand exceeding the key's supply consumes every lot
    (the shortfall is visible as SUM(consumed) < demand).

    Scale shape: one shuffle to co-partition lots and demand on the key,
    one partition-local window for the running sum — no global sort, no
    iteration, demand keys broadcast when small.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(lot_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = lots.select(
        key_col,
        lot_col,
        F.col(qty_col).cast("long").alias("qty"),
    ).withColumn("__cum", F.sum("qty").over(w))
    d = demand.select(key_col, F.col(demand_col).cast("long").alias("__dem"))
    j = cum.join(d, key_col, "left").withColumn(
        "__dem", F.coalesce("__dem", F.lit(0))
    )
    consumed = F.greatest(
        F.lit(0), F.least(F.col("qty"), F.col("__dem") - (F.col("__cum") - F.col("qty")))
    )
    return j.select(
        key_col,
        lot_col,
        "qty",
        consumed.alias("consumed"),
        (F.col("qty") - consumed).alias("remaining"),
    )
