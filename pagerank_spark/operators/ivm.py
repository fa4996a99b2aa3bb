"""Incremental view maintenance for grouped aggregates via mergeable cells.

A 100-TB pipeline never recomputes a day-one-to-now GROUP BY when a new
batch lands; it keeps the view as MERGEABLE PARTIAL AGGREGATES and folds
each delta in — the relational instance of the same algebra the engine's
sketches already use (count-min cells, HLL registers, Bloom bitmaps:
commutative, associative, idempotent-on-merge-order). For the classic
aggregate set this means storing cells, not finals:

    count  -> sum of counts            sum  -> sum of sums
    min    -> min of mins              max  -> max of maxes
    avg    -> reconstructed sum/count at READ time (never stored)

``aggregate_cells`` builds the cell table from raw rows;
``merge_aggregates`` folds any number of cell tables (state + delta, or a
whole day-partition fan-in) with ONE union + ONE map-side-combined
aggregate on the group key — the merged output IS a valid state for the
next merge (closure under merge is the contract, pytest-gated as
full-recompute equality under arbitrary splits).

Scale notes: the merge shuffles only |groups| + |delta groups| cell rows,
never raw facts; integer value columns keep cells exact (sums of cents,
not doubles — reduction order can't drift). Deletions/retractions need
signed counts (insert +1 / delete -1) — supported for count/sum by feeding
negative-count cells; min/max are NOT retractable cells (a dropped min
needs a rescan), which is the standard IVM boundary and is documented
rather than papered over.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["aggregate_cells", "merge_aggregates"]

_CELLS = ("n", "sum_v", "min_v", "max_v")


def aggregate_cells(
    rows: DataFrame, keys: list[str], value_col: str
) -> DataFrame:
    """Fold raw rows into one cell row per group:
    ``(keys..., n, sum_v, min_v, max_v)``. ``value_col`` should be integer
    at scale (exact merge); doubles work but inherit reduction-order noise.
    """
    return rows.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(value_col).alias("sum_v"),
        F.min(value_col).alias("min_v"),
        F.max(value_col).alias("max_v"),
    )


def merge_aggregates(*cell_tables: DataFrame, keys: list[str]) -> DataFrame:
    """Merge cell tables (state + deltas) into one: groups present in any
    input appear once with cells combined. Output schema == input schema,
    so merges chain/associate freely.
    """
    if not cell_tables:
        raise ValueError("at least one cell table is required")
    for t in cell_tables:
        missing = [c for c in (*keys, *_CELLS) if c not in t.columns]
        if missing:
            raise ValueError(f"cell table missing columns {missing}")
    u = cell_tables[0]
    for t in cell_tables[1:]:
        u = u.unionByName(t)
    return u.groupBy(*keys).agg(
        F.sum("n").alias("n"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )
