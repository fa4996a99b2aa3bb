"""Sorted-neighborhood blocking for entity resolution.

The classic SNM candidate generator (Hernandez & Stolfo, SIGMOD'95): sort
records by a blocking key and emit every pair within a sliding window of
``window`` positions. Complements the LSH blockers in :mod:`.dedup` — SNM
catches near-matches that share ORDER (names, timestamps, lengths) rather
than shared tokens/bands, and its candidate count is exactly
``(window-1) * n - window*(window-1)/2`` — linear in n, skew-proof by
construction (no hot buckets possible).

The distributed hazard is the global sort position: a naive
``row_number() OVER (ORDER BY key)`` is a single-partition window. This
implementation reuses the engine's two-phase ranking idiom
(:func:`~.cumsum.distributed_cumsum` over a ones column = exact global
1-based rank, range-partitioned, driver traffic = p rows), then turns the
sliding window into a 1-D grid join — the same bucketing trick as
:mod:`.spatial` one dimension down: bucket = rank div window; every
qualifying pair (rank gap < window) lies in the same or adjacent bucket, so
ONE equi-join on (bucket, bucket+{0,1}) with the exact gap filter is a
complete, duplicate-free candidate set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .cumsum import distributed_cumsum

__all__ = ["sorted_neighborhood_pairs"]


def sorted_neighborhood_pairs(
    records: DataFrame,
    key_cols: list[str],
    window: int,
    id_col: str = "id",
) -> DataFrame:
    """Return ``(a, b, gap)``: all record pairs within ``window - 1``
    positions of each other in the total order ``key_cols + [id_col]``
    (``id_col`` is the tiebreak, so the order — and the output — is total
    and deterministic). ``a`` is the lower-ranked record, ``gap`` its exact
    positive rank distance to ``b``.
    """
    if window < 2:
        raise ValueError(f"window must be >= 2, got {window}")
    ranked = distributed_cumsum(
        records.select(F.col(id_col).alias("rid"), *key_cols).withColumn(
            "__one", F.lit(1)
        ),
        order_cols=[*key_cols, "rid"],
        value_col="__one",
        out_col="rank",
    ).select(
        "rid", "rank",
        F.floor((F.col("rank") - 1) / window).cast("long").alias("__cell0"),
    )

    left = ranked.select(
        F.col("rid").alias("a"), F.col("rank").alias("__ra"),
        F.col("__cell0").alias("__cell"),
    )
    # right side probes its own cell and the previous one (1-D pigeonhole:
    # gap < window means same or adjacent bucket); gap > 0 keeps one
    # orientation, so no dedup pass
    right = ranked.select(
        F.col("rid").alias("b"), F.col("rank").alias("__rb"),
        F.explode(
            F.array(F.col("__cell0"), F.col("__cell0") - 1)
        ).alias("__cell"),
    )
    gap = F.col("__rb") - F.col("__ra")
    return (
        left.join(right, "__cell")
        .filter((gap > 0) & (gap < window))
        .select("a", "b", gap.cast("long").alias("gap"))
    )
