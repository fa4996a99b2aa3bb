"""Event-sequence analytics: per-key state-transition (Markov) matrices.

A behavioral-modeling / feature-engineering primitive: given an event log
keyed by an entity, estimate the first-order transition probabilities
between event states along each entity's time-ordered sequence. One window
pass (lead over the per-key order) + one grouped count + one row-normalize
window — no UDFs, no iteration.

100-TB shape: both the lead window and the count shuffle on bounded keys
(entity id, then state pair); state vocabularies are tiny, so the
normalization window over ``src`` is a broadcast-sized relation. The order
is made TOTAL with an explicit tiebreak column — relying on timestamp order
alone makes the transition counts nondeterministic under equal timestamps
(retries/repartitioning would flip results).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def transition_matrix(
    events: DataFrame,
    key_col: str = "user_id",
    state_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """``(src, dst, n, prob)`` — transition counts and row-normalized
    probabilities over consecutive states per key, ordered by
    ``(ts, tiebreak)``."""
    w = Window.partitionBy(key_col).orderBy(F.col(ts_col), F.col(tiebreak_col))
    steps = events.select(
        F.col(state_col).alias("src"),
        F.lead(state_col).over(w).alias("dst"),
    ).filter(F.col("dst").isNotNull())
    counts = steps.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("n"))
    total = Window.partitionBy("src")
    return counts.select(
        "src", "dst", "n",
        F.round(F.col("n") / F.sum("n").over(total), 6).alias("prob"),
    )
