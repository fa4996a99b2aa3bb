"""Skew handling: hub detection + salted two-phase aggregation.

At 10^12-turn scale a handful of hub vertices (viral conversations, shared
tool endpoints) can receive a huge fraction of in-edges. AQE's skew-join
splitting handles skewed *joins*, but a skewed ``groupBy(dst)`` still lands
every row for a hot key in one reducer. The classic fix (north_star
requirement) is salting: split each hot key into ``n_salts`` sub-keys,
aggregate partials, then re-aggregate the partials — two shuffles, but the
first one is balanced, which bounds per-task input regardless of skew.

``salted_sum`` applies salting ONLY to detected hubs (broadcast hub set), so
the non-skewed 99.99% of keys take the normal single-shuffle path cost-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def detect_hubs(edges: DataFrame, key: str = "dst", threshold: int | None = None, top_fraction: float = 1e-4) -> DataFrame:
    """Return ``(hub_id,)`` — keys whose frequency exceeds ``threshold``.

    Default threshold: max(1000, E * top_fraction) — at bench scales this
    flags the synthetic hubs and nothing else. One aggregate over edges; the
    result is tiny (by construction) and broadcastable.
    """
    counts = edges.groupBy(F.col(key).alias("hub_id")).agg(F.count(F.lit(1)).alias("c"))
    if threshold is None:
        e_total = edges.count()
        threshold = max(1000, int(e_total * top_fraction))
    return counts.filter(F.col("c") > threshold).select("hub_id")


def salted_sum(df: DataFrame, key: str, value_expr, hubs: DataFrame, n_salts: int = 32, out_col: str = "total") -> DataFrame:
    """``df.groupBy(key).agg(sum(value_expr))`` with hub keys salted.

    ``value_expr`` is a Column; ``hubs`` a ``(hub_id,)`` DataFrame (small —
    broadcast). Hot keys fan out over ``n_salts`` sub-keys in phase 1 (the
    salt comes from a hash of the full row id, so it is deterministic);
    phase 2 merges the at-most-``n_salts`` partials per hot key.
    """
    tagged = df.join(broadcast(hubs.withColumn("__is_hub", F.lit(True))), df[key] == hubs.hub_id, "left")
    salt = F.when(
        F.col("__is_hub").isNotNull(),
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salts)),
    ).otherwise(F.lit(0))
    phase1 = (
        tagged.withColumn("__salt", salt)
        .groupBy(F.col(key), F.col("__salt"))
        .agg(F.sum(value_expr).alias("__partial"))
    )
    return phase1.groupBy(key).agg(F.sum("__partial").alias(out_col))


def partition_histogram(df: DataFrame) -> list[int]:
    """Rows per physical partition — used by tests to assert salting bounds
    per-partition input sizes."""
    rows = (
        df.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    )
    return [r["c"] for r in rows]
