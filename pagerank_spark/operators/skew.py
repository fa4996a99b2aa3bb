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


def chunked_self_pairs(
    df: DataFrame,
    key_col: str | list[str],
    id_col: str,
    extra_cols: tuple[str, ...] = (),
    chunk_size: int = 256,
) -> DataFrame:
    """All ordered pairs ``(a, b)`` with ``a < b`` sharing ``key_col`` —
    enumerated through bounded join keys instead of a bare bucket self-join.

    The hazard this exists for: a bucket self-join's INPUT is small (the
    bucket table), so Catalyst broadcasts it and AQE coalesces the stream
    side to a handful of partitions — but the join's OUTPUT is
    sum-of-bucket-size-squared rows, so the enumeration runs nearly serial
    (measured: flat ~50s wall from local[8] to local[32] on a 130M-pair
    candidate load). Splitting every bucket into hash chunks of at most
    ``chunk_size`` entries makes the join key ``(key, chunk_i, chunk_j)``
    with at most ``chunk_size^2`` output rows per key, and the explicit
    repartition on that key distributes the enumeration. EXACT: each
    unordered pair meets at exactly one ordered chunk key (a's own chunk,
    b's own chunk), and the ``a < b`` filter keeps one orientation.

    Returns ``key_col, a_id, b_id`` plus ``a_<c>``/``b_<c>`` for each extra
    column. Replication cost: each entry is shuffled ``ceil(bucket/chunk)``
    times per side — always dominated by the pair output it parallelizes.

    Small-input bypass (round-5): buckets that already fit in one chunk
    (``__bc <= chunk_size`` — the common case on clean corpora, and ALL
    buckets on the small-SF benches) skip the chunk apparatus entirely and
    enumerate through a plain key-equi self-join: no chunk-index explode and
    no forced repartition, so Catalyst/AQE keep their broadcast + coalesced
    plan and the small-corpus cost returns to the bare-join level. Only
    oversized buckets pay the chunked path; the two outputs union. Exactness
    is unchanged — every bucket routes to exactly one path and each
    unordered pair still meets exactly once.

    Routing joins against the OVERSIZED bucket list only (anti-join for the
    small path, inner for the big path) — usually a handful of rows, so AQE
    broadcasts both and the common path never shuffles the input on the
    size lookup; joining the full per-bucket size table back onto every row
    (the round-4 shape) cost a full extra shuffle.
    """
    keys = [key_col] if isinstance(key_col, str) else list(key_col)
    hot = (
        df.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("__bc"))
        .filter(F.col("__bc") > chunk_size)
    )

    small = df.join(hot.select(*keys), keys, "left_anti")
    sa = small.select(
        *keys,
        F.col(id_col).alias("a_id"),
        *[F.col(c).alias(f"a_{c}") for c in extra_cols],
    )
    sb = small.select(
        *keys,
        F.col(id_col).alias("b_id"),
        *[F.col(c).alias(f"b_{c}") for c in extra_cols],
    )
    small_pairs = sa.join(sb, keys).filter(F.col("a_id") < F.col("b_id"))

    big = (
        df.join(hot, keys)
        .withColumn("__nc", F.ceil(F.col("__bc") / chunk_size).cast("int"))
        .withColumn(
            "__cown", F.pmod(F.xxhash64(F.col(id_col)), F.col("__nc")).cast("int")
        )
    )
    sp = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    a = (
        big.withColumn("__cj", F.explode(F.sequence(F.lit(0), F.col("__nc") - 1)))
        .select(
            *keys,
            F.col(id_col).alias("a_id"),
            *[F.col(c).alias(f"a_{c}") for c in extra_cols],
            F.col("__cown").alias("__ci"),
            "__cj",
        )
        .repartition(sp, *keys, "__ci", "__cj")
    )
    b = big.withColumn("__ci", F.explode(F.sequence(F.lit(0), F.col("__nc") - 1))).select(
        *keys,
        F.col(id_col).alias("b_id"),
        *[F.col(c).alias(f"b_{c}") for c in extra_cols],
        "__ci",
        F.col("__cown").alias("__cj"),
    )
    big_pairs = (
        a.join(b, [*keys, "__ci", "__cj"])
        .filter(F.col("a_id") < F.col("b_id"))
        .drop("__ci", "__cj")
    )
    return small_pairs.unionByName(big_pairs)
