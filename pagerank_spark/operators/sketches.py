"""Mergeable frequency/membership sketches: count-min and Bloom filters.

The fixed-size-state primitives a 100-TB pipeline uses where exact
aggregation would shuffle the world: a count-min sketch answers "roughly how
often does key x occur" from ``depth x width`` BIGINT cells (overestimate
only, by at most N/width w.h.p.), and a Bloom filter answers "is x possibly
in the set" from ``m`` bits (false positives only, never false negatives —
the join-pruning primitive: probe the big side against a filter built from
the small side and skip rows that cannot match).

Both sketches here are DataFrames of cells/words, built with ONE map-side-
combined aggregate over the exploded (row, cell) stream — so they merge by
construction (cells of a union = sum/OR of cells), shrink to driver size
(``depth*width`` / ``m/32`` rows), and broadcast back for probing.

Determinism discipline (repo-wide): keys are hashed with the engine-neutral
polynomial char code (``trainprep._token_bucket_counts``'s hash) mixed per
row/probe with the two-round 31-bit mixer (``neighborhood._h31``'s
constants) — no xxhash64, so a DuckDB oracle replays every cell, every bit,
and every estimate verbatim (the round-2 lesson: engine-private hashes are
un-oracle-able).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KNUTH = 2654435761  # 2^32 / phi — repo-wide multiplicative constant
MIX = 2246822519  # xxhash PRIME32_2, independent odd multiplier
M31 = 1 << 31
_WORD = 32  # bloom word size: masks stay < 2^32, BIGINT-safe in any engine

__all__ = ["cms_build", "cms_estimate", "bloom_build", "bloom_probe"]


def _poly31(col):
    """Engine-neutral polynomial char hash of a string column -> [0, 2^31)."""
    return F.aggregate(
        F.transform(F.split(col, ""), lambda c: F.ascii(c).cast("long")),
        F.lit(0).cast("long"),
        lambda a, c: F.pmod(a * 31 + c, F.lit(M31)),
    )


def _mix31(col, salt: int):
    """Two-round multiplicative + xor-shift mixer (mod 2^31, int64-safe)."""
    h1 = F.pmod(col * F.lit(KNUTH) + F.lit(salt), F.lit(M31))
    h1 = h1.bitwiseXOR(F.shiftright(h1, 15))
    h2 = F.pmod(h1 * F.lit(MIX) + F.lit(1), F.lit(M31))
    return h2.bitwiseXOR(F.shiftright(h2, 13))


def _cms_cols(v, depth: int, width: int, salt: int):
    return F.array(*[F.pmod(_mix31(v, salt + i), F.lit(width)) for i in range(depth)])


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 3,
    width: int = 128,
    salt: int = 17,
    weight_col: str | None = None,
) -> DataFrame:
    """Count-min sketch of a string key stream: ``(row, col, cnt)`` cells.

    One zero-shuffle projection (hash the key ``depth`` times) + one
    map-side-combined aggregate on (row, col) — at most ``depth * width``
    output rows whatever the input size. ``weight_col`` sums weights
    instead of counting occurrences (weights must be non-negative for the
    overestimate guarantee to hold).
    """
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    cells = df.select(
        F.posexplode(_cms_cols(_poly31(F.col(key_col)), depth, width, salt)).alias(
            "row", "col"
        ),
        w.alias("__w"),
    )
    return cells.groupBy("row", "col").agg(F.sum("__w").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 3,
    width: int = 128,
    salt: int = 17,
) -> DataFrame:
    """``(key, est)``: the count-min estimate (min over the sketch's depth
    rows; a probed cell no key ever touched reads 0). The sketch is
    broadcast — probing any number of keys costs one map-side join.
    Parameters must match the ``cms_build`` call that made the sketch."""
    probes = keys.select(
        F.col(key_col),
        F.posexplode(_cms_cols(_poly31(F.col(key_col)), depth, width, salt)).alias(
            "row", "col"
        ),
    )
    return (
        probes.join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long"))).alias("est"))
    )


def _bloom_positions(v, m_bits: int, k_hashes: int, salt: int):
    return F.array(*[F.pmod(_mix31(v, salt + j), F.lit(m_bits)) for j in range(k_hashes)])


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int = 1024,
    k_hashes: int = 3,
    salt: int = 29,
) -> DataFrame:
    """Bloom filter over a string key column: ``(word_idx, bits)`` rows,
    32-bit words OR-aggregated map-side — ceil(m/32) rows total, mergeable
    by word-wise OR."""
    pos = df.select(
        F.explode(
            _bloom_positions(_poly31(F.col(key_col)), m_bits, k_hashes, salt)
        ).alias("p")
    )
    return (
        pos.select(
            (F.col("p") / _WORD).cast("long").alias("word_idx"),
            # shiftleft's bit count must be a literal in the Python API;
            # the SQL form takes a column
            F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(p % {_WORD} AS INT))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_probe(
    keys: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m_bits: int = 1024,
    k_hashes: int = 3,
    salt: int = 29,
) -> DataFrame:
    """``(key, maybe)``: 1 iff every one of the key's ``k_hashes`` bits is
    set (possible member — false positives happen at the designed rate; a 0
    is DEFINITE absence). The filter is broadcast; the probe is the
    join-pruning shape (semi-join the big side against the small side's
    filter without shuffling the big side)."""
    probes = keys.select(
        F.col(key_col),
        F.explode(
            _bloom_positions(_poly31(F.col(key_col)), m_bits, k_hashes, salt)
        ).alias("p"),
    ).select(
        key_col,
        (F.col("p") / _WORD).cast("long").alias("word_idx"),
        F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(p % {_WORD} AS INT))").alias("mask"),
    )
    hit = (
        F.col("bits").isNotNull()
        & (F.col("bits").bitwiseAND(F.col("mask")) == F.col("mask"))
    ).cast("long")
    return (
        probes.join(F.broadcast(bloom), "word_idx", "left")
        .groupBy(key_col)
        .agg(F.min(hit).alias("maybe"))
    )
