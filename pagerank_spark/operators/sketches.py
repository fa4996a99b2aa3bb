"""Mergeable frequency/membership/cardinality sketches: count-min, Bloom
filters, and HyperLogLog distinct counting.

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

__all__ = [
    "cms_build",
    "cms_estimate",
    "bloom_build",
    "bloom_probe",
    "hll_build",
    "hll_merge",
    "hll_estimate",
    "ams_f2",
]


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


def _hll_cells(v, p: int, salt: int):
    """(reg, rho) from one hashed key: the low ``p`` mixer bits pick the
    register; rho is the MSB-side position of the first set bit in the
    remaining (31-p)-bit word, 1-based, with the all-zeros word mapping to
    (31-p)+1 — the standard HLL rank, computed without floats via the
    binary-string bit length (``bin``/DuckDB ``bin`` agree, so a DuckDB
    oracle replays every register verbatim)."""
    h = _mix31(v, salt)
    reg = F.pmod(h, F.lit(1 << p))
    w = F.shiftright(h, p)  # in [0, 2^(31-p))
    bitlen = F.when(w == 0, F.lit(0)).otherwise(F.length(F.bin(w)))
    rho = (F.lit(31 - p + 1) - bitlen).cast("int")
    return reg.cast("int").alias("reg"), rho.alias("rho")


def hll_build(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    p: int = 8,
    salt: int = 37,
) -> DataFrame:
    """HyperLogLog registers per group: ``(group..., reg, rho)`` with rho
    max-aggregated — at most ``2^p`` rows per group whatever the input
    cardinality. Registers no key ever touched are ABSENT (implicit rho=0),
    which keeps the cell stream sparse and makes union-merge = groupBy max
    (:func:`hll_merge`). One zero-shuffle projection + one map-side-combined
    max agg: the distinct-count analogue of :func:`cms_build`, and the
    100-TB shape for "distinct users per segment" — state is 2^p cells per
    group, never a distinct shuffle of the raw keys."""
    reg, rho = _hll_cells(_poly31(F.col(key_col)), p, salt)
    gc = list(group_cols or [])
    cells = df.select(*gc, reg, rho)
    return cells.groupBy(*gc, "reg").agg(F.max("rho").alias("rho"))


def hll_merge(
    a: DataFrame, b: DataFrame, group_cols: list[str] | None = None
) -> DataFrame:
    """Union two register sets built with the same (p, salt): register-wise
    max — the sketch of the concatenated streams, exactly."""
    gc = list(group_cols or [])
    return (
        a.unionByName(b)
        .groupBy(*gc, "reg")
        .agg(F.max("rho").alias("rho"))
    )


def hll_estimate(
    cells: DataFrame,
    p: int = 8,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """``(group..., zeros, denom_scaled, est)`` per group.

    ``zeros`` (untouched registers) and ``denom_scaled`` = Σ_j 2^(32-rho_j)
    over all m = 2^p registers (absent register ⇒ rho=0 ⇒ contributes 2^32)
    are EXACT BIGINT columns — the gate-stable core of the estimator; the
    float ``est`` applies the standard corrections on top (alpha_m * m^2 *
    2^32 / denom, switched to linear counting m*ln(m/zeros) in the small
    range) and is for human consumption. Sketch error is the usual
    1.04/sqrt(m)."""
    m = 1 << p
    alpha = 0.7213 / (1.0 + 1.079 / m) if m >= 128 else {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1.0 + 1.079 / m))
    gc = list(group_cols or [])
    agg = cells.groupBy(*gc).agg(
        (F.lit(m) - F.count(F.lit(1))).cast("long").alias("zeros"),
        (
            F.sum(F.expr("shiftleft(CAST(1 AS BIGINT), CAST(32 - rho AS INT))"))
        ).alias("__present"),
    )
    denom = (
        F.col("__present")
        + F.col("zeros") * F.lit(1 << 32).cast("long")
    ).alias("denom_scaled")
    raw = F.lit(alpha * m * m) * F.lit(float(1 << 32)) / F.col("denom_scaled")
    lc = F.lit(float(m)) * F.log(F.lit(float(m)) / F.col("zeros").cast("double"))
    est = F.when((raw <= 2.5 * m) & (F.col("zeros") > 0), lc).otherwise(raw)
    return agg.select(*gc, "zeros", denom).withColumn("est", est)


def ams_f2(
    df: DataFrame, key_col: str, reps: int = 8, salt: int = 53
) -> DataFrame:
    """AMS second-frequency-moment sketch (Alon-Matias-Szegedy 1996 — the
    classic "tug-of-war" F2 estimator): each replicate keeps ONE signed
    counter ``z = sum_x s(x)`` over the raw key stream, where ``s(x)`` is a
    deterministic +/-1 hash sign; ``E[z^2] = F2 = sum_k c_k^2`` (the join /
    self-join size and skew statistic). ``reps`` independent replicates are
    emitted so consumers can median/mean them.

    Scale shape: a ``reps``-way explode of the scan (the CMS pattern) into
    one map-side-combined ``reps``-row aggregate — fixed-size state, no
    key shuffle. For calibration the exact F2 is computed alongside from
    the key histogram (one extra aggregation; drop it at true scale).
    Everything is BIGINT: signs, z, z^2, and exact F2 — fully
    SQL-replayable via the engine-neutral poly31 + mix31 hashes.

    Returns ``(rep, z, est, f2_exact)`` — one row per replicate.
    """
    h = _poly31(F.col(key_col))
    rows = df.select(
        F.posexplode(
            F.array(
                *[
                    (F.lit(1) - 2 * F.pmod(_mix31(h, salt + i), F.lit(2))).cast(
                        "long"
                    )
                    for i in range(reps)
                ]
            )
        ).alias("rep", "sg")
    )
    z = rows.groupBy("rep").agg(F.sum("sg").alias("z"))
    exact = (
        df.groupBy(F.col(key_col).alias("__k"))
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy()
        .agg(F.sum(F.col("__c") * F.col("__c")).alias("f2_exact"))
    )
    return z.crossJoin(F.broadcast(exact)).select(
        F.col("rep").cast("long").alias("rep"),
        "z",
        (F.col("z") * F.col("z")).alias("est"),
        "f2_exact",
    )


def kmv_build(
    df: DataFrame,
    key_col: str,
    value_col: str,
    k: int = 64,
) -> DataFrame:
    """K-minimum-values distinct sketch (Bar-Yossef et al. 2002 — public
    methodology) per key: the ``k`` smallest Knuth-multiplicative hashes of
    ``value_col``. The odd multiplier mod 2^32 is a BIJECTION on 32-bit
    ints, so distinct values map to distinct uniform hashes and the whole
    sketch — unlike HLL's stochastic averaging — is exactly replayable in
    SQL.

    Scale shape: one distinct-pair shuffle on (key, hash), then the k-min
    prune is a keyed window over the SAME partitioning (no second
    exchange). Sketches are k BIGINTs — cheap to broadcast for the
    pairwise set-operation estimates in :func:`kmv_set_ops`.

    Returns ``(key, sketch array<long> ascending, n_kept)``.
    """
    from pyspark.sql import Window

    h = (F.col(value_col).cast("long") * F.lit(2654435761)) % F.lit(4294967296)
    d = df.select(F.col(key_col).alias("key"), h.alias("h")).dropDuplicates()
    w = Window.partitionBy("key").orderBy(F.col("h").asc())
    pruned = d.withColumn("__rk", F.row_number().over(w)).where(F.col("__rk") <= int(k))
    return pruned.groupBy("key").agg(
        F.sort_array(F.collect_list("h")).alias("sketch"),
        F.count(F.lit(1)).alias("n_kept"),
    )


def kmv_set_ops(sketches: DataFrame, k: int = 64) -> DataFrame:
    """All-pairs distinct/union/intersection estimates from KMV sketches.

    For keys a < b: the union's k-min sketch is the k smallest of the
    merged (deduplicated) sketch values with threshold theta = its k-th
    element; estimates are the textbook all-integer forms

        est        = (k-1) * 2^32 DIV h_k        (per-key cardinality)
        est_union  = (k-1) * 2^32 DIV theta
        est_inter  = |{h in A∩B : h <= theta}| * est_union DIV k

    A key with fewer than k distinct values is exact (est = n_kept). Pure
    BIGINT arithmetic end to end.
    """
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept")
    ).otherwise(F.expr(f"({k} - 1) * 4294967296 DIV element_at(sketch, {k})"))
    s = sketches.select("key", "sketch", "n_kept", est.alias("est"))
    a = s.select(
        F.col("key").alias("key_a"), F.col("sketch").alias("sa"), F.col("est").alias("est_a")
    )
    b = s.select(
        F.col("key").alias("key_b"), F.col("sketch").alias("sb"), F.col("est").alias("est_b")
    )
    pairs = a.join(b, F.col("key_a") < F.col("key_b"))
    comb = F.expr(f"slice(array_sort(array_union(sa, sb)), 1, {k})")
    pairs = pairs.withColumn("__comb", comb).withColumn(
        "__theta",
        F.when(
            F.size("__comb") >= k, F.expr(f"element_at(__comb, {k})")
        ).otherwise(F.expr("element_at(__comb, size(__comb))")),
    )
    est_union = F.when(
        F.size("__comb") < k, F.size("__comb").cast("long")
    ).otherwise(F.expr(f"({k} - 1) * 4294967296 DIV __theta"))
    common = F.expr("size(filter(array_intersect(sa, sb), x -> x <= __theta))").cast("long")
    return pairs.select(
        "key_a",
        "key_b",
        "est_a",
        "est_b",
        est_union.alias("est_union"),
        F.expr(
            f"CASE WHEN size(__comb) < {k} "
            # sub-k: sketches are the complete sets -> intersection is exact
            f"THEN CAST(size(filter(array_intersect(sa, sb), x -> x <= __theta)) AS BIGINT) "
            f"ELSE size(filter(array_intersect(sa, sb), x -> x <= __theta))"
            f" * (({k} - 1) * 4294967296 DIV __theta) DIV {k} END"
        ).alias("est_intersect"),
        common.alias("n_common"),
    )
