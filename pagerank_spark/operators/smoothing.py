"""Per-key exponentially weighted moving average (EWMA) — sequential state
as a codegen'd array fold, no Python, no iterative supersteps.

EWMA is the canonical smoothing/anomaly baseline (Hunter 1986, "The
Exponentially Weighted Moving Average" — public methodology):
``acc_i = alpha * x_i + (1 - alpha) * acc_{i-1}``. It is inherently
sequential per key, which rules out a plain window aggregate — but the
per-key history is bounded (events per user/device/conv), so the scalable
relational shape is: ONE grouped ``sort_array(collect_list(struct(...)))``
(shuffle on the key, map-side combined) followed by a codegen'd
``aggregate`` lambda fold. The sequential dependency never leaves the row.

Determinism/hash-stability: the fold runs over a totally ordered
``(ts, tiebreak)`` list, so both engines execute the IDENTICAL sequence of
IEEE double operations — results are bit-equal, and the single final
micro-rounding is therefore representation-stable (per-step values are
never emitted). ``alpha`` is restricted to dyadic rationals (1/2, 1/4,
...) so the per-step scaling is an exact binary shift — no decimal noise
accumulates beyond the input's own representation.

Scale notes (100-TB lens): one shuffle total; per-key state = that key's
event list (same bound as any sessionization); a key with unbounded
history belongs to the streaming variant
(streaming/windows.py's stateful path), not a batch fold — documented,
not silently truncated. Init is ``acc_0 = 0`` (prepended zero), the
bias-toward-zero textbook variant, chosen because both engines can state
it identically (DuckDB ``list_reduce`` seeds from the first element).

Reference parity: none (single-query reference); time-series mandate
breadth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["ewma", "cusum", "holt", "kalman1d"]

_SCALE = 1_000_000


def ewma(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    halvings: int = 1,
) -> DataFrame:
    """``(key_col, n_events, ewma_micro, last_s)`` — one row per key.

    The recurrence is the dyadic ``acc = (acc * (2^h - 1) + x) / 2^h``
    with ``h = halvings`` (``alpha = 1 / 2^h``) — every step an exact
    power-of-two scale. ``ewma_micro`` is the final state micro-rounded
    ONCE; ``last_s`` the key's last epoch second (exact BIGINT).
    """
    if halvings < 1:
        raise ValueError("halvings must be >= 1")
    denom = 1 << halvings
    sec = F.unix_timestamp(F.col(ts_col)).cast("long")
    rows = events.select(
        F.col(key_col).alias("k"),
        F.struct(
            sec.alias("s"),
            F.col(tiebreak_col).cast("long").alias("tb"),
            F.col(value_col).cast("double").alias("v"),
        ).alias("o"),
    )
    per_key = rows.groupBy("k").agg(
        F.sort_array(F.collect_list("o")).alias("arr"),
        F.count(F.lit(1)).alias("n_events"),
        F.max("o.s").alias("last_s"),
    )
    fold = F.expr(
        f"aggregate(arr, CAST(0.0 AS DOUBLE), "
        f"(acc, x) -> (acc * {denom - 1}.0 + x.v) / {denom}.0)"
    )
    return per_key.select(
        F.col("k").alias(key_col),
        "n_events",
        F.round(fold * _SCALE).cast("long").alias("ewma_micro"),
        "last_s",
    )


def cusum(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    k: float = 0.75,
) -> DataFrame:
    """One-sided upper CUSUM (Page 1954, public methodology) per key:
    ``s_i = max(0, s_{i-1} + x_i - k)`` over the (ts, tiebreak)-ordered
    values. Returns ``(key_col, n_events, cusum_micro, cusum_max_micro)``
    — the final statistic and its running maximum (the drift detector),
    each micro-rounded ONCE.

    Determinism: computed via the closed form
    ``s_i = P_i - min(0, min_{j<=i} P_j)`` with ``P`` the prefix sums of
    ``x - k``. Every ``P_i`` is an independent left-to-right slice-fold
    (identical IEEE sequence both engines), and min/max of doubles are
    EXACT selections (no rounding), so the running minimum and the final
    max are order-independent — no struct accumulator is needed (DuckDB's
    struct-field lambdas evaluate fields sequentially against a mutated
    accumulator, so a (s, max) pair fold is NOT cross-engine safe).

    Cost: O(n_k^2) slice additions per key — the batch form for
    bounded per-key histories (same contract as :func:`ewma`); unbounded
    keys belong to the streaming variant.
    """
    rows = events.select(
        F.col(key_col).alias("k"),
        F.struct(
            F.unix_timestamp(F.col(ts_col)).cast("long").alias("s"),
            F.col(tiebreak_col).cast("long").alias("tb"),
            F.col(value_col).cast("double").alias("v"),
        ).alias("o"),
    )
    per_key = rows.groupBy("k").agg(
        F.sort_array(F.collect_list("o")).alias("arr"),
        F.count(F.lit(1)).alias("n_events"),
    )
    kf = float(k)
    prefixes = F.expr(
        f"transform(arr, (x, i) -> aggregate(slice(arr, 1, i + 1),"
        f" CAST(0.0 AS DOUBLE), (a, y) -> a + (y.v - CAST({kf!r} AS DOUBLE))))"
    )
    # NB: lambda vars resolve case-insensitively against columns — the
    # accumulator column is "pfx" so the lambda var can't shadow it
    stats = F.expr(
        "transform(pfx, (e, i) -> e - least(CAST(0.0 AS DOUBLE),"
        " array_min(slice(pfx, 1, i + 1))))"
    )
    return (
        per_key.select("k", "n_events", prefixes.alias("pfx"))
        .select("k", "n_events", stats.alias("st"))
        .select(
            F.col("k").alias(key_col),
            "n_events",
            F.round(F.element_at("st", -1) * _SCALE).cast("long").alias("cusum_micro"),
            F.round(F.array_max("st") * _SCALE).cast("long").alias("cusum_max_micro"),
        )
    )


def changepoint(series: DataFrame, t_col: str, x_col: str) -> DataFrame:
    """Single change-point localization (binary segmentation, step 1):
    the split maximizing the CUSUM deviation ``|S_t - (t/n) * S_n|`` over
    an integer-valued series — where the running sum departs furthest
    from the global trend line.

    Exactness: multiplying by n clears the fraction, so the statistic is
    the exact BIGINT ``|n * S_t - i * S_n|`` (i = 1-based position, S from
    the two-phase distributed prefix sum — no global window); the argmax
    is a TakeOrdered with deterministic (stat desc, t asc) tiebreak, never
    a full sort. Overflow contract: ``n * S_n`` under 2^63 (quantize wide
    values upstream, as in :func:`..operators.temporal.autocorrelation`).

    Returns one row ``(t_split, i_split, n, stat)``.
    """
    from .cumsum import distributed_cumsum

    base = series.select(
        F.col(t_col).alias("__t"), F.col(x_col).cast("long").alias("__x")
    ).withColumn("__one", F.lit(1).cast("long"))
    cs = distributed_cumsum(base, ["__t"], "__x", out_col="__s")
    ci = distributed_cumsum(base.select("__t", "__one"), ["__t"], "__one", out_col="__i")
    j = cs.join(ci.select("__t", "__i"), "__t")
    # last cumsum row via struct-max on position (NOT max(__s): the series
    # may go negative, so the max cumsum is not necessarily the total)
    tot = j.groupBy().agg(F.max(F.struct("__i", "__s")).alias("__m")).select(
        F.col("__m.__s").alias("__sn"), F.col("__m.__i").alias("__n")
    )
    stat = j.crossJoin(F.broadcast(tot)).select(
        F.col("__t").alias("t_split"),
        F.col("__i").alias("i_split"),
        F.col("__n").alias("n"),
        F.abs(F.col("__n") * F.col("__s") - F.col("__i") * F.col("__sn")).alias("stat"),
    )
    return stat.orderBy(F.col("stat").desc(), F.col("t_split").asc()).limit(1)


def holt(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    level_halvings: int = 1,
    trend_halvings: int = 2,
) -> DataFrame:
    """Holt's linear (double exponential) smoothing per key — level +
    trend, the standard one-pass forecast state for drifting series
    (Holt 1957, public methodology).

    Canonical recurrence (EXPANDED single-expression form, with
    ``A = 2^level_halvings`` i.e. alpha = 1/A, ``B = 2^trend_halvings``
    i.e. beta = 1/B)::

        l' = (x + (A-1) * (l + b)) / A
        b' = (x - l + ((A-1) + A*(B-1)) * b) / (A*B)

    The textbook sequential form ``b' = beta*(l'-l) + (1-beta)*b`` is
    algebraically equal but a DIFFERENT IEEE op sequence; this operator
    and its oracles commit to the expanded form so both engines replay
    bit-identical doubles. (DuckDB 1.0 cannot run a struct-accumulator
    ``list_reduce`` faithfully anyway — later struct fields observe the
    earlier fields' NEW values mid-iteration — so the SQL oracle replays
    the fold as a recursive CTE; see tests/test_holt.py.)

    Init: ``l = x_1, b = 0`` (first observation in (ts, tiebreak) order).
    Scale shape: identical to :func:`ewma` — one map-side-combined
    collect per key, the fold is a codegen'd ``aggregate`` lambda over
    the key's own (bounded) series; no window, no cross-key state.

    Returns ``(key_col, n_events, level_micro, trend_micro)`` —
    floor(x*1e6 + 0.5)-rounded ONCE (exact IEEE floor on both engines).
    """
    if level_halvings < 1 or trend_halvings < 1:
        raise ValueError("halvings must be >= 1")
    a = 1 << level_halvings
    b = 1 << trend_halvings
    cc = (a - 1) + a * (b - 1)
    d = a * b
    sec = F.unix_timestamp(F.col(ts_col)).cast("long")
    rows = events.select(
        F.col(key_col).alias("k"),
        F.struct(
            sec.alias("s"),
            F.col(tiebreak_col).cast("long").alias("tb"),
            F.col(value_col).cast("double").alias("v"),
        ).alias("o"),
    )
    per_key = rows.groupBy("k").agg(
        F.sort_array(F.collect_list("o")).alias("arr"),
        F.count(F.lit(1)).alias("n_events"),
    )
    fold = F.expr(
        f"aggregate(slice(arr, 2, greatest(size(arr) - 1, 0)), "
        f"named_struct('l', CAST(element_at(arr, 1).v AS DOUBLE), 'b', CAST(0.0 AS DOUBLE)), "
        f"(acc, x) -> named_struct("
        f"'l', (x.v + {a - 1}.0 * (acc.l + acc.b)) / {a}.0, "
        f"'b', (x.v - acc.l + {cc}.0 * acc.b) / {d}.0))"
    )
    return per_key.select(
        F.col("k").alias(key_col),
        "n_events",
        F.floor(fold.getField("l") * _SCALE + F.lit(0.5)).cast("long").alias("level_micro"),
        F.floor(fold.getField("b") * _SCALE + F.lit(0.5)).cast("long").alias("trend_micro"),
    )


def holt_winters(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    period: int = 4,
) -> DataFrame:
    """Additive Holt-Winters (triple exponential) smoothing per key with
    dyadic coefficients alpha=1/2, beta=1/4, gamma=1/4 (Winters 1960,
    public methodology): level + trend + a ``period``-slot seasonal state.

    State-update subtlety: the seasonal vector is kept as a ROTATING list
    whose head is the slot consumed next — each step reads ``seas[1]``,
    appends the refreshed slot at the tail (``concat(slice(seas, 2, m-1),
    [S_new])``) — so neither engine needs an indexed in-place list update,
    and every field of the new state is an expression over the OLD state
    only (same expanded-form discipline as :func:`holt`; with
    ``s1 = seas[1]``, the level/trend updates are exactly holt's with
    ``x`` replaced by ``x - s1``). Both engines commit to the identical
    IEEE expression tree, so doubles replay bit-for-bit; the oracle is a
    recursive CTE for the same reason as holt's (DuckDB struct-accumulator
    list_reduce is unfaithful).

    Init: ``l = x_1, b = 0, seas = zeros(period)`` — the first ``period``
    steps learn the seasonal slots through the gamma update.

    Returns ``(key_col, n_events, level_micro, trend_micro, s1_micro ..
    s<period>_micro)`` — all floor(x*1e6+0.5) BIGINT; the s columns are in
    rotation order (s1 = next slot to be consumed).

    Scale shape: identical to ewma/holt — one map-side-combined sorted
    collect per key, a codegen'd aggregate lambda over each key's own
    bounded series, no windows, no cross-key state.
    """
    if period < 2:
        raise ValueError("period must be >= 2")
    m = period
    sec = F.unix_timestamp(F.col(ts_col)).cast("long")
    rows = events.select(
        F.col(key_col).alias("k"),
        F.struct(
            sec.alias("s"),
            F.col(tiebreak_col).cast("long").alias("tb"),
            F.col(value_col).cast("double").alias("v"),
        ).alias("o"),
    )
    per_key = rows.groupBy("k").agg(
        F.sort_array(F.collect_list("o")).alias("arr"),
        F.count(F.lit(1)).alias("n_events"),
    )
    s1 = "element_at(acc.seas, 1)"
    lvl_new = f"((x.v - {s1}) + 1.0 * (acc.l + acc.b)) / 2.0"
    snew = f"(x.v - {lvl_new} + 3.0 * {s1}) / 4.0"
    fold = F.expr(
        f"aggregate(slice(arr, 2, greatest(size(arr) - 1, 0)), "
        f"named_struct("
        f"'l', CAST(element_at(arr, 1).v AS DOUBLE), "
        f"'b', CAST(0.0 AS DOUBLE), "
        f"'seas', array_repeat(CAST(0.0 AS DOUBLE), {m})), "
        f"(acc, x) -> named_struct("
        f"'l', {lvl_new}, "
        f"'b', ((x.v - {s1}) - acc.l + 7.0 * acc.b) / 8.0, "
        f"'seas', concat(slice(acc.seas, 2, {m - 1}), array({snew}))))"
    ).alias("st")
    out = per_key.select(F.col("k"), "n_events", fold)
    micro = lambda c: F.expr(f"CAST(FLOOR({c} * 1000000 + 0.5) AS BIGINT)")
    cols = [
        F.col("k").alias(key_col),
        "n_events",
        micro("st.l").alias("level_micro"),
        micro("st.b").alias("trend_micro"),
    ] + [micro(f"element_at(st.seas, {j})").alias(f"s{j}_micro") for j in range(1, m + 1)]
    return out.select(*cols)


def kalman1d(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    q: float = 0.25,
    r: float = 1.0,
) -> DataFrame:
    """Per-key scalar Kalman filter (random-walk state, Kalman 1960 —
    public methodology): the optimal recursive smoother
    ``P' = P + q; K = P'/(P' + r); x' = x + K (z - x); P'' = (1-K) P'``
    over each key's totally ``(ts, tiebreak)``-ordered observations.
    The adaptive-gain upgrade of :func:`ewma` — early observations move
    the state aggressively (P large), later ones settle to the
    steady-state gain — and the standard pre-processing smoother for
    noisy per-entity telemetry.

    Same architecture and determinism contract as :func:`ewma`: ONE
    map-side-combined ``sort_array(collect_list(...))`` shuffle, then a
    codegen'd ``aggregate`` fold whose accumulator is the 2-element
    DOUBLE array ``[x, P]`` (the cross-engine-safe state shape — struct
    accumulators mutate sequentially in DuckDB lambdas, lists don't; the
    DTW/LZ78 precedent). Every step is +,-,*,/ on doubles — correctly
    rounded IEEE ops in an identical expression tree on both engines, so
    the fold is bit-equal; ``K`` is spelled as its defining quotient at
    every use (recomputation of correctly-rounded ops is exact). Init is
    the textbook diffuse-toward-zero ``x0 = 0, P0 = 1``.

    ``q``/``r`` should be dyadic rationals so the literals render
    identically on both engines. Returns
    ``(key_col, n_events, kalman_micro, p_micro)`` — final state and
    variance, each micro-rounded ONCE.

    Scale notes: one shuffle, bounded per-key state (the ewma contract);
    unbounded keys belong to streaming/metrics.py's stateful path.
    """
    if q <= 0 or r <= 0:
        raise ValueError("q and r must be positive")
    ql, rl = repr(float(q)), repr(float(r))
    sec = F.unix_timestamp(F.col(ts_col)).cast("long")
    rows = events.select(
        F.col(key_col).alias("k"),
        F.struct(
            sec.alias("s"),
            F.col(tiebreak_col).cast("long").alias("tb"),
            F.col(value_col).cast("double").alias("v"),
        ).alias("o"),
    )
    per_key = rows.groupBy("k").agg(
        F.sort_array(F.collect_list("o")).alias("arr"),
        F.count(F.lit(1)).alias("n_events"),
    )
    # P' = acc[1] + q appears only as the literal subexpression below; the
    # gain K = P'/(P' + r) is restated at each use (exact recomputation)
    fold = F.expr(
        "aggregate(arr, array(CAST(0.0 AS DOUBLE), CAST(1.0 AS DOUBLE)), "
        "(acc, x) -> array("
        f"acc[0] + ((acc[1] + {ql}) / ((acc[1] + {ql}) + {rl})) * (x.v - acc[0]), "
        f"(acc[1] + {ql}) - ((acc[1] + {ql}) / ((acc[1] + {ql}) + {rl})) * (acc[1] + {ql})"
        "))"
    )
    st = per_key.select(
        F.col("k").alias(key_col), "n_events", fold.alias("__st")
    )
    return st.select(
        key_col,
        "n_events",
        F.round(F.col("__st")[0] * _SCALE).cast("long").alias("kalman_micro"),
        F.round(F.col("__st")[1] * _SCALE).cast("long").alias("p_micro"),
    )
