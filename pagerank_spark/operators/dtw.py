"""Dynamic time warping distance of every key's event series against a
broadcast query pattern — the full DP, run as ONE codegen'd nested array
fold. No Python, no window, no per-cell shuffle.

DTW (Sakoe & Chiba 1978) is the standard elastic-alignment distance for
"find users/devices/conversations whose activity curve looks like THIS
template" — a per-key sequential DP that a window function cannot express
(cell (i, j) needs cell (i, j-1) of the SAME row being built). The scalable
relational shape mirrors operators/smoothing.py: ONE grouped
``sort_array(collect_list(struct(ts, tiebreak, value)))`` (a single
map-side-combined shuffle on the key), then the whole m×n DP runs inside a
nested ``aggregate`` lambda — outer fold over the series, inner fold over
the m query positions, state = the previous DP row (``array<bigint>`` of
length m+1, column 0 a +inf boundary sentinel so the init row is a
constant). Everything after the shuffle is whole-stage-codegen JVM work.

Determinism/hash-stability: values are snapped to an integer grid
(``round(value * scale)``) before the fold, so every DP cell is exact
BIGINT arithmetic — abs, add, least — and the result is bit-identical on
any engine that executes the same fold (the DuckDB oracle replays it with
``list_reduce``; a pytest replays it in pure Python). Overflow contract
(caller's): ``series_length * max|x - q|`` must stay under 2^60 — the
boundary sentinel is 2^60, and a path sum may sit next to it in a
``least``.

Scale notes (100-TB lens): one shuffle total, keyed by ``key_col``; per-key
state is that key's own series (the sessionization bound — an unbounded key
belongs to a streaming segmentation upstream, documented not truncated).
The query pattern is a plan literal: m more BIGINTs per DP row, zero
broadcast traffic. Cost is O(n_k · m) per key — band constraints
(Sakoe-Chiba radius) would drop it to O(n_k · r) but change the semantics;
the full DP is the exact baseline.

Reference parity: none (single-query reference); time-series mandate
breadth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["dtw_to_query"]

_BIG = 1 << 60


def dtw_to_query(
    events: DataFrame,
    query: list[int],
    key_col: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    scale: int = 100,
) -> DataFrame:
    """``(key_col, n_events, dtw)`` — one row per key; ``dtw`` is the exact
    integer DTW distance (L1 cell cost) between the key's
    ``(ts, tiebreak)``-ordered quantized series and ``query`` (already on
    the integer grid).
    """
    if not query:
        raise ValueError("query must be non-empty")
    m = len(query)
    qlit = "array(" + ", ".join(f"{int(v)}L" for v in query) + ")"
    init = "array(0L, " + ", ".join(f"{_BIG}L" for _ in query) + ")"
    sec = F.unix_timestamp(F.col(ts_col)).cast("long")
    rows = events.select(
        F.col(key_col).alias("k"),
        F.struct(
            sec.alias("s"),
            F.col(tiebreak_col).cast("long").alias("tb"),
            F.round(F.col(value_col) * scale).cast("long").alias("v"),
        ).alias("o"),
    )
    per_key = rows.groupBy("k").agg(
        F.sort_array(F.collect_list("o")).alias("arr"),
        F.count(F.lit(1)).alias("n_events"),
    )
    # outer fold: previous DP row (length m+1, [0] is the j=0 boundary);
    # inner fold: builds the new row left to right, racc[-1] = new[j-1]
    fold = F.expr(
        f"element_at(aggregate(arr, {init}, (acc, x) -> "
        f"aggregate(sequence(1, {m}), array({_BIG}L), (racc, j) -> "
        f"concat(racc, array(abs(x.v - element_at({qlit}, CAST(j AS INT))) "
        f"+ least(element_at(racc, size(racc)), "
        f"element_at(acc, CAST(j AS INT) + 1), "
        f"element_at(acc, CAST(j AS INT))))))), {m + 1})"
    )
    return per_key.select(
        F.col("k").alias(key_col), "n_events", fold.alias("dtw")
    )
