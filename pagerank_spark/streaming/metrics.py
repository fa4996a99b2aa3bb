"""Streaming per-key EWMA — the batch fold of operators/smoothing.py as an
incremental ``applyInPandasWithState`` operator.

State per key is just ``(acc, n_events)`` — the whole point of EWMA as a
streaming metric: O(1) state, no window buffer, no watermark-bounded list.
Each micro-batch's rows are folded in ``(ts, tiebreak)`` order on top of
the carried accumulator; when arrivals respect event-time order ACROSS
micro-batches (an in-order feed, the metrics-pipeline norm), the state
after batch k equals the batch operator's fold over everything seen — the
parity the test pins. Out-of-order arrivals fold in arrival order (the
standard streaming-EWMA semantics; a strict event-time EWMA needs the
batch operator over a closed window instead).

The per-row Python fold inside the Arrow batch is deliberate: the
recurrence is sequential by definition, and the closed-form vectorized
rewrite (powers of (1 - alpha)) changes the floating-point op sequence and
breaks bit-parity with the batch fold. Per-key per-batch row counts are
micro-batch sized, so the loop is bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

__all__ = ["streaming_ewma"]

_STATE = StructType(
    [StructField("acc", DoubleType()), StructField("n", LongType())]
)


def _out_schema(key_field) -> StructType:
    return StructType(
        [
            key_field,
            StructField("n_events", LongType()),
            StructField("ewma_micro", LongType()),
        ]
    )


def streaming_ewma(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    halvings: int = 1,
) -> DataFrame:
    """``(key_col, n_events, ewma_micro)`` updates per micro-batch.

    ``events`` is a STREAMING DataFrame. Same dyadic recurrence as
    :func:`pagerank_spark.operators.smoothing.ewma`:
    ``acc = (acc * (2^h - 1) + x) / 2^h``, init 0.
    """
    if halvings < 1:
        raise ValueError("halvings must be >= 1")
    denom = 1 << halvings
    key_field = next(f for f in events.schema.fields if f.name == key_col)

    def fn(key, pdfs, state: GroupState):
        from decimal import ROUND_HALF_UP, Decimal

        import pandas as pd

        acc, n = state.get if state.exists else (0.0, 0)
        chunk = pd.concat(list(pdfs))
        chunk = chunk.sort_values([ts_col, tiebreak_col])
        for v in chunk[value_col].astype("float64"):
            acc = (acc * (denom - 1) + v) / denom
        n += len(chunk)
        state.update((acc, n))
        # Spark's round() is BigDecimal HALF_UP on the shortest decimal
        # repr of the double; Python round() is banker's — replicate the
        # former so stream == batch at exact .5 micro boundaries
        micro = int(
            Decimal(repr(acc * 1_000_000)).to_integral_value(rounding=ROUND_HALF_UP)
        )
        yield pd.DataFrame(
            {key_col: [key[0]], "n_events": [n], "ewma_micro": [micro]}
        )

    return (
        events.select(key_col, value_col, ts_col, tiebreak_col)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            _out_schema(key_field),
            _STATE,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
