"""Structured Streaming ingestion: transcript turns -> incremental edges.

The reference is batch-iterative (no streaming at all — SURVEY.md §2.3);
this module adds the ingestion path a production transcript pipeline needs:
new turns land continuously, and the edge table must grow incrementally
without recomputing history.

Design: the reply edge for turn (conv, k) needs turn (conv, k-1). A lag
window isn't available incrementally, but the pair (turn, predecessor) is a
*stream-static-free* self-derivation if each micro-batch carries whole
conversations — in practice turns arrive per-conversation nearly in order,
so we implement the general solution: ``applyInPandasWithState`` keeps the
last-seen (turn_idx -> vid-key) per conversation and emits edges for each
arriving turn, tolerating out-of-order arrival within the state horizon.

Keys here are (conv_id, turn_idx) composite strings rather than dense longs:
dense global ids are a batch construct; streaming emits natural keys and the
batch compactor (operators/ids.py) assigns dense ids downstream.

Tested with file-source micro-batches + ``trigger(availableNow=True)``.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EDGE_SCHEMA = "conv_id string, src_turn int, dst_turn int, kind string"
STATE_SCHEMA = "turns array<int>, tools array<string>, roles array<string>"


def stream_transcripts(spark, path: str, schema) -> DataFrame:
    """File-source stream of transcript rows (one parquet dir, append-only)."""
    return spark.readStream.schema(schema).parquet(path)


def _emit_edges(
    key: Tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    if state.exists:
        turns, tools, roles = state.get
        turns = list(turns)
        tools = list(tools)
        roles = list(roles)
    else:
        turns, tools, roles = [], [], []

    known = {t: i for i, t in enumerate(turns)}
    new_rows = []
    for pdf in pdfs:
        for _, row in pdf.sort_values("turn_idx").iterrows():
            t = int(row["turn_idx"])
            if t in known:
                continue
            known[t] = len(turns)
            turns.append(t)
            tools.append(row["tool"] if isinstance(row["tool"], str) else None)
            roles.append(row["role"])
            new_rows.append(t)

    out = []
    tool_by_turn = dict(zip(turns, tools))
    role_by_turn = dict(zip(turns, roles))
    present = set(turns)
    for t in new_rows:
        # reply edge to predecessor (if it has arrived)
        if (t - 1) in present and t - 1 >= 0:
            out.append((conv_id, t, t - 1, "reply"))
        # successor may have arrived earlier (out-of-order): emit its edge now
        if (t + 1) in present:
            out.append((conv_id, t + 1, t, "reply"))
        # tool edge: nearest preceding assistant with same tool
        if role_by_turn.get(t) == "tool" and tool_by_turn.get(t):
            for p in sorted((x for x in present if x < t), reverse=True):
                if role_by_turn.get(p) == "assistant" and tool_by_turn.get(p) == tool_by_turn[t]:
                    out.append((conv_id, t, p, "tool"))
                    break

    state.update((turns, tools, roles))
    if out:
        yield pd.DataFrame(out, columns=["conv_id", "src_turn", "dst_turn", "kind"])


def incremental_edges(turn_stream: DataFrame) -> DataFrame:
    """Streaming DataFrame of edges (natural keys) from a turn stream."""
    return (
        turn_stream.groupBy("conv_id")
        .applyInPandasWithState(
            _emit_edges,
            outputStructType=EDGE_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_ingest(spark, in_path: str, out_path: str, checkpoint: str, schema) -> None:
    """One availableNow pass: drain pending files into the edge table."""
    edges = incremental_edges(stream_transcripts(spark, in_path, schema))
    q = (
        edges.writeStream.format("parquet")
        .option("path", out_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
