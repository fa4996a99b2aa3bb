"""Structured Streaming ingestion: transcript turns -> incremental edges.

The reference is batch-iterative (no streaming at all — SURVEY.md §2.3);
this module adds the ingestion path a production transcript pipeline needs:
new turns land continuously, and the edge table must grow incrementally
without recomputing history.

Design: the reply edge for turn (conv, k) needs turn (conv, k-1). A lag
window isn't available incrementally, so ``applyInPandasWithState`` keeps
the per-conversation turn ledger and emits each edge EXACTLY ONCE into the
append-mode sink:

- **reply edges** ``(t, t-1)`` emit when the second endpoint arrives; when
  both endpoints arrive in the same micro-batch the successor branch is
  suppressed (only t's own predecessor branch fires), so consecutive
  same-batch turns never double-emit.
- **tool edges** (tool turn -> nearest preceding assistant with the same
  tool, operators/edges.py semantics) emit only once the turn prefix
  ``0..t`` is complete — at that point no later-arriving turn can be a
  closer match, so the incremental answer equals the batch answer, and an
  assistant arriving *after* its tool turn still retro-triggers the edge.

Assumes ``turn_idx`` is dense (0-based, gap-free) per conversation — true
for transcripts by construction. Everything in the state function is
vectorized pandas/NumPy (isin masks + ``merge_asof``); no per-row Python.

Keys here are (conv_id, turn_idx) composite strings rather than dense longs:
dense global ids are a batch construct; streaming emits natural keys and the
batch compactor (operators/ids.py) assigns dense ids downstream.

Tested with file-source micro-batches + ``trigger(availableNow=True)``.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EDGE_SCHEMA = "conv_id string, src_turn int, dst_turn int, kind string"
STATE_SCHEMA = "turns array<int>, tools array<string>, roles array<string>, contig int"


def stream_transcripts(spark, path: str, schema) -> DataFrame:
    """File-source stream of transcript rows (one parquet dir, append-only)."""
    return spark.readStream.schema(schema).parquet(path)


def _contig(turns_sorted: np.ndarray) -> int:
    """Largest c such that every turn 0..c is present (-1 if 0 missing)."""
    if len(turns_sorted) == 0 or turns_sorted[0] != 0:
        return -1
    eq = turns_sorted == np.arange(len(turns_sorted))
    return int(len(turns_sorted) - 1 if eq.all() else eq.argmin() - 1)


def _emit_edges(
    key: Tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key
    if state.exists:
        turns, tools, roles, old_contig = state.get
        ledger = pd.DataFrame({
            "turn": np.asarray(turns, dtype=np.int64),
            "tool": pd.array(tools, dtype=object),
            "role": pd.array(roles, dtype=object),
        })
        old_contig = int(old_contig)
    else:
        ledger = pd.DataFrame({"turn": np.array([], dtype=np.int64), "tool": [], "role": []})
        old_contig = -1

    incoming = list(pdfs)
    batch = pd.concat(incoming, ignore_index=True) if incoming else pd.DataFrame()
    if len(batch):
        batch = (
            batch[["turn_idx", "role", "tool"]]
            .rename(columns={"turn_idx": "turn"})
            .astype({"turn": np.int64})
            .drop_duplicates("turn")
        )
        new = batch[~batch["turn"].isin(ledger["turn"])]
    else:
        new = batch

    allt = pd.concat([ledger, new], ignore_index=True).sort_values("turn", ignore_index=True)
    present = allt["turn"].to_numpy()
    new_turns = new["turn"].to_numpy() if len(new) else np.array([], dtype=np.int64)
    new_contig = _contig(present)

    frames = []
    if len(new_turns):
        # reply (t, t-1): emitted by the later-arriving endpoint; when both
        # endpoints are new this batch, only t's predecessor branch fires
        pred = new_turns[(new_turns > 0) & np.isin(new_turns - 1, present)]
        succ = new_turns[np.isin(new_turns + 1, present) & ~np.isin(new_turns + 1, new_turns)]
        if len(pred):
            frames.append(pd.DataFrame({"src_turn": pred, "dst_turn": pred - 1}))
        if len(succ):
            frames.append(pd.DataFrame({"src_turn": succ + 1, "dst_turn": succ}))
    if frames:
        reply = pd.concat(frames, ignore_index=True)
        reply["kind"] = "reply"
    else:
        reply = pd.DataFrame({"src_turn": [], "dst_turn": [], "kind": []})

    # tool edges: fire for tool turns whose prefix completed THIS batch
    cand = allt[
        (allt["role"] == "tool")
        & allt["tool"].notna()
        & (allt["turn"] > old_contig)
        & (allt["turn"] <= new_contig)
    ]
    tool_frames = []
    if len(cand):
        asst = allt[(allt["role"] == "assistant") & allt["tool"].notna()]
        if len(asst):
            matched = pd.merge_asof(
                cand.sort_values("turn"),
                asst.sort_values("turn").rename(columns={"turn": "asst_turn"}),
                left_on="turn",
                right_on="asst_turn",
                by="tool",
                direction="backward",
                allow_exact_matches=False,
            )
            matched = matched[matched["asst_turn"].notna()]
            if len(matched):
                tool_frames.append(pd.DataFrame({
                    "src_turn": matched["turn"].astype(np.int64),
                    "dst_turn": matched["asst_turn"].astype(np.int64),
                    "kind": "tool",
                }))

    out = pd.concat([reply] + tool_frames, ignore_index=True)
    state.update((
        [int(t) for t in allt["turn"]],
        [None if pd.isna(x) else str(x) for x in allt["tool"]],
        [str(x) for x in allt["role"]],
        new_contig,
    ))
    if len(out):
        out.insert(0, "conv_id", conv_id)
        out["src_turn"] = out["src_turn"].astype(np.int32)
        out["dst_turn"] = out["dst_turn"].astype(np.int32)
        yield out


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
