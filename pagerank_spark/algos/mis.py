"""Maximal independent set (Luby's algorithm) and iterated-MIS graph
coloring, with DETERMINISTIC multiplicative-hash priorities.

Luby's round: every active vertex whose priority is a strict local minimum
among its active neighbors joins the MIS; winners AND their neighbors leave
the active set. Expected O(log V) rounds. The classic algorithm draws fresh
randomness per round; this implementation derives the priority from
``(round, id)`` via the Knuth multiplicative hash (operators/packing.KNUTH)
— pure BIGINT arithmetic, so the whole run is a deterministic function of
the graph, replayable bit-for-bit by a SQL oracle and stable across
retries/partitioning (same property as operators/packing.hash_split).
Ties (hash collisions) break by vertex id: the priority is the pair
``(h, id)``, a total order.

Coloring mode keeps the same rounds but removes ONLY the winners (not
their neighbors): each round's winner set is independent, so
``color = round`` is a proper coloring (the Jones-Plassmann family).

Scale shape per round: active edges co-partitioned on the vertex key; one
grouped min over incoming priorities, one anti-join to shrink the active
set, one count action. The active set shrinks geometrically — round cost
decays like the k-core peel (algos/kcore.py).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.packing import KNUTH
from .pagerank import _num_partitions


def _prio(id_col, rnd: int):
    """Deterministic per-round priority: Knuth hash of (id, round)."""
    return F.pmod((F.col(id_col) + F.lit(rnd * 1_000_003)) * F.lit(KNUTH), F.lit(1 << 32))


@dataclass
class MISResult:
    members: DataFrame        # (id, round) — round the vertex was decided
    rounds: int
    converged: bool
    active_history: list = field(default_factory=list)


def luby_mis(
    edges: DataFrame,
    max_rounds: int = 40,
    num_partitions: int | None = None,
    coloring: bool = False,
    checkpointer=None,
) -> MISResult:
    """Compute a maximal independent set (``coloring=False``) or an
    iterated-MIS proper coloring (``coloring=True``, ``round`` = color).

    ``edges`` is symmetrized internally; isolated vertices (none here —
    vertices exist only via edges) would trivially join. Returns one row
    per MIS member (or per vertex with its color in coloring mode).

    ``checkpointer`` commits the CUMULATIVE decided set per round; a rerun
    reconstructs the active set from it (decided vertices plus, in MIS
    mode, their neighbors leave) and continues — round-keyed priorities
    make the continuation bit-identical to an uninterrupted run.
    """
    p = num_partitions or max(4, _num_partitions(edges))

    und = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
    )
    adj = (
        und.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionByName(und.select(F.col("b").alias("u"), F.col("a").alias("v")))
        .repartition(p, "u")
        .localCheckpoint()
    )
    active_v = adj.select(F.col("u").alias("id")).dropDuplicates().repartition(p, "id").localCheckpoint()

    start_round = 0
    picked_parts: list[DataFrame] = []
    if checkpointer is not None:
        resumed = checkpointer.latest()
        if resumed is not None:
            start_round, state, extra = resumed
            decided = state.select("id", "round").localCheckpoint()
            picked_parts = [decided]
            if extra.get("active") == 0:
                res = MISResult(members=decided, rounds=start_round, converged=True)
                return res
            removed = decided.select("id")
            if not coloring:
                removed = removed.unionByName(
                    adj.join(decided.select(F.col("id").alias("u")), "u")
                    .select(F.col("v").alias("id"))
                ).dropDuplicates()
            active_v = (
                active_v.join(removed, "id", "left_anti").repartition(p, "id").localCheckpoint()
            )
    n_active = active_v.count()

    result = MISResult(members=None, rounds=start_round, converged=(n_active == 0))  # type: ignore[arg-type]
    result.active_history.append(n_active)
    active_e = adj
    if start_round > 0:
        active_e = (
            adj.join(active_v.select(F.col("id").alias("u")), "u")
            .join(active_v.select(F.col("id").alias("v")), "v")
            .repartition(p, "u")
            .localCheckpoint(eager=False)
        )
    t0 = time.monotonic()

    while n_active > 0 and result.rounds < max_rounds:
        rnd = result.rounds + 1
        # local minima of (h, id) among active neighbors win; vertices with
        # no active neighbor win unconditionally (their min is null)
        pr = active_v.select("id", _prio("id", rnd).alias("h"))
        nbr_min = (
            active_e.join(
                pr.select(F.col("id").alias("v"), F.col("h").alias("hv")).hint("shuffle_hash"),
                "v",
            )
            .groupBy("u")
            .agg(F.min(F.struct(F.col("hv").alias("h"), F.col("v").alias("i"))).alias("m"))
        )
        winners = (
            pr.join(nbr_min.hint("shuffle_hash"), pr.id == nbr_min.u, "left")
            .filter(
                F.col("m").isNull()
                | (F.struct(F.col("h").alias("h"), F.col("id").alias("i")) < F.col("m"))
            )
            .select("id")
            .localCheckpoint()
        )
        picked_parts.append(winners.select("id", F.lit(rnd).alias("round")))

        if coloring:
            removed = winners
        else:
            removed = (
                winners.unionByName(
                    active_e.join(
                        winners.select(F.col("id").alias("u")).hint("shuffle_hash"), "u"
                    ).select(F.col("v").alias("id"))
                )
                .dropDuplicates()
            )
        active_v = (
            active_v.join(removed.hint("shuffle_hash"), "id", "left_anti")
            .repartition(p, "id")
            .localCheckpoint()
        )
        n_active = active_v.count()
        active_e = (
            active_e.join(active_v.select(F.col("id").alias("u")).hint("shuffle_hash"), "u")
            .join(active_v.select(F.col("id").alias("v")).hint("shuffle_hash"), "v")
            .repartition(p, "u")
            .localCheckpoint(eager=False)
        )
        result.rounds = rnd
        result.active_history.append(n_active)
        if checkpointer is not None:
            acc = picked_parts[0]
            for part in picked_parts[1:]:
                acc = acc.unionByName(part)
            checkpointer.commit(rnd, acc, {"active": n_active, "coloring": coloring})

    result.converged = n_active == 0
    members = picked_parts[0] if picked_parts else und.select(
        F.col("a").alias("id"), F.lit(0).alias("round")
    ).limit(0)
    for part in picked_parts[1:]:
        members = members.unionByName(part)
    result.members = members
    result.peel_seconds = time.monotonic() - t0  # type: ignore[attr-defined]
    return result
