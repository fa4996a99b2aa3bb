"""Parallel maximal matching with deterministic hash priorities.

The Luby-family sibling of ``algos/mis.py`` (an MIS on the LINE graph): per
round, every active edge whose per-round hash priority is the strict minimum
among all active edges sharing either endpoint joins the matching; both
endpoints (and every edge touching them) leave. Expected O(log E) rounds
(Israeli-Itai 1986 family). Priorities are pure BIGINT multiplicative-hash
arithmetic keyed on ``(a, b, round)`` — no RNG — so the whole run is a
deterministic function of the graph: replayable bit-for-bit by a SQL oracle
(unrolled rounds; extra rounds are no-ops at the fixpoint) and stable across
retries and repartitionings.

Scale shape per round: one projection computes priorities, one union doubles
edges into per-endpoint incidence rows, one grouped min per vertex (map-side
combined), one double semi-join selects edges that win BOTH endpoints, two
anti-joins shrink the active set. The active edge set shrinks geometrically,
so round cost decays like the MIS/k-core peels. State is referenced once per
superstep (no state self-join — BENCH/SCALING_NOTES.md §10).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .pagerank import _num_partitions

KNUTH = 2654435761
MIX = 2246822519
M31 = 1 << 31
ROUND_SALT = 1_000_003


def _edge_prio(rnd: int):
    """Per-round edge priority over canonical (a, b): two multiplicative
    rounds mod 2^31 (products stay < 2^62 for ids < 2^31). The round salt
    enters before the second multiply so rankings differ across rounds."""
    h1 = F.pmod(F.col("a") * F.lit(KNUTH) + F.col("b"), F.lit(M31))
    return F.pmod(
        F.pmod(h1 + F.lit(rnd * ROUND_SALT), F.lit(M31)) * F.lit(MIX) + F.lit(1),
        F.lit(M31),
    )


@dataclass
class MatchingResult:
    matching: DataFrame  # (a, b, round) — round the edge was matched
    rounds: int
    converged: bool
    active_history: list = field(default_factory=list)


def maximal_matching(
    edges: DataFrame,
    max_rounds: int = 40,
    num_partitions: int | None = None,
) -> MatchingResult:
    """Greedy-parallel maximal matching of the UNDIRECTED simple graph under
    ``edges`` (symmetrized, self-loops dropped). Returns one row per matched
    edge in canonical (a < b) orientation with the round it was decided.

    Maximality: the loop ends when no active edge remains, and an edge only
    leaves the active set matched or adjacent to a matched vertex — so no
    two unmatched neighbors survive.
    """
    p = num_partitions or max(4, _num_partitions(edges))
    active = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
        .repartition(p, "a")
        .localCheckpoint()
    )
    n_active = active.count()
    result = MatchingResult(matching=None, rounds=0, converged=(n_active == 0))  # type: ignore[arg-type]
    result.active_history.append(n_active)
    matched_parts: list[DataFrame] = []
    t0 = time.monotonic()

    while n_active > 0 and result.rounds < max_rounds:
        rnd = result.rounds + 1
        pr = active.select("a", "b", _edge_prio(rnd).alias("h"))
        inc = pr.select(F.col("a").alias("v"), "h", "a", "b").unionByName(
            pr.select(F.col("b").alias("v"), "h", "a", "b")
        )
        # per-vertex minimum edge under the total order (h, a, b)
        vmin = inc.groupBy("v").agg(
            F.min(F.struct("h", "a", "b")).alias("m")
        ).select("v", F.col("m.a").alias("ma"), F.col("m.b").alias("mb"))
        winners = (
            pr.join(
                vmin.hint("shuffle_hash"),
                (pr.a == vmin.v) & (pr.a == vmin.ma) & (pr.b == vmin.mb),
                "left_semi",
            )
            .join(
                vmin.hint("shuffle_hash"),
                (pr.b == vmin.v) & (pr.a == vmin.ma) & (pr.b == vmin.mb),
                "left_semi",
            )
            .select("a", "b")
            .localCheckpoint()
        )
        matched_parts.append(winners.select("a", "b", F.lit(rnd).alias("round")))
        mv = (
            winners.select(F.col("a").alias("id"))
            .unionByName(winners.select(F.col("b").alias("id")))
            .dropDuplicates()
        )
        active = (
            active.join(mv.hint("shuffle_hash"), active.a == mv.id, "left_anti")
            .join(mv.hint("shuffle_hash"), F.col("b") == mv.id, "left_anti")
            .repartition(p, "a")
            .localCheckpoint()
        )
        n_active = active.count()
        result.rounds = rnd
        result.active_history.append(n_active)

    result.converged = n_active == 0
    acc = matched_parts[0] if matched_parts else None
    for part in matched_parts[1:]:
        acc = acc.unionByName(part)
    if acc is None:
        spark = edges.sparkSession
        acc = spark.createDataFrame([], "a long, b long, round int")
    result.matching = acc
    result.elapsed = time.monotonic() - t0  # type: ignore[attr-defined]
    return result


def py_maximal_matching(edge_list, max_rounds: int = 40):
    """Bit-identical pure-Python replay (the pytest oracle)."""
    active = {tuple(sorted(e)) for e in edge_list if e[0] != e[1]}
    matched = {}
    rnd = 0
    while active and rnd < max_rounds:
        rnd += 1

        def prio(e):
            a, b = e
            h1 = (a * KNUTH + b) % M31
            return (((h1 + rnd * ROUND_SALT) % M31) * MIX + 1) % M31

        vmin = {}
        for e in active:
            key = (prio(e), e[0], e[1])
            for v in e:
                if v not in vmin or key < vmin[v]:
                    vmin[v] = key
        winners = {
            e
            for e in active
            if vmin[e[0]][1:] == e and vmin[e[1]][1:] == e
        }
        for e in winners:
            matched[e] = rnd
        mv = {v for e in winners for v in e}
        active = {e for e in active if e[0] not in mv and e[1] not in mv}
    return matched, rnd, not active
