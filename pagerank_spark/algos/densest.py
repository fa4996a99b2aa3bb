"""Densest-subgraph approximation via parallel peeling (Bahmani, Kumar &
Vassilvitskii, VLDB 2012 — "Densest Subgraph in Streaming and MapReduce";
public methodology).

Each synchronized round removes EVERY vertex whose degree is at most
``2(1 + eps)`` times the current density ``rho = E / V`` (the average
degree is ``2 rho``, so each round is guaranteed to remove vertices and
the graph empties in ``O(log_{1+eps} n)`` rounds); the best density seen
across rounds is a ``2(1+eps)``-approximation of the optimum.
Synchronized bulk removal makes the run deterministic and SQL-unrollable
(the repo's fixed-round oracle trick: extra rounds on an empty graph are
no-ops).

All-integer removal rule: with ``eps = num/den``, "remove v iff
``deg(v) <= 2(1+eps) * E/V``" is evaluated as
``den * deg * V <= 2 * (den + num) * E`` — exact BIGINT products, no
float boundary, so both engines peel identically. Density of the winning round
is emitted as ``E * 10^6 div V`` (positive integer division, identical in
Spark and DuckDB).

Scale shape (100-TB lens): per round, one map-side-combined degree count
over the surviving symmetrized edge set, the round stats (V, E) riding
back in-plan as a one-row broadcast cross join (NO driver action per
round), and two semi-joins shrinking the edge set — the k-core peel shape
(algos/kcore.py). The edge set only shrinks; eager localCheckpoint per
round truncates lineage. The per-round vertex snapshots union into a
(rounds x V)-bounded table and the exact cross-round argmax is a tiny
nested-loop anti-join over one row per round. Catalyst stats note: the
two semi-joins per round grow the BigInteger size estimate ~cubically per
round (see BENCH/SCALING_NOTES.md §10) — harmless at the O(log n) round
counts this algorithm needs; a run pushing 30+ rounds should route the
edge set through the parquet Checkpointer to reset origin stats.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .pagerank import _num_partitions

__all__ = ["densest_subgraph"]


def densest_subgraph(
    edges: DataFrame,
    rounds: int = 12,
    eps_num: int = 1,
    eps_den: int = 2,
) -> DataFrame:
    """``(id, n_vertices, n_edges, density_micro)`` — the vertex set of the
    densest peel round (ties: earliest round), with its exact stats.

    ``rounds`` must cover the peel-to-empty horizon (extra rounds are
    no-ops); density is |E|/|V| over the non-isolated surviving vertices.
    """
    if rounds < 1:
        raise ValueError("rounds must be >= 1")
    if eps_num < 0 or eps_den < 1:
        raise ValueError("eps must be a non-negative rational")
    p = _num_partitions(edges)
    sym = (
        edges.select("src", "dst")
        .unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .dropDuplicates(["src", "dst"])
        .repartition(p, "src")
    ).localCheckpoint()

    keep_num = 2 * (eps_den + eps_num)  # keep v iff den*deg*V > 2*(den+num)*E
    cur = sym
    snaps = []
    for r in range(rounds):
        deg = cur.groupBy("src").agg(F.count(F.lit(1)).cast("long").alias("deg"))
        stats = deg.agg(
            F.count(F.lit(1)).cast("long").alias("v_cnt"),
            (F.coalesce(F.sum("deg"), F.lit(0)) / 2).cast("long").alias("e_cnt"),
        )
        # one materialization per round feeds BOTH the snapshot union and
        # the survivor filter — cur is scanned once for the degree count
        snap = deg.crossJoin(F.broadcast(stats)).select(
            F.lit(r).alias("round"),
            F.col("src").alias("id"),
            "deg",
            "v_cnt",
            "e_cnt",
        ).localCheckpoint()
        snaps.append(snap)
        alive = snap.filter(
            F.lit(eps_den) * F.col("deg") * F.col("v_cnt")
            > F.lit(keep_num) * F.col("e_cnt")
        ).select("id")
        cur = (
            cur.join(alive.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(alive.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .select("src", "dst")
        ).localCheckpoint()

    all_snaps = snaps[0]
    for s in snaps[1:]:
        all_snaps = all_snaps.unionByName(s)
    per_round = all_snaps.select("round", "v_cnt", "e_cnt").dropDuplicates(["round"])
    # exact rational argmax of e/v across rounds (earliest round wins ties):
    # a tiny rounds-count-sized nested loop, never a float compare
    best = per_round.alias("s").join(
        F.broadcast(per_round.alias("t")),
        on=F.expr(
            "t.e_cnt * s.v_cnt > s.e_cnt * t.v_cnt "
            "OR (t.e_cnt * s.v_cnt = s.e_cnt * t.v_cnt AND t.round < s.round)"
        ),
        how="leftanti",
    )
    return all_snaps.join(
        F.broadcast(best.selectExpr("s.round AS round")), "round", "left_semi"
    ).select(
        "id",
        F.col("v_cnt").alias("n_vertices"),
        F.col("e_cnt").alias("n_edges"),
        F.expr("(e_cnt * 1000000) div v_cnt").alias("density_micro"),
    )
