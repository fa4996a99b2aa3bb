"""Distributed Louvain community detection (Blondel et al. 2008,
J. Stat. Mech. P10008) — the modularity-maximizing sibling of
:mod:`.labelprop` (SURVEY.md §2b "label propagation"; the reference engine
has no community operator beyond rank propagation, so this is mandate
breadth, cited against `reference/src/pagerank.v` only for the superstep
loop shape it shares with every iterative kernel here).

Semantics
---------
Undirected weighted Louvain with the standard two-level loop:

1. **Local-move rounds**: every vertex evaluates, against the *current*
   (synchronous/stale) assignment, the modularity gain of leaving its
   community and joining a neighboring one; the winning move per vertex is
   the argmax of the exact integer score

       g(C) = 2m * k_{i,C} - k_i * Σtot'_C

   (ΔQ scaled by the positive constant 4m² and shifted by the
   remove-from-current term, with Σtot'_C excluding i itself when C is the
   current community) — ties broken by smallest community label, and a move
   is accepted only when strictly better than staying. All weights are
   integers, so scores are exact BIGINT arithmetic: no float modularity,
   bit-reproducible across partitionings and engines. Overflow contract:
   |score| <= (2m)², so total edge weight 2m must stay < 3e9 per run
   (int64); at larger m, pre-scale weights down.
2. **Contraction**: when a phase's rounds stop improving, communities are
   relabeled to their minimum member id (determinism), collapsed into
   super-vertices, and edge weights summed (intra-community weight becomes
   the super-vertex self-loop, kept in the same "2e" convention the degree
   sums expect). Phases repeat on the contracted graph until no vertex
   moves.

Synchronous moves computed on stale state can oscillate (the classic
two-vertex swap) or jointly overshoot; two standard distributed-Louvain
guards make every accepted round a *certified* improvement:

- **parity gating**: in round r only vertices with ``(id + r) % 2 == 0``
  may move, which breaks symmetric swap cycles;
- **monotone-Q guard**: after applying a round's moves the exact integer
  objective ``QN = Σ_c (2m * in2_c - tot_c²)`` (Q scaled by 4m²) is
  recomputed; a round that fails to increase QN is reverted and ends the
  phase. Louvain is a hill-climbing heuristic — this keeps the distributed
  variant a hill climb too, and makes termination a theorem (QN is integer,
  bounded, and strictly increases every kept round).

100-TB plan shape
-----------------
Per round: one join of the (a-partitioned, persisted) adjacency against the
V-sized assignment to build candidate community weights, two map-side-
combined aggregates (Σtot by community, candidates by (vertex, community)),
one ``max_by`` argmax agg, and two scalar actions (move count + QN). The
assignment state is lazily localCheckpoint'ed per round (same exponential-
lineage fix as components.py/labelprop.py). Contraction shrinks the edge
set by the community count ratio, so later phases are near-free. No
per-row Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _num_partitions(df: DataFrame) -> int:
    return max(df.sparkSession.sparkContext.defaultParallelism, 8)


def _symmetrize(edges: DataFrame, weight_col: str | None) -> DataFrame:
    """(a, b, w) with both orientations for a != b (parallel/reverse edges
    sum their weights — directed inputs are read as undirected multi-edges)
    and self-loops carried as one (a, a, 2w) row, the "2e" convention under
    which ``deg = groupBy(a).sum(w)`` is the Louvain degree directly."""
    w = (F.col(weight_col) if weight_col else F.lit(1)).cast("long")
    e = edges.select(
        F.col("src").cast("long").alias("a"),
        F.col("dst").cast("long").alias("b"),
        w.alias("w"),
    )
    nonloop = e.filter(F.col("a") != F.col("b"))
    sym = nonloop.unionByName(
        nonloop.select(F.col("b").alias("a"), F.col("a").alias("b"), "w")
    )
    loops = e.filter(F.col("a") == F.col("b")).select(
        "a", "b", (F.col("w") * 2).alias("w")
    )
    return sym.unionByName(loops).groupBy("a", "b").agg(F.sum("w").alias("w"))


def _qn(sym: DataFrame, comm: DataFrame, m2: int) -> int:
    """Exact integer objective QN = Σ_c (2m*in2_c - tot_c²) = Q * 4m²."""
    ca = comm.select(F.col("id").alias("a"), F.col("c").alias("__ca"))
    cb = comm.select(F.col("id").alias("b"), F.col("c").alias("__cb"))
    in2 = (
        sym.join(ca.hint("shuffle_hash"), "a")
        .join(cb.hint("shuffle_hash"), "b")
        .filter(F.col("__ca") == F.col("__cb"))
        .agg(F.coalesce(F.sum("w"), F.lit(0)).alias("s"))
    )
    deg = sym.groupBy("a").agg(F.sum("w").alias("k"))
    tot2 = (
        comm.join(deg.withColumnRenamed("a", "id").hint("shuffle_hash"), "id")
        .groupBy("c")
        .agg(F.sum("k").alias("tot"))
        .agg(F.coalesce(F.sum(F.col("tot") * F.col("tot")), F.lit(0)).alias("s"))
    )
    row_in = in2.first()["s"]
    row_tot = tot2.first()["s"]
    return int(m2) * int(row_in) - int(row_tot)


def _local_moves(
    sym: DataFrame, m2: int, max_rounds: int, p: int
) -> tuple[DataFrame, bool]:
    """One Louvain phase: parity-gated synchronous moves until no vertex
    moves or the monotone-QN guard trips. Returns ((id, c), any_move)."""
    deg = (
        sym.groupBy("a")
        .agg(F.sum("w").alias("k"))
        .withColumnRenamed("a", "id")
        .repartition(p, "id")
        .persist()
    )
    comm = deg.select("id", F.col("id").alias("c")).localCheckpoint(eager=False)
    nb = sym.filter(F.col("a") != F.col("b"))
    prev_qn = _qn(sym, comm, m2)
    any_move = False
    for r in range(max_rounds):
        tot = (
            comm.join(deg.hint("shuffle_hash"), "id")
            .groupBy("c")
            .agg(F.sum("k").alias("tot"))
        )
        # weight from each vertex into each neighboring community, plus an
        # explicit zero row for the current community so the stay-score
        # always exists (a vertex may have no neighbor left at home)
        cand = (
            nb.join(
                comm.select(F.col("id").alias("b"), F.col("c").alias("cb")).hint(
                    "shuffle_hash"
                ),
                "b",
            )
            .groupBy("a", "cb")
            .agg(F.sum("w").alias("kic"))
            .unionByName(
                comm.select(
                    F.col("id").alias("a"),
                    F.col("c").alias("cb"),
                    F.lit(0).cast("long").alias("kic"),
                )
            )
            .groupBy("a", "cb")
            .agg(F.sum("kic").alias("kic"))
        )
        scored = (
            cand.join(deg.select(F.col("id").alias("a"), "k").hint("shuffle_hash"), "a")
            .join(
                comm.select(F.col("id").alias("a"), F.col("c").alias("cd")).hint(
                    "shuffle_hash"
                ),
                "a",
            )
            .join(tot.select(F.col("c").alias("cb"), "tot").hint("shuffle_hash"), "cb")
            .select(
                "a",
                "cb",
                "cd",
                (
                    F.lit(int(m2)) * F.col("kic")
                    - F.col("k")
                    * (
                        F.col("tot")
                        - F.when(F.col("cb") == F.col("cd"), F.col("k")).otherwise(
                            F.lit(0)
                        )
                    )
                ).alias("score"),
            )
        )
        best = scored.groupBy("a").agg(
            F.max_by(
                F.col("cb"), F.struct(F.col("score"), (-F.col("cb")).alias("nc"))
            ).alias("best_c"),
            F.max(F.col("score")).alias("best_s"),
            F.max(F.when(F.col("cb") == F.col("cd"), F.col("score"))).alias("stay_s"),
        )
        gated = (F.col("id") + F.lit(r)) % 2 == 0
        nxt = (
            comm.join(
                best.withColumnRenamed("a", "id").hint("shuffle_hash"), "id", "left"
            )
            .select(
                "id",
                F.when(
                    gated
                    & F.col("best_c").isNotNull()
                    & (F.col("best_s") > F.col("stay_s"))
                    & (F.col("best_c") != F.col("c")),
                    F.col("best_c"),
                )
                .otherwise(F.col("c"))
                .alias("c"),
                F.col("c").alias("__prev"),
            )
            .localCheckpoint(eager=False)
        )
        n_moved = nxt.filter(F.col("c") != F.col("__prev")).count()
        if n_moved == 0:
            break
        new_qn = _qn(sym, nxt.select("id", "c"), m2)
        if new_qn <= prev_qn:  # stale-state overshoot: revert, end phase
            break
        comm = nxt.select("id", "c").localCheckpoint(eager=False)
        prev_qn = new_qn
        any_move = True
    deg.unpersist()
    return comm.select("id", "c"), any_move


def louvain(
    edges: DataFrame,
    weight_col: str | None = None,
    max_phases: int = 5,
    max_rounds: int = 20,
    num_partitions: int | None = None,
) -> DataFrame:
    """Return ``(id, community)`` — community labels are the minimum member
    id of each final community (deterministic, repartition-stable)."""
    p = num_partitions or _num_partitions(edges)
    sym = _symmetrize(edges, weight_col).repartition(p, "a").persist()
    m2 = int(sym.agg(F.coalesce(F.sum("w"), F.lit(0)).alias("s")).first()["s"])
    mapping = (
        sym.select(F.col("a").alias("orig"))
        .distinct()
        .select("orig", F.col("orig").alias("node"))
        .localCheckpoint(eager=False)
    )
    if m2 == 0:
        out = mapping.select(F.col("orig").alias("id"), F.col("node").alias("community"))
        sym.unpersist()
        return out
    for _ in range(max_phases):
        comm, moved = _local_moves(sym, m2, max_rounds, p)
        if not moved:
            break
        # relabel each community to its minimum member id (stable labels,
        # and the planted oracle's closed form)
        rel = comm.groupBy("c").agg(F.min("id").alias("__lbl"))
        comm = comm.join(rel.hint("shuffle_hash"), "c").select(
            "id", F.col("__lbl").alias("c")
        )
        mapping = (
            mapping.join(
                comm.withColumnRenamed("id", "node").hint("shuffle_hash"), "node"
            )
            .select("orig", F.col("c").alias("node"))
            .localCheckpoint(eager=False)
        )
        ca = comm.select(F.col("id").alias("a"), F.col("c").alias("__ca"))
        cb = comm.select(F.col("id").alias("b"), F.col("c").alias("__cb"))
        contracted = (
            sym.join(ca.hint("shuffle_hash"), "a")
            .join(cb.hint("shuffle_hash"), "b")
            .groupBy(F.col("__ca").alias("a"), F.col("__cb").alias("b"))
            .agg(F.sum("w").alias("w"))
            .repartition(p, "a")
            .persist()
        )
        contracted.count()  # materialize before dropping the parent
        sym.unpersist()
        sym = contracted
    out = mapping.select(
        F.col("orig").alias("id"), F.col("node").alias("community")
    ).localCheckpoint()
    sym.unpersist()
    return out
