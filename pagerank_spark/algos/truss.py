"""k-truss decomposition — iterative triangle-support peeling.

The k-truss is the maximal subgraph in which every edge participates in at
least ``k - 2`` triangles (triangles counted WITHIN the subgraph). Like
k-core (algos/kcore.py) it is computed by peeling, but the removal
criterion is a second-order structure (per-edge triangle support), so each
round re-enumerates triangles over the surviving edge set using the same
degree-ordered orientation + wedge join as algos/triangles.py (the
O(sqrt(E)) oriented out-degree bound is what keeps every round's wedge join
scalable; orientation is recomputed per round because degrees change as
edges fall out — it is only an enumeration device, support totals are
orientation-invariant).

Scale shape per round: one orientation pass (eager localCheckpoint — the
wedge join references it three times), one wedge join, one explode +
grouped count keyed by the canonical edge, one co-keyed left join + filter.
The edge set shrinks monotonically, so round cost decreases; the fixpoint
count check is the round's single action.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .pagerank import _num_partitions
from .triangles import _oriented, _triangle_rows


@dataclass
class TrussResult:
    edges: DataFrame          # (a, b, support) canonical a < b, support >= k-2
    rounds: int
    converged: bool
    edge_history: list = field(default_factory=list)


def k_truss(
    edges: DataFrame,
    k: int,
    max_rounds: int = 30,
    num_partitions: int | None = None,
    checkpointer=None,
) -> TrussResult:
    """Peel to the ``k``-truss of the symmetrized simple graph.

    Returns the surviving canonical edges with their final triangle support
    (valid because the support emitted at the fixpoint round — the round
    that removed nothing — IS the support within the returned subgraph).

    ``checkpointer`` (plans.checkpoint.Checkpointer) commits the surviving
    edge set per peel round (edge-keyed lineage on ``a``); a rerun resumes
    from the last committed round — or returns immediately if the committed
    round was the fixpoint.
    """
    if k < 3:
        raise ValueError("k-truss requires k >= 3 (k=2 is the whole simple graph)")
    p = num_partitions or max(4, _num_partitions(edges))

    start_round = 0
    e = None
    if checkpointer is not None:
        resumed = checkpointer.latest()
        if resumed is not None:
            start_round, state, extra = resumed
            if extra.get("converged"):
                return TrussResult(
                    edges=state.select("a", "b", "support"),
                    rounds=start_round, converged=True,
                    edge_history=[extra.get("edges")],
                )
            e = state.select("a", "b").repartition(p, "a", "b").localCheckpoint()
    if e is None:
        e = (
            edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
            .filter(F.col("a") != F.col("b"))
            .dropDuplicates(["a", "b"])
            .repartition(p, "a", "b")
            .localCheckpoint()
        )
    n = e.count()

    result = TrussResult(edges=e.withColumn("support", F.lit(0)), rounds=start_round, converged=(n == 0))
    result.edge_history.append(n)
    if n == 0:
        return result

    t0 = time.monotonic()
    while result.rounds < max_rounds:
        o = _oriented(e.select(F.col("a").alias("src"), F.col("b").alias("dst"))).localCheckpoint()
        tri = _triangle_rows(o)
        # each triangle supports its three canonical edges
        sup = (
            tri.select(
                F.explode(
                    F.array(
                        F.struct(F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")),
                        F.struct(F.least("a", "c").alias("a"), F.greatest("a", "c").alias("b")),
                        F.struct(F.least("b", "c").alias("a"), F.greatest("b", "c").alias("b")),
                    )
                ).alias("ed")
            )
            .select(F.col("ed.a").alias("a"), F.col("ed.b").alias("b"))
            .groupBy("a", "b")
            .agg(F.count(F.lit(1)).alias("support"))
        )
        kept = (
            e.join(sup.hint("shuffle_hash"), ["a", "b"], "left")
            .select("a", "b", F.coalesce(F.col("support"), F.lit(0)).alias("support"))
            .filter(F.col("support") >= k - 2)
            .localCheckpoint()
        )
        n2 = kept.count()
        result.rounds += 1
        result.edge_history.append(n2)
        if checkpointer is not None:
            checkpointer.commit(
                result.rounds, kept, {"edges": n2, "converged": n2 == n}, id_col="a"
            )
        if n2 == n:
            result.converged = True
            result.edges = kept
            break
        e = kept.select("a", "b").localCheckpoint(eager=False)
        n = n2
        result.edges = kept
        if n == 0:
            result.converged = True
            break
    result.peel_seconds = time.monotonic() - t0  # type: ignore[attr-defined]
    return result
