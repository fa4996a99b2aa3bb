"""k-core decomposition via synchronized iterative peeling.

The k-core of an undirected graph is the maximal subgraph where every vertex
has degree >= k. Computed by peeling: each round drops every vertex whose
degree among *surviving* vertices is < k, until a fixed point. Synchronized
rounds (all sub-k vertices drop together) make the result deterministic and
SQL-unrollable for the oracle gate.

Scale shape: the surviving edge set is re-filtered and checkpointed each
round — it only shrinks, so per-round cost is bounded by the current core
candidate set, and the filter is two semi-joins (src alive, dst alive) with
the same shuffle shape as a PageRank superstep. Eager localCheckpoint per
round truncates lineage (the edge set is referenced twice per round).

Reference parity note: the reference accelerator has no k-core (it is a
single-query PageRank engine); this operator is part of the §2b extended
algorithm surface mandated by BASELINE.json (link-graph analytics engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .pagerank import _num_partitions


def k_core(
    edges: DataFrame,
    k: int = 3,
    rounds: int | None = None,
    max_iters: int = 50,
) -> DataFrame:
    """Vertices ``(id)`` of the k-core (undirected, symmetrized, deduped).

    ``rounds`` fixed: exactly that many synchronized peels (the oracle-gate
    form — matches an unrolled SQL peel). ``rounds=None``: peel to the fixed
    point (at most ``max_iters`` rounds, with an action per round to detect
    convergence).
    """
    p = _num_partitions(edges)
    sym = (
        edges.select("src", "dst")
        .unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .dropDuplicates(["src", "dst"])
        .repartition(p, "src")
    ).localCheckpoint()

    cur = sym
    alive = None
    n_prev = None
    total = rounds if rounds is not None else max_iters
    for _ in range(max(1, total)):
        # survivors of this peel: vertices with >= k neighbors among the
        # current candidate edge set (symmetrized, so src covers everyone)
        alive = (
            cur.groupBy("src").count().filter(F.col("count") >= k).select(F.col("src").alias("id"))
        ).localCheckpoint()
        # filter both endpoints against the survivor set; the edge set only
        # shrinks, so the semi-joins run over ever-smaller inputs
        cur = (
            cur.join(alive.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(alive.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .select("src", "dst")
        ).localCheckpoint()
        if rounds is None:
            n_cur = cur.count()
            if n_prev is not None and n_cur == n_prev:
                break
            n_prev = n_cur

    return alive
