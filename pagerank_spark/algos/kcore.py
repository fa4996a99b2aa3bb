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


def onion_layers(edges: DataFrame, max_rounds: int = 16) -> DataFrame:
    """Onion decomposition (Hébert-Dufresne, Grochow & Allard 2016,
    Scientific Reports — public methodology): synchronized min-degree
    peeling. Each round removes EVERY vertex whose current degree equals
    the graph's current minimum (isolated vertices peel at min 0), so the
    layer index refines coreness with intra-core depth — and the
    synchronized rounds make it deterministic and SQL-unrollable.

    Keeps an explicit alive-vertex table (edge lists lose isolated
    vertices silently); per round: one degree aggregation, an in-plan
    broadcast of the one-row global min (no driver round-trip for the
    threshold), two semi-joins to shrink the edge set, and eager
    localCheckpoints to truncate lineage. One count action per round for
    termination — same superstep shape and cost as :func:`k_core`.

    Returns ``(id, layer, k_peel)`` for every vertex; ``k_peel`` is the
    minimum degree at the vertex's peel round (its coreness).
    """
    p = _num_partitions(edges)
    sym = (
        edges.select("src", "dst")
        .unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .dropDuplicates(["src", "dst"])
        .repartition(p, "src")
    ).localCheckpoint()
    verts = sym.select(F.col("src").alias("id")).dropDuplicates().localCheckpoint()

    out = None
    cur_e, cur_v = sym, verts
    for layer in range(1, max_rounds + 1):
        deg = (
            cur_v.join(
                cur_e.groupBy("src").count().withColumnRenamed("src", "id"), "id", "left"
            )
            .select("id", F.coalesce("count", F.lit(0)).alias("c"))
        )
        m = deg.agg(F.min("c").alias("m"))
        drop = (
            deg.crossJoin(F.broadcast(m))
            .where(F.col("c") <= F.col("m"))
            .select(
                "id",
                F.lit(layer).cast("long").alias("layer"),
                F.col("m").cast("long").alias("k_peel"),
            )
            .localCheckpoint()
        )
        if drop.count() == 0:
            break
        out = drop if out is None else out.unionByName(drop)
        dropped = drop.select("id")
        cur_v = cur_v.join(dropped, "id", "left_anti").localCheckpoint()
        cur_e = (
            cur_e.join(dropped.withColumnRenamed("id", "src"), "src", "left_anti")
            .join(dropped.withColumnRenamed("id", "dst"), "dst", "left_anti")
            .select("src", "dst")
            .localCheckpoint()
        )
    return out
