"""DAG analytics: topological levels and weighted critical path.

Transcript turn-adjacency graphs (conv-level reply / tool-invocation links
keyed by stable turn ordering — the engine's mandated edge derivation) are
DAGs by construction, and the two standard DAG queries are *depth*
(topological level = longest hop count into a vertex) and *critical path*
(longest weighted path into a vertex — the scheduling / dependency-analysis
primitive, Kelley & Walker 1959, public methodology).

Formulation: the monotone fixpoint

    cp(v) <- max(cp(v), max over in-edges (u, v, w) of cp(u) + w)

from ``cp = 0`` everywhere. On a DAG every longest path ending at ``v``
starts at an in-degree-0 vertex, so the fixpoint IS the longest path from
any source, reached in ``depth`` supersteps. The loop is expressed on the
generic :func:`~pagerank_spark.algos.pregel.pregel` engine — single
max-gather join per superstep over a once-partitioned persisted edge
layout, one action per ``check_every`` block, lineage truncated per block
(the repo-wide superstep discipline).

Cycle handling: on cyclic input the fixpoint diverges (cp grows around the
cycle forever), so non-convergence within ``max_iters`` is the detector —
``critical_path`` raises unless ``allow_unconverged``. This doubles as a
distributed acyclicity check: a graph that converges in ``k`` blocks is
acyclic at least to the witnessed depth.

Scale notes (100-TB lens): state is ``(id, cp)`` — 16 bytes a vertex;
messages are one BIGINT per edge per superstep, map-side max-combined
before the shuffle; supersteps = DAG depth (transcript DAGs: the max
conversation length, not |V|). No Python anywhere in the loop.

Reference parity: none (the reference hard-wires one rank kernel);
link-graph mandate breadth — DAG depth/critical-path over turn adjacency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from . import pregel as pg

__all__ = ["critical_path", "topo_levels", "dag_path_counts"]


def critical_path(
    edges: DataFrame,
    weight_col: str | None = None,
    max_iters: int = 64,
    check_every: int = 4,
    allow_unconverged: bool = False,
) -> DataFrame:
    """Longest weighted path into each vertex of a DAG.

    ``edges`` is ``(src, dst[, weight_col])``; weights must be
    non-negative integers (BIGINT state keeps the fixpoint exact — no
    float accumulation). Returns ``(id, cp)`` for every vertex that
    appears as a src or dst. Raises ``ValueError`` if the fixpoint is not
    reached within ``max_iters`` supersteps (a cycle, or a DAG deeper than
    the budget) unless ``allow_unconverged``.
    """
    w = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    e = edges.select("src", "dst", w.alias("__w"))
    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    res = pg.pregel(
        verts,
        e,
        init={"cp": F.lit(0).cast("long")},
        update={
            "cp": F.greatest(
                F.col("cp"), F.coalesce(pg.msg(), F.lit(0).cast("long"))
            )
        },
        agg=F.max(pg.msg()),
        msg_to_dst=pg.src("cp") + pg.edge("__w"),
        max_iters=max_iters,
        check_every=check_every,
        until_converged=True,
    )
    if not res.converged and not allow_unconverged:
        raise ValueError(
            f"critical_path: no fixpoint within {max_iters} supersteps — "
            "cyclic input or depth over budget"
        )
    return res.vertices.select("id", "cp")


def topo_levels(
    edges: DataFrame, max_iters: int = 64, check_every: int = 4
) -> DataFrame:
    """Topological level (longest hop count into each vertex): the
    unit-weight critical path. ``(id, lvl)``; level 0 = sources."""
    return critical_path(edges, None, max_iters, check_every).select(
        "id", F.col("cp").alias("lvl")
    )


def dag_path_counts(
    edges: DataFrame,
    sources: DataFrame | None = None,
    max_iters: int = 64,
    check_every: int = 4,
    allow_unconverged: bool = False,
) -> DataFrame:
    """Number of distinct source-rooted paths into each DAG vertex plus its
    topological level: ``(id, lvl, n_paths)``.

    ``n_paths(v)`` counts paths of length >= 0 that start at a source and
    end at ``v`` (so every source counts its own length-0 path);
    ``sources`` defaults to the in-degree-0 vertices. The classic DAG DP
    ``cnt(v) = ind(v) + sum over in-edges of cnt(u)`` expressed as a
    sum-gather fixpoint on the pregel engine: iterating it from
    ``cnt = ind`` yields at step t the count of such paths of length <= t,
    which is stationary once t exceeds the depth — so until_converged IS
    the exact answer, and (like :func:`critical_path`) non-convergence
    within ``max_iters`` doubles as the cycle detector. Exact BIGINT
    arithmetic end-to-end; path counts beyond 2^63 overflow (count paths
    on layered slices if your DAG is that dense).

    Scale shape: per superstep one gather join over the once-partitioned
    persisted edge layout + a map-side-combined sum — state is 24 bytes a
    vertex; supersteps = DAG depth, not |V|. Parallel edges are counted as
    distinct paths (multigraph semantics); dedupe upstream if unwanted.
    """
    e = edges.select(F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst"))
    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .distinct()
    )
    if sources is None:
        sources = verts.join(e.select(F.col("dst").alias("id")), "id", "left_anti")
    v_ind = verts.join(
        sources.select(F.col("id"), F.lit(1).cast("long").alias("__src_ind")).distinct(),
        "id",
        "left",
    ).select("id", F.coalesce(F.col("__src_ind"), F.lit(0).cast("long")).alias("__src_ind"))
    res = pg.pregel(
        v_ind,
        e,
        init={
            "ind": F.col("__src_ind"),
            "cnt": F.col("__src_ind"),
        },
        update={"cnt": F.col("ind") + F.coalesce(pg.msg(), F.lit(0).cast("long"))},
        agg=F.sum(pg.msg()),
        msg_to_dst=pg.src("cnt"),
        max_iters=max_iters,
        check_every=check_every,
        until_converged=True,
    )
    if not res.converged and not allow_unconverged:
        raise ValueError(
            f"dag_path_counts: no fixpoint within {max_iters} supersteps - "
            "cyclic input or depth over budget"
        )
    lv = topo_levels(edges, max_iters=max_iters, check_every=check_every)
    return res.vertices.select("id", F.col("cnt").alias("n_paths")).join(lv, "id").select(
        "id", "lvl", "n_paths"
    )
