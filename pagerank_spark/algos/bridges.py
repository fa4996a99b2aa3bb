"""Distributed bridge detection — spanning forest + cycle-tag XOR.

A bridge is an edge whose removal disconnects its component. The classic
sequential answer is Tarjan's DFS low-link — inherently serial. The
distributed form used here is the cycle-space tagging argument
(Tarjan-Vishkin 1985 biconnectivity family; Pritchard 2006 "cycle space"
formulation — public methodology):

1. Build a spanning forest T (Borůvka MSF under unit weights — the
   engine's existing kernel; deterministic under the (w, a, b) total
   order). Non-tree edges are never bridges.
2. Give every NON-tree edge a pseudo-random 61-bit tag (a deterministic
   multiplicative mix of its endpoints — replayable cross-engine, unlike
   xxhash); every vertex accumulates the XOR of its incident non-tree
   tags.
3. Root every tree at its component's min vertex (one min-label CC over
   tree edges) and orient child->parent by level-synchronous BFS from the
   roots (diameter-bound supersteps — the documented cost; the pointer-
   doubling alternative trades supersteps for edge copies).
4. Bottom-up XOR rollup of vertex tags (the tree_rollup recurrence with
   XOR in place of sum — size-based convergence is shared). The subtree
   XOR at child v equals the XOR of tags of non-tree edges with EXACTLY
   one endpoint below v (both-endpoints-inside tags cancel pairwise) —
   i.e. the tags of the edges crossing the (subtree, rest) cut.
5. Tree edge (v, parent v) is a bridge iff that XOR is 0: no non-tree
   edge re-connects the subtree. A false zero needs the XOR of a
   non-empty crossing set to vanish — ~2^-61 per edge for random-like
   tags; the double-mix tag below (two coprime ~2^31 pre-mod primes,
   XORed) rules out the structured cancellations a single modulus admits
   for dense sequential ids, so the random-tag estimate is the operative
   one. Deterministic for any fixed input.

Scale shape: MSF and CC are the engine's existing superstep kernels; the
rollup adds height-many child-sum joins; tags are one projection + one
grouped XOR. No Python anywhere.

Reference parity: none (single-query reference); graph-analytics mandate
breadth (the connectivity-robustness member of the family —
cut vertices/bridges are what percolation and CI curves remove).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bridges", "two_edge_components"]

# endpoint mix: XOR of two independent mixes, each pre-modding ids by a
# distinct prime near 2^31 with multipliers < 2^30 so every product stays
# inside BIGINT under ANSI (max term ~2^61, sum ~2^62). A single pre-mod
# would make edges whose endpoints differ by multiples of the modulus
# collide deterministically (a real hazard with dense sequential ids past
# the modulus); colliding on BOTH mixes needs simultaneous congruences mod
# two coprime ~2^31 primes, i.e. endpoint differences that are multiples of
# their ~2^62 product — unreachable for BIGINT vertex ids arising from row
# numbering. Each mix is plain integer arithmetic, replayable cross-engine.
_TAG = (
    "CAST(("
    " (((a % 2147483647) * 1073741827 + (b % 2147483647) * 998244353)"
    "   % 2305843009213693951)"
    " ^ (((a % 2147483629) * 805306457 + (b % 2147483629) * 919393931)"
    "   % 2305843009213693951)"
    ") AS BIGINT)"
)


def bridges(edges: DataFrame, max_iters: int = 60) -> DataFrame:
    """``(a, b, is_bridge)`` — one row per distinct undirected edge
    (canonical ``a < b``; self-loops dropped). ``max_iters`` bounds BOTH
    the BFS rooting depth and the rollup height (>= tree diameter).
    """
    from .components import connected_components
    from .msf import minimum_spanning_forest

    sess = edges.sparkSession
    par = max(4, sess.sparkContext.defaultParallelism)
    und = (
        edges.select(
            F.least(F.col("src"), F.col("dst")).cast("long").alias("a"),
            F.greatest(F.col("src"), F.col("dst")).cast("long").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint()
    )
    tree = (
        minimum_spanning_forest(
            und.select(
                F.col("a").alias("src"), F.col("b").alias("dst"), F.lit(1).alias("weight")
            )
        )
        .select("a", "b")
        .localCheckpoint()
    )
    nontree = und.join(tree, ["a", "b"], "left_anti").localCheckpoint()

    # vertex tag = XOR of incident non-tree edge tags
    tagged = nontree.select("a", "b", F.expr(_TAG).alias("t"))
    vtag = (
        tagged.select(F.col("a").alias("id"), "t")
        .unionByName(tagged.select(F.col("b").alias("id"), "t"))
        .groupBy("id")
        .agg(F.expr("bit_xor(t)").alias("tag"))
    )

    # roots = component min ids over TREE edges; BFS orientation
    cc = connected_components(tree.select(F.col("a").alias("src"), F.col("b").alias("dst")))
    adj = (
        tree.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionByName(tree.select(F.col("b").alias("u"), F.col("a").alias("v")))
        .repartition(par, "u")
        .localCheckpoint()
    )
    # frontier: (id, parent); roots parent = self
    assigned = (
        cc.filter(F.col("id") == F.col("component"))
        .select("id", F.col("id").alias("parent"))
        .localCheckpoint()
    )
    frontier = assigned
    for _ in range(int(max_iters)):
        nxt = (
            adj.join(frontier.select(F.col("id").alias("u")), "u")
            .select(F.col("v").alias("id"), F.col("u").alias("parent"))
            .join(assigned.select("id"), "id", "left_anti")
            .groupBy("id")
            .agg(F.min("parent").alias("parent"))
            .localCheckpoint()
        )
        n_new = nxt.count()
        if n_new == 0:
            break
        assigned = assigned.unionByName(nxt).localCheckpoint()
        frontier = nxt
    else:
        # never break'd: a frontier may remain — verify below
        pass
    n_vertices = (
        tree.select(F.col("a").alias("id"))
        .unionByName(tree.select(F.col("b").alias("id")))
        .distinct()
        .count()
    )
    n_assigned = assigned.count()
    if n_assigned < n_vertices:
        raise ValueError(
            f"bridges: BFS rooting left {n_vertices - n_assigned} vertices"
            f" unassigned after {max_iters} rounds — raise max_iters to at"
            " least the spanning-tree diameter (silently mislabeling them"
            " as non-bridges is not an option)"
        )

    # bottom-up XOR rollup over the child->parent tree (tree_rollup with
    # XOR; n-based convergence). state: (id, parent, x, n)
    child_edges = (
        assigned.filter(F.col("id") != F.col("parent"))
        .repartition(par, "id")
        .localCheckpoint()
    )
    base = assigned.join(vtag, "id", "left").select(
        "id",
        "parent",
        F.coalesce(F.col("tag"), F.lit(0)).alias("tag"),
    )
    state = base.select(
        "id", "parent", "tag", F.col("tag").alias("x"), F.lit(1).cast("long").alias("n")
    ).repartition(par, "id").localCheckpoint()
    for _ in range(int(max_iters)):
        csum = (
            child_edges.select(F.col("id").alias("child"), F.col("parent").alias("pid"))
            .join(
                state.select(F.col("id").alias("child"), "x", "n").hint("shuffle_hash"),
                "child",
            )
            .groupBy("pid")
            .agg(F.expr("bit_xor(x)").alias("cx"), F.sum("n").alias("cn"))
        )
        nxt = (
            state.select("id", "parent", "tag", F.col("n").alias("pn"))
            .join(csum.hint("shuffle_hash"), F.col("id") == F.col("pid"), "left")
            .select(
                "id",
                "parent",
                "tag",
                F.expr("tag ^ COALESCE(cx, CAST(0 AS BIGINT))").alias("x"),
                (F.lit(1) + F.coalesce(F.col("cn"), F.lit(0))).cast("long").alias("n"),
                "pn",
            )
            .localCheckpoint()
        )
        changed = nxt.filter(F.col("n") != F.col("pn")).count()
        state = nxt.drop("pn")
        if changed == 0:
            break

    # tree edge (v, parent v): bridge iff subtree xor == 0
    verdict = state.filter(F.col("id") != F.col("parent")).select(
        F.least(F.col("id"), F.col("parent")).alias("a"),
        F.greatest(F.col("id"), F.col("parent")).alias("b"),
        (F.col("x") == 0).cast("long").alias("is_bridge"),
    )
    return und.join(verdict, ["a", "b"], "left").select(
        "a", "b", F.coalesce(F.col("is_bridge"), F.lit(0)).cast("long").alias("is_bridge")
    )


def two_edge_components(edges: DataFrame, max_iters: int = 60) -> DataFrame:
    """``(id, component)`` — 2-edge-connected components: the equivalence
    classes of "connected even after any single edge fails", i.e.
    connected components after deleting every bridge. The robustness
    partition an SRE actually wants from a link graph (which page/host
    clusters survive a single link failure). Pure composition:
    :func:`bridges` -> anti-join -> the engine's min-label CC kernel;
    vertices isolated by bridge removal label themselves.
    """
    from .components import connected_components

    br = bridges(edges, max_iters=max_iters)
    keep = br.filter(F.col("is_bridge") == 0).select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    )
    verts = (
        br.select(F.col("a").alias("id"))
        .unionByName(br.select(F.col("b").alias("id")))
        .distinct()
    )
    cc = connected_components(keep)
    return verts.join(cc, "id", "left").select(
        "id", F.coalesce(F.col("component"), F.col("id")).alias("component")
    )
