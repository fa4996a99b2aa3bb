"""Maximum s-t flow via BFS-augmenting paths (Edmonds & Karp 1972 —
public methodology) — the flow/min-cut family (bottleneck capacity,
network saturation analysis) the engine's other graph operators don't
cover.

Execution shape, stated honestly: augmenting-path max-flow is inherently
SEQUENTIAL in the number of augmentations — no relabeling trick makes the
outer loop data-parallel without changing the algorithm (push-relabel
distributes better but converges non-deterministically under asynchrony).
What IS distributed here is everything inside one augmentation:

* the BFS over the residual graph runs as level-synchronous frontier
  supersteps (join + groupBy-min per level — the same shape as
  :mod:`.paths`), with the parent choice pinned to the minimum
  predecessor id so the shortest path — and therefore every residual
  update, and therefore the whole run — is deterministic;
* the residual-capacity update is one join against the (path-length-sized)
  broadcast edge list;
* the parent-chain extraction never does a per-hop driver round-trip:
  driver-bounded BFS trees (size known exactly from the level counts)
  collect the parent map once; larger trees run lazy pointer doubling
  into one path-length-sized collect.

Driver traffic per augmentation is O(min(|BFS tree|, 1M) + path length)
rows across O(BFS depth) jobs. The practical
contract: use this for bounded-augmentation workloads (capacity
bottleneck analysis on aggregated graphs — flows between COMMUNITIES, not
raw vertices); the per-augmentation BFS scales with the graph, the
augmentation count does not shrink with executors.

Reference parity: none (single-kernel reference); link-graph mandate
breadth (SURVEY §2b-adjacent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

__all__ = ["max_flow", "min_cut"]

# BFS trees up to this many vertices collect their parent map in one job
# (a 1M-row (id, parent) map is ~16 MB on the driver); larger trees take
# the distributed pointer-doubling extraction instead.
_PARENT_MAP_COLLECT_MAX = 1_000_000


def _max_flow_state(
    edges: DataFrame,
    source: int,
    sink: int,
    max_augmentations: int,
    max_depth: int,
):
    """Shared Edmonds-Karp core: returns ``(total, n_aug, e, res)`` with
    ``e`` the validated forward edges and ``res`` the FINAL residual —
    :func:`max_flow` reports the value, :func:`min_cut` BFSes the residual
    once more for the canonical source-side cut."""
    spark: SparkSession = edges.sparkSession
    if source == sink:
        raise ValueError("source and sink must differ")
    e = edges.select(
        F.col("src").cast("long").alias("u"),
        F.col("dst").cast("long").alias("v"),
        F.col("cap").cast("long").alias("cap"),
    ).filter(F.col("u") != F.col("v"))
    if e.groupBy("u", "v").count().filter(F.col("count") > 1).limit(1).count() > 0:
        raise ValueError("duplicate (src, dst) edges — pre-aggregate capacities")
    # residual arcs: forward caps + missing reverse arcs at 0 (existing
    # antiparallel edges keep their own capacity and serve as the reverse)
    rev = (
        e.select(F.col("v").alias("u"), F.col("u").alias("v"))
        .join(e.select("u", "v"), ["u", "v"], "left_anti")
        .select("u", "v", F.lit(0).cast("long").alias("cap"))
    )
    res = e.unionByName(rev).localCheckpoint()

    total = 0
    n_aug = 0
    for _ in range(max_augmentations):
        # level-synchronous BFS over positive-capacity arcs, min-parent rule
        pos = res.filter(F.col("cap") > 0).localCheckpoint(eager=False)
        visited = spark.createDataFrame(
            [(source, -1)], "id long, parent long"
        )
        frontier = visited.select("id")
        found = False
        depth_found = 0
        n_visited = 1
        for _depth in range(max_depth):
            nxt = (
                pos.join(frontier, pos.u == frontier.id)
                .groupBy(F.col("v").alias("id"))
                .agg(F.min("u").alias("parent"))
                .join(visited.select(F.col("id").alias("__seen")), F.col("id") == F.col("__seen"), "left_anti")
                .localCheckpoint()
            )
            flags = nxt.agg(
                F.count(F.lit(1)).alias("n"),
                F.coalesce(
                    F.max(F.when(F.col("id") == sink, 1).otherwise(0)), F.lit(0)
                ).alias("hit"),
            ).collect()[0]
            if flags["n"] == 0:
                break
            visited = visited.unionByName(nxt).localCheckpoint()
            n_visited += flags["n"]
            if flags["hit"] == 1:
                found = True
                depth_found = _depth + 1
                break
            frontier = nxt.select("id")
        if not found:
            break
        # parent-chain extraction (round-5): the old walk did ONE driver
        # round-trip per hop (O(depth) collect jobs per augmentation).
        # Common path: the BFS tree size is known exactly from the level
        # counts — when it is driver-bounded, collect the parent map ONCE
        # and walk it in memory (1 job, O(|visited|) rows but that bound
        # was just measured, not hoped for). Fallback for huge trees:
        # pointer doubling — square the parent-jump table ceil(log2(depth))
        # times while folding each jump of the known on-path set into it,
        # all lazily inside the ONE path-sized collect (the self-
        # referencing square doubles the PLAN per round, but rounds <=
        # log2(max_depth) + 1 keeps it ~2 * max_depth nodes).
        if n_visited <= _PARENT_MAP_COLLECT_MAX:
            pmap = {r["id"]: r["parent"] for r in visited.collect()}
            path = []
            cur = sink
            while cur != source:
                p = pmap[cur]
                path.append((p, cur))
                cur = p
            path_edges = spark.createDataFrame(path, "u long, v long")
        else:
            import math

            ptr = visited.select(
                "id",
                F.when(F.col("parent") == F.lit(-1), F.col("id"))
                .otherwise(F.col("parent"))
                .alias("anc"),
            )
            on_path = spark.createDataFrame([(sink,)], "id long")
            rounds = max(1, math.ceil(math.log2(depth_found + 2)))
            for _ in range(rounds):
                on_path = on_path.unionByName(
                    on_path.join(ptr, "id").select(F.col("anc").alias("id"))
                ).distinct()
                ptr = (
                    ptr.join(
                        ptr.select(F.col("id").alias("anc"), F.col("anc").alias("anc2")),
                        "anc",
                    )
                    .select("id", F.col("anc2").alias("anc"))
                )
            path_edges = (
                on_path.join(visited, "id")
                .filter(F.col("parent") != F.lit(-1))
                .select(F.col("parent").alias("u"), F.col("id").alias("v"))
            )
        prows = pos.join(path_edges, ["u", "v"]).select("u", "v", "cap").collect()
        path = [(r["u"], r["v"]) for r in prows]
        bottleneck = min(r["cap"] for r in prows)
        total += bottleneck
        n_aug += 1
        fwd = spark.createDataFrame(
            [(u, v, -bottleneck) for u, v in path]
            + [(v, u, bottleneck) for u, v in path],
            "u long, v long, delta long",
        )
        res = (
            res.join(F.broadcast(fwd), ["u", "v"], "left")
            .select(
                "u",
                "v",
                (F.col("cap") + F.coalesce(F.col("delta"), F.lit(0))).alias("cap"),
            )
            .localCheckpoint()
        )
    return total, n_aug, e, res


def max_flow(
    edges: DataFrame,
    source: int,
    sink: int,
    max_augmentations: int = 64,
    max_depth: int = 32,
) -> DataFrame:
    """One row ``(max_flow, augmentations)`` — exact integer maximum flow
    from ``source`` to ``sink`` over ``(src, dst, cap)`` edges (BIGINT
    capacities; antiparallel edge pairs are fine, self-loops and
    duplicate edges are rejected).

    Residual graph state lives as a DataFrame ``(u, v, cap)`` including
    zero-capacity reverse arcs; each augmentation BFSes source→sink over
    positive-capacity arcs (shortest path — the Edmonds-Karp O(VE²)
    termination guarantee), extracts the parent chain with log-depth
    pointer doubling (one path-sized collect), and applies the bottleneck
    update with one join.
    ``localCheckpoint`` truncates lineage per augmentation (superstep
    discipline).
    """
    spark = edges.sparkSession
    total, n_aug, _, _ = _max_flow_state(
        edges, source, sink, max_augmentations, max_depth
    )
    return spark.createDataFrame(
        [(total, n_aug)], "max_flow long, augmentations long"
    )


def min_cut(
    edges: DataFrame,
    source: int,
    sink: int,
    max_augmentations: int = 64,
    max_depth: int = 32,
) -> DataFrame:
    """The CANONICAL minimum s-t edge cut ``(src, dst, cap)``: run
    Edmonds-Karp to completion, BFS the final residual's positive arcs
    from the source (one more level-synchronous pass), and return every
    original edge crossing from the reachable side to the unreachable
    side. By max-flow/min-cut duality the returned capacities sum to the
    max flow, and because the source-reachable set of the FINAL residual
    is unique (not a property of augmentation order), the cut is
    deterministic — gate-able row for row.
    """
    spark = edges.sparkSession
    _, _, e, res = _max_flow_state(edges, source, sink, max_augmentations, max_depth)
    pos = res.filter(F.col("cap") > 0).localCheckpoint(eager=False)
    reach = spark.createDataFrame([(source,)], "id long").localCheckpoint()
    frontier = reach
    for _ in range(max_depth):
        nxt = (
            pos.join(frontier, pos.u == frontier.id)
            .select(F.col("v").alias("id"))
            .dropDuplicates()
            .join(reach.select(F.col("id").alias("__seen")), F.col("id") == F.col("__seen"), "left_anti")
            .localCheckpoint()
        )
        if nxt.limit(1).count() == 0:
            break
        reach = reach.unionByName(nxt).localCheckpoint()
        frontier = nxt
    src_side = reach.select(F.col("id").alias("u"))
    dst_side = reach.select(F.col("id").alias("v"))
    return (
        e.join(src_side, "u")
        .join(dst_side, "v", "left_anti")
        .select(F.col("u").alias("src"), F.col("v").alias("dst"), "cap")
    )
