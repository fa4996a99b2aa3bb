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
  broadcast edge list.

Driver traffic per augmentation is O(path length) rows. The practical
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
            if flags["hit"] == 1:
                found = True
                break
            frontier = nxt.select("id")
        if not found:
            break
        # parent-chain walk: O(depth) one-row lookups against the visited
        # table — driver traffic stays O(path length), never O(|visited|)
        path = []
        cur = sink
        while cur != source:
            p = visited.filter(F.col("id") == cur).collect()[0]["parent"]
            path.append((p, cur))
            cur = p
        caps = {
            (r["u"], r["v"]): r["cap"]
            for r in pos.join(
                spark.createDataFrame(path, "u long, v long"), ["u", "v"]
            ).collect()
        }
        bottleneck = min(caps[pe] for pe in path)
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
    termination guarantee), walks the parent chain back (O(depth) tiny
    driver actions), and applies the bottleneck update with one join.
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
