"""Connected components via min-label hash-join propagation + pointer jumping.

Each vertex starts labeled with its own id. Every superstep does two moves:

1. **neighbor-min propagation** (the small-star-style hash join): each vertex
   takes the min of its label and its neighbors' labels over the symmetrized
   edge set — one gather-join + groupBy(min), the same shuffle shape as a
   PageRank superstep.
2. **pointer jumping** (the large-star-style contraction): each vertex then
   replaces its label with its *label's* label (``label = component[label]``,
   one self-join on the label column). This squares the propagation distance
   per superstep, so convergence is O(log diameter) supersteps instead of
   O(diameter) — mandatory at transcript scale, where a single long-running
   conversation is a path graph (a 10^6-turn conversation would otherwise
   need 10^6 supersteps).

Lineage: every superstep ends in an eager ``localCheckpoint`` — the state is
referenced multiple times per superstep, so without truncation the logical
plan grows exponentially (see algos/pagerank.py docstring).

Golden property used by tests: transcript edges are intra-conversation, so
components == conversations exactly (FIXTURES.md §2). Labels are min vertex
ids — deterministic and exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .pagerank import _num_partitions


def connected_components(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iters: int = 50,
    checkpointer=None,
    num_partitions: int | None = None,
    init_labels: DataFrame | None = None,
) -> DataFrame:
    """Return ``(id, component)`` where component = min vertex id reachable
    in the undirected sense. Deterministic and exact.

    ``checkpointer`` (plans.checkpoint.Checkpointer) commits the label
    vector + frontier size per superstep; a rerun with the same checkpointer
    resumes from the last committed superstep (north-rule resumability).

    ``init_labels``: ``(id, component)`` warm start for INCREMENTAL refresh
    over a grown edge table — seed known vertices with their previous
    component label (which is the min id of the old component, so the
    min-label fixpoint over the new graph is unchanged: min over merged
    components of old labels and new ids == true min vertex id). Old
    components are pre-collapsed, so supersteps track the diameter of the
    NEW structure, not the whole graph. Vertices absent from
    ``init_labels`` start at their own id, exactly like a cold run.
    """
    p = num_partitions or _num_partitions(edges)
    sym = (
        edges.select("src", "dst")
        .unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .dropDuplicates(["src", "dst"])
        .repartition(p, "src")
        .persist()
    )
    if vertices is not None:
        verts = vertices.select("id")
    else:
        verts = sym.select(F.col("src").alias("id")).dropDuplicates()

    start = 0
    labels = None
    if checkpointer is not None:
        resumed = checkpointer.latest()
        if resumed is not None:
            start, state, extra = resumed
            if extra.get("frontier") == 0:
                sym.unpersist()
                return state.select("id", "component")
            labels = state.select("id", "component").repartition(p, "id").localCheckpoint(eager=False)
    if labels is None:
        if init_labels is not None:
            seed = init_labels.select(
                F.col("id").alias("__sid"), F.col("component").alias("__scomp")
            )
            labels = (
                verts.join(seed, verts.id == F.col("__sid"), "left")
                .select("id", F.coalesce(F.col("__scomp"), F.col("id")).alias("component"))
                .repartition(p, "id")
                .localCheckpoint(eager=False)
            )
        else:
            labels = verts.select("id", F.col("id").alias("component")).repartition(p, "id").localCheckpoint(eager=False)

    for it in range(start, max_iters):
        # 1. neighbor-min propagation (shuffle-hash: labels are never
        # broadcastable at target scale and SHJ skips SMJ sorts)
        neighbor_min = (
            sym.join(labels.hint("shuffle_hash"), sym.src == labels.id, "inner")
            .groupBy("dst")
            .agg(F.min("component").alias("nbr_min"))
        )
        stepped = labels.join(neighbor_min.hint("shuffle_hash"), labels.id == neighbor_min.dst, "left").select(
            labels.id,
            F.least(labels.component, F.coalesce(F.col("nbr_min"), labels.component)).alias("component"),
            labels.component.alias("prev"),
        )
        # lazy persist: stepped feeds both sides of the pointer-jump join;
        # without the cache the neighbor-min subtree executes twice
        stepped = stepped.persist()
        # 2. pointer jumping: component <- component[component]
        lut = stepped.select(F.col("id").alias("__lid"), F.col("component").alias("__lcomp"))
        jumped = stepped.join(lut.hint("shuffle_hash"), stepped.component == F.col("__lid"), "left").select(
            stepped.id,
            F.coalesce(F.col("__lcomp"), stepped.component).alias("component"),
            stepped.prev,
        )
        labels = jumped.localCheckpoint(eager=False)
        changed = labels.filter(F.col("component") != F.col("prev")).count()
        stepped.unpersist()
        if checkpointer is not None:
            checkpointer.commit(it + 1, labels.select("id", "component"), {"frontier": changed})
        if changed == 0:
            break

    sym.unpersist()
    return labels.select("id", "component")
