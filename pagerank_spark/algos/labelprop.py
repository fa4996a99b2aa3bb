"""Label propagation with synchronous frontier updates.

Semantics: labels start as vertex ids; each superstep, every vertex adopts
the most frequent label among its (undirected) neighbors, ties broken by the
smallest label; a vertex with no neighbors keeps its label. Synchronous:
iteration k+1 reads only iteration-k labels (the DataFrame k -> k+1 swap is
the reference's double-buffer, pagerank.v:1121-1127).

Frontier: after each superstep, only vertices whose label changed (extracted
with an anti-join-equivalent filter on the joined old/new pair) count toward
convergence; the loop stops when the frontier is empty or after
``max_iters`` (label propagation can oscillate on bipartite structures — the
cap is semantics, not a workaround).

The mode-per-dst aggregate is two hash aggregations + one window-free argmax
(max_by over a packed (count, -label) struct) — no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .pagerank import _num_partitions


def label_propagation(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    max_iters: int = 20,
    checkpointer=None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Return ``(id, label)`` after synchronous label propagation.

    ``checkpointer`` commits the label vector + frontier size per superstep
    and resumes a rerun from the last committed superstep.
    """
    p = num_partitions or _num_partitions(edges)
    sym = (
        edges.select("src", "dst")
        .unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .dropDuplicates(["src", "dst"])
        # partitioned by src: every superstep joins sym.src == labels.id, so
        # the persisted layout must match the join key (components.py does the
        # same) — otherwise each superstep re-shuffles the whole edge set
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
                return state.select("id", "label")
            labels = state.select("id", "label").repartition(p, "id").localCheckpoint(eager=False)
    if labels is None:
        # lazy localCheckpoint per superstep (see components.py: truncates the
        # exponential plan growth from multiple state references per superstep)
        labels = verts.select("id", F.col("id").alias("label")).repartition(p, "id").localCheckpoint(eager=False)

    for it in range(start, max_iters):
        # count neighbor labels per dst, then argmax by (count desc, label asc)
        votes = (
            sym.join(labels.hint("shuffle_hash"), sym.src == labels.id, "inner")
            .groupBy("dst", "label")
            .agg(F.count(F.lit(1)).alias("votes"))
        )
        winner = votes.groupBy("dst").agg(
            F.max_by(F.col("label"), F.struct(F.col("votes"), (-F.col("label")).alias("neg"))).alias("new_label")
        )
        labels = labels.join(winner.hint("shuffle_hash"), labels.id == winner.dst, "left").select(
            labels.id,
            F.coalesce(F.col("new_label"), labels.label).alias("label"),
            labels.label.alias("prev"),
        ).localCheckpoint(eager=False)
        frontier = labels.filter(F.col("label") != F.col("prev")).count()
        if checkpointer is not None:
            checkpointer.commit(it + 1, labels.select("id", "label"), {"frontier": frontier})
        if frontier == 0:
            break

    sym.unpersist()
    return labels.select("id", "label")


def label_propagation_seeded(
    edges: DataFrame,
    seeds: DataFrame,
    max_iters: int = 20,
    num_partitions: int | None = None,
) -> DataFrame:
    """Semi-supervised label propagation: ``seeds`` is ``(id, label)`` with
    KNOWN classes; every other vertex adopts the most frequent label among
    its labeled (undirected) neighbors each superstep (ties -> smallest
    label), seeds stay CLAMPED, and vertices with no labeled neighbor stay
    unlabeled. Returns ``(id, label, seed)`` for the labeled set only —
    the state is SPARSE and grows monotonically outward from the seeds
    (iteration t holds the seeds' t-hop labeled neighborhood, not V rows).

    The node-classification counterpart of :func:`label_propagation`
    (which detects communities from id-labels); same vote/argmax superstep
    and double-buffer discipline.
    """
    p = num_partitions or _num_partitions(edges)
    sym = (
        edges.select("src", "dst")
        .unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .dropDuplicates(["src", "dst"])
        .repartition(p, "src")
        .localCheckpoint()
    )
    sd = (
        seeds.select("id", "label")
        .dropDuplicates(["id"])
        .repartition(p, "id")
        .localCheckpoint()
    )
    labels = sd.localCheckpoint(eager=False)
    labels.count()

    for _ in range(max_iters):
        votes = (
            sym.join(labels.hint("shuffle_hash"), sym.src == labels.id, "inner")
            .groupBy("dst", "label")
            .agg(F.count(F.lit(1)).alias("votes"))
        )
        winner = votes.groupBy("dst").agg(
            F.max_by(
                F.col("label"), F.struct(F.col("votes"), (-F.col("label")).alias("neg"))
            ).alias("label")
        )
        new_labels = (
            sd.unionByName(
                winner.join(sd.select("id"), winner.dst == sd.id, "left_anti")
                .select(F.col("dst").alias("id"), "label")
            )
            .localCheckpoint(eager=False)
        )
        changed = (
            new_labels.join(
                labels.select("id", F.col("label").alias("__prev")).hint("shuffle_hash"),
                "id",
                "left",
            )
            .filter(F.col("__prev").isNull() | (F.col("__prev") != F.col("label")))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break

    is_seed = sd.select(F.col("id").alias("__sid"))
    return labels.join(is_seed, labels.id == F.col("__sid"), "left").select(
        "id", "label", F.col("__sid").isNotNull().alias("seed")
    )
