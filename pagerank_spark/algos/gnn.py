"""GNN-style neighborhood feature aggregation (GraphSAGE-mean family).

``h_0(v) = x(v); h_{t+1}(v) = mean of h_t(u) over u in N_in(v) + {v}``
(self-inclusive mean — every vertex always has at least itself, so no
empty-neighborhood null handling) — the feature-propagation step a
training pipeline runs to attach graph context to per-node embeddings
before model training (SGC / "simplified GCN" preprocessing).

Physical strategy: the feature matrix is EXPLODED ONCE into ``(id, pos,
val)`` rows, iterated ``hops`` times as a co-partitioned gather join +
(dst, pos) grouped mean — identical shuffle discipline to the PageRank
superstep (algos/pagerank.py), with the per-dimension rows playing the
role of rank mass — then re-assembled into arrays once at the end.
Per-hop cost is E x D rows through one shuffle; all JVM, zero UDFs.

100-TB note: for wide embeddings (D in the thousands) the E x D row blowup
favors an Arrow-batched gather (join neighbor ARRAYS, mean them in NumPy
via applyInPandas) — same bytes moved, D-fold fewer rows; this module keeps
the pure-Catalyst form because it is codegen'd end-to-end and
oracle-replayable, and D <= a few hundred covers the common case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .pagerank import _num_partitions


def neighborhood_mean(
    edges: DataFrame,
    features: DataFrame,
    hops: int = 1,
    id_col: str = "id",
    vec_col: str = "embedding",
    num_partitions: int | None = None,
) -> DataFrame:
    """Propagate features ``hops`` steps; returns ``(id, embedding)`` with
    the aggregated vector (double array, same dimension as the input).

    ``edges`` is directed ``(src, dst)``; aggregation gathers along edge
    direction (src -> dst) and always includes the vertex itself (an
    implicit self-loop). Vertices absent from ``features`` contribute and
    receive nothing (inner gather join) — align the tables beforehand.
    """
    if hops < 1:
        raise ValueError("hops must be >= 1")
    p = num_partitions or max(4, _num_partitions(edges))

    e = (
        edges.select("src", "dst")
        .union(  # implicit self-loop: the vertex is part of its own mean
            edges.select(F.col("src").alias("id"))
            .union(edges.select(F.col("dst").alias("id")))
            .dropDuplicates()
            .select(F.col("id").alias("src"), F.col("id").alias("dst"))
        )
        .repartition(p, "src")
        .localCheckpoint()
    )

    state = features.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("pos", "val"),
    ).repartition(p, "id")

    for _ in range(hops):
        state = (
            e.join(state.hint("shuffle_hash"), e.src == state.id, "inner")
            .groupBy(F.col("dst").alias("__id"), "pos")
            .agg(F.avg("val").alias("val"))
            .select(F.col("__id").alias("id"), "pos", "val")
        )

    return state.groupBy("id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "val"))), lambda s: s["val"]
        ).alias(vec_col)
    )
