"""Arrow/NumPy CSR gather-scatter kernel (the reference's hot loop, vectorized).

The reference's inner loop is: random-gather old ranks by src id
(pagerank.v:1079-1095), segment-sum per dst using CSR offsets
(pagerank.v:1039-1049). Here the same computation runs as a *cogrouped*
pandas kernel per hash bucket:

  - ``edges`` and the rank ``state`` are cogrouped on
    ``bucket = pmod(xxhash64(src|id), P)``, so each kernel call sees one
    bucket's edges together with exactly the rank rows its gathers need —
    the Spark-native version of the reference's "random reads hit the
    partition-local rank array".
  - gather: ``np.searchsorted`` over the bucket's sorted vertex ids + fancy
    indexing (vectorized ``np.take`` — no per-row Python).
  - scatter/pre-aggregation: ``np.bincount`` segment sums by dst INSIDE the
    kernel, so at most one (dst, partial) row per distinct dst per bucket
    crosses the wire — strictly less shuffle than per-edge rows. The final
    ``groupBy(dst).sum`` combines partials.

Edges arrive from :func:`~pagerank_spark.algos.pagerank.prepare_edges` with
the static per-edge gather coefficient attached (real edges only — the
dangling-mass scalar lives on the state's ``dang`` flag, not in the edge
layout). Bucketed+persisted once by the caller, sorted by src within
partitions, so the per-iteration cost is the gather and the segment sum
only — the CSR block layout is effectively built once and reused across
supersteps (north_star requirement).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CONTRIB_SCHEMA = "dst long, partial double"


def bucketize_edges(edges: DataFrame, p: int) -> DataFrame:
    """Add the cogroup key and lay edges out for the kernel: hash-bucketed by
    src, sorted by src within partitions (CSR-like layout, built once).

    ``edges`` must carry ``(src, dst, coef)`` — see ``prepare_edges``.
    """
    return (
        edges.select("src", "dst", "coef")
        .withColumn("bucket", F.pmod(F.xxhash64("src"), F.lit(p)).cast("int"))
        .repartition(p, "bucket")
        .sortWithinPartitions("src")
    )


def _kernel(edf: pd.DataFrame, rdf: pd.DataFrame) -> pd.DataFrame:
    if len(edf) == 0 or len(rdf) == 0:
        return pd.DataFrame({"dst": np.array([], dtype=np.int64), "partial": np.array([], dtype=np.float64)})
    ids = rdf["id"].to_numpy(dtype=np.int64)
    order = np.argsort(ids, kind="stable")
    ids_sorted = ids[order]
    ranks_sorted = rdf["rank"].to_numpy(dtype=np.float64)[order]

    src = edf["src"].to_numpy(dtype=np.int64)
    dst = edf["dst"].to_numpy(dtype=np.int64)
    coef = edf["coef"].to_numpy(dtype=np.float64)
    idx = np.searchsorted(ids_sorted, src)
    # vectorized random gather (pagerank.v:1079-1095); the static per-edge
    # coefficient (w/total_out_weight; 1/out_degree unweighted) makes the
    # scatter one fused multiply
    gathered = ranks_sorted[idx] * coef

    uniq, inverse = np.unique(dst, return_inverse=True)
    sums = np.bincount(inverse, weights=gathered)  # segment sum (pagerank.v:1039-1049)
    return pd.DataFrame({"dst": uniq, "partial": sums})


def csr_contributions(edges_bucketed: DataFrame, state: DataFrame, p: int) -> DataFrame:
    """Per-dst rank contributions via the cogrouped Arrow kernel.

    ``edges_bucketed`` must carry ``bucket`` and ``coef`` columns (see
    :func:`bucketize_edges` — ``coef`` is the static per-edge gather
    coefficient, so ``state`` needs only ``(id, rank, ...)``). Returns
    ``(dst, contrib)``.
    """
    r = state.select(
        "id",
        "rank",
        F.pmod(F.xxhash64("id"), F.lit(p)).cast("int").alias("bucket"),
    )
    cg = edges_bucketed.groupBy("bucket").cogroup(r.groupBy("bucket"))
    partials = cg.applyInPandas(lambda e, s: _kernel(e, s), schema=CONTRIB_SCHEMA)
    return partials.groupBy("dst").agg(F.sum("partial").alias("contrib"))
