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

Two physical modes share the same semantics:

- ``exploded`` (default): pure-Catalyst, codegen'd end-to-end and
  oracle-replayable — but each hop moves E x D ROWS, so at D in the
  hundreds-plus the per-row overhead (hash, sort, row headers) dominates.
- ``arrow``: the wide-D path — embeddings stay ARRAYS through the gather
  join (E rows per hop, D-fold fewer), then one ``mapInArrow`` over
  dst-partitioned batches does the per-partition NumPy matrix mean. The
  list column's Arrow values buffer reshapes ZERO-COPY into the (n, D)
  matrix, ids factorize vectorized, and ``np.add.at`` scatter-adds — no
  pandas objects, no per-row Python in either direction. (A
  ``mapInPandas`` variant was measured 6-15x slower: nested arrays
  materialize one ndarray object per row, and flattening to D double
  columns doubles the JVM-side Arrow writer cost.)

``mode="auto"`` probes the feature dimension once and picks ``arrow`` at
D >= 384: measured on local[32] at 1M edges, exploded wins at D<=256
(2.1s vs 2.7s per hop) but fails to build its shuffle-hash relation at
D=1024 where arrow completes (23.6s) — see BENCH/BASELINE.md.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .pagerank import _num_partitions

# "auto" mode's exploded->arrow crossover dimension. 384 is the crossover
# MEASURED ON THIS SANDBOX (local[32], 1M edges — BENCH/BASELINE.md): the
# exploded path's (id, pos, val) row volume scales with D while the arrow
# path's per-row cost is nearly D-flat, so on a real cluster with slower
# shuffle fabric than a single box's shared memory the crossover moves
# DOWN (more shuffle bytes saved per arrow row) — re-measure one hop at
# your D and set the env var or pass arrow_min_dim explicitly.
ARROW_MODE_MIN_DIM = int(__import__("os").environ.get("PAGERANK_SPARK_ARROW_MIN_DIM", "384"))


def _make_mean_by_id_arrow(d: int):
    """Per-partition grouped matrix mean over Arrow RecordBatches of
    ``(dst int64, embedding list<double>)``.

    Per batch: the list column's contiguous values buffer reshapes
    zero-copy into the (n, d) matrix, ids factorize (vectorized
    dictionary), and ``np.add.at`` scatter-adds rows into a partial-sum
    matrix; partials across batches combine the same way, so memory is
    O(unique ids x d) regardless of batch count. One partition's dst rows
    arrive complete (upstream repartition on dst), so the yielded means
    are final. Output is rebuilt as one flat values buffer + offsets —
    no per-row Python anywhere."""

    def mean_by_id(batches: "Iterator") -> "Iterator":
        import numpy as np
        import pandas as pd
        import pyarrow as pa

        parts = []
        for b in batches:
            n = b.num_rows
            if not n:
                continue
            ids = b.column(0).to_numpy()
            m = b.column(1).flatten().to_numpy(zero_copy_only=False).reshape(n, d)
            codes, uniq = pd.factorize(ids)
            s = np.zeros((len(uniq), d))
            np.add.at(s, codes, m)
            c = np.bincount(codes, minlength=len(uniq)).astype(np.float64)
            parts.append((uniq, s, c))
        if not parts:
            return
        ids = np.concatenate([u for u, _, _ in parts])
        s = np.vstack([x for _, x, _ in parts])
        c = np.concatenate([x for _, _, x in parts])
        codes, uniq = pd.factorize(ids)
        s2 = np.zeros((len(uniq), d))
        np.add.at(s2, codes, s)
        c2 = np.zeros(len(uniq))
        np.add.at(c2, codes, c)
        flat = (s2 / c2[:, None]).ravel()
        lst = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (len(uniq) + 1) * d, d, dtype=np.int32)),
            pa.array(flat, type=pa.float64()),
        )
        yield pa.RecordBatch.from_arrays(
            [pa.array(uniq, type=pa.int64()), lst], ["id", "embedding"]
        )

    return mean_by_id


def neighborhood_mean(
    edges: DataFrame,
    features: DataFrame,
    hops: int = 1,
    id_col: str = "id",
    vec_col: str = "embedding",
    num_partitions: int | None = None,
    mode: str = "exploded",
    arrow_min_dim: int | None = None,
) -> DataFrame:
    """Propagate features ``hops`` steps; returns ``(id, embedding)`` with
    the aggregated vector (double array, same dimension as the input).

    ``edges`` is directed ``(src, dst)``; aggregation gathers along edge
    direction (src -> dst) and always includes the vertex itself (an
    implicit self-loop). Vertices absent from ``features`` contribute and
    receive nothing (inner gather join) — align the tables beforehand.

    ``mode``: ``"exploded"`` (pure Catalyst, (id,pos,val) rows),
    ``"arrow"`` (array-valued gather + per-partition NumPy matrix mean;
    the wide-D path), or ``"auto"`` (one schema probe, arrow at D >=
    ``arrow_min_dim``, defaulting to the module-level
    ``ARROW_MODE_MIN_DIM`` — a sandbox-measured constant, overridable via
    ``PAGERANK_SPARK_ARROW_MIN_DIM``; on real clusters the crossover
    moves down, see the constant's comment). The two modes differ only in
    float summation
    order (1-ulp; parity-tested in tests/test_gnn.py). Arrow mode requires
    fixed-width, non-null vectors (the zero-copy reshape is what makes it
    fast); exploded mode tolerates ragged input.
    """
    if hops < 1:
        raise ValueError("hops must be >= 1")
    if mode not in ("exploded", "arrow", "auto"):
        raise ValueError(f"mode must be 'exploded', 'arrow' or 'auto', got {mode!r}")
    if mode == "auto":
        crossover = ARROW_MODE_MIN_DIM if arrow_min_dim is None else int(arrow_min_dim)
        probe = features.select(F.size(F.col(vec_col)).alias("d")).first()
        mode = "arrow" if probe and (probe["d"] or 0) >= crossover else "exploded"
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

    if mode == "arrow":
        probe = features.select(F.size(F.col(vec_col)).alias("d")).first()
        d = int(probe["d"]) if probe else 0
        if d <= 0:
            raise ValueError("arrow mode needs non-empty feature vectors")
        fn = _make_mean_by_id_arrow(d)
        state = features.select(
            F.col(id_col).alias("id"), F.col(vec_col).cast("array<double>").alias("embedding")
        ).repartition(p, "id")
        for _ in range(hops):
            gathered = (
                e.join(state.hint("shuffle_hash"), e.src == state.id, "inner")
                .select("dst", "embedding")
                .repartition(p, "dst")
            )
            # a Python node per hop: truncate lineage
            state = gathered.mapInArrow(
                fn, schema="id long, embedding array<double>"
            ).localCheckpoint()
        return state.select("id", F.col("embedding").alias(vec_col))

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


KNUTH = 2654435761  # 2^32/phi (operators/packing.py)
MIX = 2246822519  # xxhash PRIME32_2
M31 = 1 << 31


def sample_neighbors(
    edges: DataFrame,
    k: int,
    seed: int = 0,
    src_col: str = "src",
    dst_col: str = "dst",
) -> DataFrame:
    """GraphSAGE minibatch fan-out: at most ``k`` out-neighbors per vertex.

    Selection is a deterministic hash priority over the EDGE (not RNG):
    ``prio = ((src*KNUTH + dst) mod 2^31 + seed) mod 2^31 * MIX + 1 mod
    2^31`` — the seed enters BEFORE a multiplicative round (an additive-only
    seed would shift every priority equally and never change the ranking) —
    pure BIGINT arithmetic, so the sample is identical across engines,
    runs, and repartitionings (the property a resumable training pipeline
    needs: re-running a failed epoch samples the SAME subgraph). Different
    ``seed`` values give independent fan-outs per layer/epoch.

    Physical plan: one window ranked per ``src`` partition — the state is
    partitioned by the sampling key, so at 100x the window never
    single-partitions; skewed hubs bound their own partition at deg(hub)
    rows, which is exactly the row set the operator must rank. Ties on
    priority break by ``dst`` ascending (total order, hash-stable).

    Ids must be < 2^31 (packing.hash_split contract) so products fit int64
    under ANSI.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    src, dst = F.col(src_col), F.col(dst_col)
    h1 = F.pmod(src * F.lit(KNUTH) + dst, F.lit(M31))
    prio = F.pmod(
        F.pmod(h1 + F.lit(seed), F.lit(M31)) * F.lit(MIX) + F.lit(1), F.lit(M31)
    )
    w = Window.partitionBy(src_col).orderBy(prio.asc(), dst.asc())
    return (
        edges.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
