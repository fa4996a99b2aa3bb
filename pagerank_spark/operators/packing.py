"""Sequence packing and deterministic split assignment for training-data
pipelines.

``pack_chunks`` implements concat-and-chunk packing: documents are laid
end-to-end in a deterministic order and the token stream is cut every
``budget`` tokens (documents may straddle cut points — the standard
pretraining packing discipline). Each document's placement is pure window
arithmetic over the running token total, so the whole operator is one
sort-within-shard window pass — no UDFs, no iteration.

100-TB design: a single global ordering would funnel the cumulative sum
through one partition, so the operator packs WITHIN SHARDS (``shard_col``):
each shard is an independent token stream with its own chunk numbering,
which is exactly how a 1000-executor packing job wants to run (shard =
input file / bucket; chunk ids are (shard, chunk) pairs). The unsharded
default is for small inputs and oracle comparison.

``hash_split`` assigns rows to train/val/test deterministically from the id
via a multiplicative (Knuth) hash — pure BIGINT arithmetic, reproducible
across engines and runs, no RNG state. Unlike ``df.randomSplit`` the
assignment is stable under repartitioning, retries, and incremental reruns
(a document keeps its split forever — the property that prevents train/test
leakage across pipeline re-executions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import token_count

KNUTH = 2654435761  # 2^32 / golden ratio, the classic multiplicative hash


def pack_chunks(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str | None = None,
) -> DataFrame:
    """Per-document packing placement: ``(doc_id[, shard], n_tokens,
    start_offset, first_chunk, last_chunk, n_chunks)`` where chunk c covers
    token offsets [c*budget, (c+1)*budget) of the shard's concatenated
    stream. Zero-token documents occupy no chunk (sentinel -1, n_chunks 0).
    Deterministic order: ``id_col`` ascending within shard.
    """
    if budget <= 0:
        raise ValueError("budget must be positive")
    shard = F.col(shard_col) if shard_col else F.lit(0)
    w = Window.partitionBy(shard).orderBy(F.col(id_col)).rowsBetween(
        Window.unboundedPreceding, -1
    )
    toks = token_count(text_col)
    start = F.coalesce(F.sum(toks).over(w), F.lit(0))
    first = F.floor(start / budget)
    last = F.floor((start + toks - 1) / budget)
    cols = [F.col(id_col).alias("doc_id")]
    if shard_col:
        cols.append(F.col(shard_col).alias("shard"))
    return docs.select(
        *cols,
        toks.alias("n_tokens"),
        start.alias("start_offset"),
        F.when(toks > 0, first).otherwise(F.lit(-1)).alias("first_chunk"),
        F.when(toks > 0, last).otherwise(F.lit(-1)).alias("last_chunk"),
        F.when(toks > 0, last - first + 1).otherwise(F.lit(0)).alias("n_chunks"),
    )


def sliding_windows(
    docs: DataFrame,
    window: int = 128,
    stride: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Overlapping token windows per document (RAG/retrieval chunking and
    long-context SFT example slicing): ``(doc_id, chunk_idx, start_tok,
    n_tokens, chunk)`` where chunk ``c`` holds tokens
    ``[c*stride, c*stride + window)``.

    Coverage rule: windows start at multiples of ``stride``; the last start
    is the smallest multiple with ``start + window >= doc_len``, so every
    token is inside at least one window and the final window may be short
    (never empty). Empty documents emit no rows. The whole operator is one
    codegen'd projection + posexplode — zero shuffles at any corpus size,
    and exact integer offsets so the gate is hash-stable.
    """
    if window <= 0 or stride <= 0:
        raise ValueError("window and stride must be positive")
    if stride > window:
        raise ValueError("stride > window would skip tokens")
    toks = F.filter(
        F.split(F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), r"\s+"),
        lambda t: F.length(t) > 0,
    )
    src = docs.select(F.col(id_col).alias("doc_id"), toks.alias("__t"))
    n = F.size("__t")
    # number of windows: 1 + ceil(max(L - window, 0) / stride)
    n_win = F.lit(1) + F.ceil(
        F.greatest(n - window, F.lit(0)).cast("double") / stride
    ).cast("long")
    chunks = F.transform(
        F.sequence(F.lit(0), n_win - 1),
        lambda c: F.struct(
            c.cast("long").alias("chunk_idx"),
            (c * stride).cast("long").alias("start_tok"),
            F.least(n - c * stride, F.lit(window)).cast("long").alias("n_tokens"),
            F.concat_ws(" ", F.slice("__t", c * stride + 1, window)).alias("chunk"),
        ),
    )
    return (
        src.filter(n > 0)
        .select("doc_id", F.explode(chunks).alias("w"))
        .select("doc_id", "w.chunk_idx", "w.start_tok", "w.n_tokens", "w.chunk")
    )


def priority_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    group_col: str | None = None,
    salt: int = 13,
) -> DataFrame:
    """Deterministic weight-proportional sampling WITHOUT replacement:
    keep the top-``k`` rows (per group) by the priority-sampling rule
    (Duffield-Lund-Thorup, JACM'07): priority = weight / u with u a
    pseudo-uniform in (0, 1] — heavier rows win proportionally more often,
    and the top-k by priority is a without-replacement weighted sample with
    published estimation guarantees.

    Exactness discipline: u = mix31(id)+1 over 2^31, and the sort key is the
    integer ``(weight * 2^31) DIV (mix31(id)+1)`` with an ``id`` tiebreak —
    no floats anywhere, so the selected set is bit-reproducible across
    engines, repartitionings, and reruns (the same reason hash_split /
    stratified_sample avoid RNG). Requires integer weights in [0, 2^31)
    (checked at plan level via the cast); zero-weight rows have priority 0
    and are picked only to fill short groups.

    Plan: grouped mode is one row_number window partitioned by the sampling
    group (never a single-partition window); global mode is
    orderBy + limit, which Spark plans as TakeOrderedAndProject (per-
    partition top-k, k-row driver merge). Returns the input columns plus
    the exact integer ``pri``.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    h = _mix31(F.col(id_col).cast("long"), salt) + 1  # (0, 2^31]
    # integer DIV, not fp division: weight * 2^31 exceeds a double's 2^53
    # mantissa for weights > ~4M, and the sort key must stay exact
    src = df.withColumn(
        "__num", F.col(weight_col).cast("long") * F.lit(1 << 31).cast("long")
    ).withColumn("__h", h)
    src = src.withColumn("pri", F.expr("__num DIV __h")).drop("__num", "__h")
    if group_col is None:
        return src.orderBy(F.col("pri").desc(), F.col(id_col).asc()).limit(k)
    w = Window.partitionBy(group_col).orderBy(F.col("pri").desc(), F.col(id_col).asc())
    return src.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k).drop("__rn")


def _mix31(col, salt: int):
    """Engine-neutral two-round 31-bit mixer (same constants as
    sketches/neighborhood/projection): multiplicative + xor-shift, mod 2^31."""
    MIX = 2246822519
    M31 = 1 << 31
    h1 = F.pmod(col * F.lit(KNUTH) + F.lit(salt), F.lit(M31))
    h1 = h1.bitwiseXOR(F.shiftright(h1, 15))
    h2 = F.pmod(h1 * F.lit(MIX) + F.lit(1), F.lit(M31))
    return h2.bitwiseXOR(F.shiftright(h2, 13))


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    train_pct: int = 90,
    val_pct: int = 5,
    salt: int = 0,
) -> DataFrame:
    """Append a deterministic ``split`` column (train/val/test) from a
    multiplicative hash of the id: bucket = ((id + salt) * KNUTH) mod 2^32
    mod 100. Pure integer arithmetic — identical in any engine, stable
    across runs/partitioning (no RNG), so split membership never drifts.
    Assumes ``id + salt`` < 2^31 so the product fits in a 64-bit long;
    rehash wider ids (e.g. ``xxhash64 & 0x7fffffff``) before splitting.
    """
    if not (0 < train_pct and 0 <= val_pct and train_pct + val_pct <= 100):
        raise ValueError("percentages must be positive and sum to <= 100")
    bucket = F.pmod(
        F.pmod((F.col(id_col) + F.lit(salt)) * F.lit(KNUTH), F.lit(1 << 32)), F.lit(100)
    )
    return df.withColumn(
        "split",
        F.when(bucket < train_pct, F.lit("train"))
        .when(bucket < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def quantile_bins(
    df: DataFrame,
    value_col: str,
    n_bins: int,
    id_col: str = "doc_id",
    mode: str = "exact",
    accuracy: int = 10_000,
) -> DataFrame:
    """Equal-frequency (quantile) binning: append ``bin`` in [1, n_bins].

    ``mode="exact"``: bin by rank of ``value_col`` (ties broken by
    ``id_col`` so the binning is a total order — deterministic under
    repartitioning, unlike raw NTILE over a non-unique key). NTILE needs a
    global order — one range-partitioned sort feeding a SINGLE-partition
    window, so this is the small/medium-table form only.

    ``mode="approx"``: the 100-TB path. One map-side-combined
    ``percentile_approx`` aggregate (Greenwald-Khanna sketch, error <=
    1/``accuracy`` in rank) produces the n_bins-1 cutpoints as a one-row
    broadcast, and every row bins by comparison against that array —
    no global sort, no window, no driver collect; the scan stays fully
    parallel. Bin populations deviate from N/n_bins by at most the sketch's
    rank error; a value equal to a cutpoint goes to the lower bin.

    Used as the feature-engineering discretization step and the
    bucket-encoding front end for layout keys (functions/layout.py:
    zorder_key wants rank buckets, not raw skewed values).
    """
    if mode == "exact":
        w = Window.orderBy(F.col(value_col), F.col(id_col))
        return df.select(id_col, value_col, F.ntile(n_bins).over(w).alias("bin"))
    if mode != "approx":
        raise ValueError(f"mode must be 'exact' or 'approx', got {mode!r}")
    probs = [i / n_bins for i in range(1, n_bins)]
    cuts = df.agg(
        F.percentile_approx(value_col, F.array(*[F.lit(p) for p in probs]), accuracy).alias(
            "__cuts"
        )
    )
    return df.crossJoin(F.broadcast(cuts)).select(
        id_col,
        value_col,
        (
            F.lit(1)
            + F.size(F.filter("__cuts", lambda c: c < F.col(value_col)))
        ).alias("bin"),
    )


def stratified_sample(
    df: DataFrame,
    by: str,
    fractions: dict[str, int],
    id_col: str = "doc_id",
    default_pct: int = 0,
    salt: int = 0,
) -> DataFrame:
    """Deterministic per-group downsampling: keep a row when its hash
    bucket (same multiplicative Knuth hash as ``hash_split``) is below the
    group's percentage — the corpus-rebalancing primitive (e.g. keep 100%
    of low-resource languages, 30% of English). Groups absent from
    ``fractions`` fall back to ``default_pct``.

    Pure integer arithmetic on ids: stable under repartitioning, no RNG,
    replayable in SQL; one codegen'd filter, the scan-level predicate a
    100-TB pass wants (no shuffle, no per-group pass).
    """
    bucket = F.pmod(F.pmod((F.col(id_col) + F.lit(salt)) * F.lit(KNUTH), F.lit(1 << 32)), F.lit(100))
    pct = F.lit(default_pct)
    for key, p in sorted(fractions.items()):
        pct = F.when(F.col(by) == key, F.lit(p)).otherwise(pct)
    return df.filter(bucket < pct)


def exact_quantiles(
    df: DataFrame, value_col: str, qs: list[tuple[int, int]]
) -> DataFrame:
    """Exact discrete (type-1 / lower empirical) quantiles of an integer
    column with NO per-group value buffering and NO global sort — the
    scale-correct exact path next to the two documented cliffs: Spark's
    exact ``percentile`` buffers every group value in executor memory, and
    ``quantile_bins``' exact mode needs a global NTILE window.

    Shape: ONE map-side-combined value histogram (|distinct| rows), the
    two-phase distributed prefix sum over it, then each probe q is "the
    smallest value whose cumulative count >= ceil(q*n)" — a broadcast
    nested-loop of the tiny probe list against the histogram plus a
    map-side-combined MIN. Everything is integer arithmetic: quantiles are
    passed as exact rationals ``(num, den)`` so ``ceil(q*n) = (num*n +
    den - 1) div den`` never touches a float.

    Returns ``(q_num, q_den, k, n, value)`` — one row per probe.
    """
    from .cumsum import distributed_cumsum

    h = df.groupBy(F.col(value_col).alias("v")).agg(F.count(F.lit(1)).alias("c"))
    cum = distributed_cumsum(h, ["v"], "c", out_col="cum").select("v", "cum")
    nrow = cum.groupBy().agg(F.max("cum").alias("n"))
    probes = df.sparkSession.createDataFrame(
        [(int(num), int(den)) for num, den in qs], "q_num long, q_den long"
    )
    targets = (
        probes.crossJoin(F.broadcast(nrow))
        .withColumn("k", F.expr("(q_num * n + q_den - 1) DIV q_den"))
    )
    return (
        cum.join(F.broadcast(targets), F.col("cum") >= F.col("k"))
        .groupBy("q_num", "q_den", "k", "n")
        .agg(F.min("v").alias("value"))
    )


def weighted_exact_quantiles(
    df: DataFrame, value_col: str, weight_col: str, qs: list[tuple[int, int]]
) -> DataFrame:
    """Exact WEIGHTED discrete quantiles of an integer column under
    integer weights (the weighted-median family: e.g. price quantiles
    weighted by units sold, latency percentiles weighted by request
    count). Generalizes :func:`exact_quantiles` — weight 1 everywhere
    recovers it exactly.

    Same scale shape: ONE map-side-combined histogram now summing WEIGHT
    per distinct value (|distinct| rows — the raw rows are never sorted,
    buffered, or globally windowed), the two-phase distributed prefix sum,
    then each exact-rational probe ``(num, den)`` selects the smallest
    value whose cumulative weight >= ``ceil(q*W) = (num*W + den - 1) div
    den``. Pure BIGINT arithmetic end to end.

    Returns ``(q_num, q_den, k, n, value)`` — ``n`` is total weight W.
    """
    from .cumsum import distributed_cumsum

    h = df.groupBy(F.col(value_col).alias("v")).agg(
        F.sum(F.col(weight_col).cast("long")).alias("c")
    )
    cum = distributed_cumsum(h, ["v"], "c", out_col="cum").select("v", "cum")
    nrow = cum.groupBy().agg(F.max("cum").alias("n"))
    probes = df.sparkSession.createDataFrame(
        [(int(num), int(den)) for num, den in qs], "q_num long, q_den long"
    )
    targets = (
        probes.crossJoin(F.broadcast(nrow))
        .withColumn("k", F.expr("(q_num * n + q_den - 1) DIV q_den"))
    )
    return (
        cum.join(F.broadcast(targets), F.col("cum") >= F.col("k"))
        .groupBy("q_num", "q_den", "k", "n")
        .agg(F.min("v").alias("value"))
    )


def grouped_exact_quantiles(
    df: DataFrame, group_col: str, value_col: str, qs: list[tuple[int, int]]
) -> DataFrame:
    """Per-group exact discrete quantiles — the grouped form of
    :func:`exact_quantiles`, closing the documented cliff where Spark's
    exact ``percentile`` buffers every group value in executor memory.

    Shape: ONE map-side-combined (group, value) histogram, a KEYED window
    cumsum over it (partitioned by group, ordered by value — per-group
    distinct values, never the raw rows, and never a single-partition
    window), then each rational probe ``(num, den)`` selects the smallest
    value whose cumulative count >= ceil(q * n_g) via a broadcast
    nested-loop + map-side MIN. All integer arithmetic.

    Returns ``(group, q_num, q_den, k, n, value)``.
    """
    h = df.groupBy(F.col(group_col).alias("g"), F.col(value_col).alias("v")).agg(
        F.count(F.lit(1)).alias("c")
    )
    w = Window.partitionBy("g").orderBy("v")
    cum = h.select("g", "v", F.sum("c").over(w).alias("cum"))
    ng = cum.groupBy("g").agg(F.max("cum").alias("n"))
    probes = df.sparkSession.createDataFrame(
        [(int(num), int(den)) for num, den in qs], "q_num long, q_den long"
    )
    targets = ng.crossJoin(F.broadcast(probes)).withColumn(
        "k", F.expr("(q_num * n + q_den - 1) DIV q_den")
    )
    # plain equi-join on the group key: AQE broadcasts when targets is
    # small and falls back to a shuffle join at extreme group cardinality
    return (
        cum.join(targets, ["g"])
        .where(F.col("cum") >= F.col("k"))
        .groupBy("g", "q_num", "q_den", "k", "n")
        .agg(F.min("v").alias("value"))
        .select(F.col("g").alias(group_col), "q_num", "q_den", "k", "n", "value")
    )


def pps_systematic_sample(
    df: DataFrame,
    order_cols: list[str],
    weight_col: str,
    k: int,
    num_partitions: int | None = None,
) -> DataFrame:
    """Systematic probability-proportional-to-size sampling (Madow 1949):
    lay the rows end to end in the ``order_cols`` total order, place ``k``
    equally spaced probes at ``(2i + 1) * W / (2k)`` over the weighted
    line ``[0, W)``, and keep each row as many times as probes land inside
    its weight interval — the standard deterministic WOR design for
    weighted corpus mixing (every row with weight >= W/k is taken with
    certainty; multiplicity > 1 records the certainty-overflow the way PPS
    estimators expect).

    Everything is exact BIGINT arithmetic: weights must be non-negative
    integers (quantize upstream — cents, tokens, bytes), the running total
    comes from :func:`~pagerank_spark.operators.cumsum.distributed_cumsum`
    (two-phase prefix sum — no single-partition window), and the probe
    count below a boundary ``x`` is the closed form
    ``ceil((2kx - W) / 2W)`` clamped to ``[0, k]``, evaluated by integer
    division — no floats anywhere, so the sample is bit-stable across
    engines, partitionings and reruns. Overflow contract: ``2k * W``
    must stay under 2^63.

    Returns the sampled rows with ``multiplicity`` (>= 1) appended.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    from .cumsum import distributed_cumsum

    cum = distributed_cumsum(
        df, order_cols, weight_col, out_col="__cum", num_partitions=num_partitions
    )
    total = cum.groupBy().agg(F.max("__cum").alias("__w")).filter(F.col("__w") > 0)
    # probes below x: ceil((2kx - W) / 2W) = (2kx + W - 1) DIV 2W, clamped
    # to [0, k]; the numerator is non-negative (x >= 0, W >= 1), so
    # truncating and flooring division agree on both engines
    out = (
        cum.crossJoin(F.broadcast(total))
        .withColumn(
            "multiplicity",
            (
                F.expr(
                    f"greatest(0L, least(CAST({k} AS BIGINT), "
                    f"(2 * {k} * __cum + __w - 1) DIV (2 * __w)))"
                )
                - F.expr(
                    f"greatest(0L, least(CAST({k} AS BIGINT), "
                    f"(2 * {k} * (__cum - {weight_col}) + __w - 1) DIV (2 * __w)))"
                )
            ).cast("long"),
        )
        .filter(F.col("multiplicity") >= 1)
        .drop("__cum", "__w")
    )
    return out


def length_bucket_batches(
    docs: DataFrame,
    batch_size: int,
    bucket_edges: tuple[int, ...] = (16, 32, 64, 128, 256, 512, 1024),
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    salt: int = 0,
) -> DataFrame:
    """Static-shape batch assignment by length bucket — the standard
    accelerator-side batching discipline (pad every example in a batch to
    the bucket width, so batch tensors have a fixed shape per bucket and
    padding waste is bounded by the bucket geometry, not the corpus).

    Each document goes to the smallest ``bucket_edges`` entry >= its
    whitespace token count (documents longer than the last edge are
    truncated to it — the overflow bucket). Within a (bucket, shard) cell
    documents are ordered longest-first with ``id_col`` as the tiebreak
    (longest-first minimizes intra-batch waste when a tail batch is
    underfull), and assigned ``batch = (rank - 1) div batch_size``.

    ``shard`` comes from the engine-neutral :func:`_mix31` hash of the id —
    NOT from partitioning — so the assignment is deterministic across
    engines, runs, and repartitioning. Scale shape: the only ordered
    structure is a window PARTITIONED BY (bucket, shard); ``n_shards``
    scales with the cluster (each shard is an independent batch stream,
    exactly like ``pack_chunks``' shard streams), so no single-partition
    window ever appears — the per-cell row count is corpus / (buckets ×
    shards).

    Returns per-document placement ``(doc_id, n_tokens, bucket, shard,
    batch, tok_padded)`` where ``tok_padded = least(n_tokens, bucket)`` is
    the example's contribution to its batch tensor.
    """
    if batch_size <= 0:
        raise ValueError("batch_size must be positive")
    if list(bucket_edges) != sorted(set(bucket_edges)) or not bucket_edges:
        raise ValueError("bucket_edges must be strictly increasing and non-empty")
    toks = token_count(text_col)
    bucket = F.lit(int(bucket_edges[-1]))
    for edge in reversed(bucket_edges[:-1]):
        bucket = F.when(toks <= edge, F.lit(int(edge))).otherwise(bucket)
    shard = F.pmod(_mix31(F.col(id_col), salt), F.lit(int(n_shards)))
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("n_tokens"),
        bucket.alias("bucket"),
        shard.cast("int").alias("shard"),
    )
    w = Window.partitionBy("bucket", "shard").orderBy(
        F.col("n_tokens").desc(), F.col("doc_id")
    )
    return base.select(
        "doc_id",
        "n_tokens",
        "bucket",
        "shard",
        ((F.row_number().over(w) - 1) / batch_size).cast("bigint").alias("batch"),
        F.least(F.col("n_tokens"), F.col("bucket")).alias("tok_padded"),
    )


def chunk_segments(
    docs: DataFrame,
    budget: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    shard_col: str | None = None,
) -> DataFrame:
    """Per-chunk segment map for concat-and-chunk packing — the
    ``cu_seqlens`` structure varlen/block-diagonal attention needs: for
    every training chunk, which documents occupy it and at which offsets,
    so attention never crosses a document boundary inside a packed
    sequence.

    Built on :func:`pack_chunks` placement: each document explodes into
    its ``first_chunk..last_chunk`` range (guarded — zero-token docs emit
    nothing) and the intersection of the document's token span with the
    chunk's ``[c·B, (c+1)·B)`` window gives the in-chunk offsets. Segment
    order inside a chunk is document order (the stream order), numbered
    with a window keyed by the chunk — thousands of rows per key at most
    (a chunk holds at most B documents), never a global window.

    Returns ``([shard,] chunk, seg_idx, doc_id, seg_start, seg_len)``;
    ``sum(seg_len) == B`` for every interior chunk (pytest-asserted), and
    the cu_seqlens array for chunk c is ``[0, cumsum(seg_len)...]``.
    """
    placed = pack_chunks(docs, budget, id_col=id_col, text_col=text_col, shard_col=shard_col)
    shard_cols = ["shard"] if shard_col else []
    exploded = placed.filter(F.col("n_chunks") > 0).select(
        *shard_cols,
        "doc_id",
        "n_tokens",
        "start_offset",
        F.explode(F.expr("sequence(first_chunk, last_chunk)")).alias("chunk"),
    )
    b = F.lit(int(budget))
    lo = F.greatest(F.col("start_offset") - F.col("chunk") * b, F.lit(0))
    hi = (
        F.least(F.col("start_offset") + F.col("n_tokens"), (F.col("chunk") + 1) * b)
        - F.col("chunk") * b
    )
    seg = exploded.select(
        *shard_cols,
        "chunk",
        "doc_id",
        lo.alias("seg_start"),
        (hi - lo).alias("seg_len"),
    )
    w = Window.partitionBy(*shard_cols, "chunk").orderBy("doc_id")
    return seg.select(
        *shard_cols,
        "chunk",
        (F.row_number().over(w) - 1).cast("long").alias("seg_idx"),
        "doc_id",
        "seg_start",
        "seg_len",
    )
