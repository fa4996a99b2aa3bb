"""Pseudorandom graph walks — the corpus-sampling step of embedding
pipelines (DeepWalk/node2vec generate per-vertex walk sequences that a
skip-gram trainer consumes; at 100 TB the walk table IS the training set).

Determinism by construction: the next hop from vertex u at step t of walk w
is the out-neighbor v minimizing the LCG-style mixer

    mix(w, t, v) = ((w % M) * 1009 + t * 131 + (v % M) * 7919) % M,
    M = 1_000_003   (ties broken by smaller v)

— every term stays below 8e9, so the arithmetic is exact in int64 in ANY
engine (no engine-private hash; a SQL oracle can replay the walk bit-for-
bit; the round-2 lesson that xxhash64-seeded ops are un-oracle-able).
Distributionally the mixer scatters like a hash — good enough for corpus
sampling, NOT for cryptographic or adversarial settings.

Scale shape: one walk step = one co-partitioned hash join (edge layout
shuffled ONCE by src, walk frontier repartitioned by the join key) + one
min_by aggregate keyed by walk id. Walk state is the narrow
``(walk_id, v)``; finished walks (no out-neighbor) drop out of the frontier
via the inner join, so late steps cost only the surviving walk set. Every
step is truncated with an eager localCheckpoint (lineage discipline,
SURVEY.md §7) and the output table is the union of the per-step leaves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .pagerank import _num_partitions

_M = 1_000_003


def _mix(walk_id, step: int, v):
    return F.pmod(
        F.pmod(walk_id, F.lit(_M)) * 1009 + F.lit(step * 131) + F.pmod(v, F.lit(_M)) * 7919,
        F.lit(_M),
    )


def pseudorandom_walks(
    edges: DataFrame,
    walk_len: int = 8,
    num_partitions: int | None = None,
) -> DataFrame:
    """One walk per vertex over the directed graph; returns
    ``(walk_id, step, v)`` rows — step 0 is the start vertex, and a walk
    emits no further rows once it reaches a vertex with no out-edges.

    ``walk_id`` equals the start vertex id (one walk per vertex keeps the
    output linear in V x walk_len; callers wanting more walks per vertex
    union calls with remapped walk ids).
    """
    p = num_partitions or _num_partitions(edges)
    e = edges.select("src", "dst").dropDuplicates().repartition(p, "src").localCheckpoint()
    starts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .dropDuplicates()
    )
    cur = (
        starts.select(
            F.col("id").alias("walk_id"), F.lit(0).alias("step"), F.col("id").alias("v")
        )
        .repartition(p, "v")
        .localCheckpoint()
    )
    steps = [cur]
    for t in range(1, walk_len + 1):
        nxt = (
            cur.join(e, cur.v == e.src, "inner")
            .groupBy("walk_id")
            .agg(
                F.min_by(
                    F.col("dst"), F.struct(_mix(F.col("walk_id"), t, F.col("dst")), F.col("dst"))
                ).alias("v")
            )
            .select("walk_id", F.lit(t).alias("step"), "v")
            .repartition(p, "v")
            .localCheckpoint()
        )
        steps.append(nxt)
        cur = nxt

    out = steps[0]
    for s in steps[1:]:
        out = out.unionByName(s)
    return out


def node2vec_walks(
    edges: DataFrame,
    walk_len: int = 6,
    return_cost: int = 4,
    explore_cost: int = 2,
    num_partitions: int | None = None,
) -> DataFrame:
    """Second-order (node2vec-style) biased walks: ``(walk_id, step, v)``.

    node2vec (Grover & Leskovec, KDD'16) biases the hop from ``prev -> cur``
    to a candidate ``dst`` by 1/p when ``dst == prev`` (return), 1 when
    ``dst`` is an out-neighbor of ``prev`` (BFS-like), 1/q otherwise
    (DFS-like). The deterministic analogue keeps the exact-replay property
    of :func:`pseudorandom_walks`: the chosen hop minimizes
    ``mix(w, t, dst) * cost`` with integer ``cost`` = ``return_cost`` /
    1 / ``explore_cost`` for the three classes (an exponential-race
    weighting — scaling a candidate's uniform key by ``c`` cuts its win
    probability ~1/c), ties to smaller ``dst``. ``return_cost = explore_cost
    = 1`` degenerates bit-for-bit to the first-order walk. All arithmetic
    stays int64-exact (mix < 1e6+3, costs small ints), so a SQL oracle
    replays every hop.

    Scale shape: per step the candidate set is the frontier's out-edge
    fan-out (same gather join as PageRank, ONE-time edge layout) plus one
    extra co-partitioned join probing ``(prev, dst)`` edge membership — the
    inherent cost of second-order bias; state stays the narrow
    ``(walk_id, prev, v)``. Step 1 has no ``prev`` and hops first-order,
    matching the reference algorithm's uniform first move.
    """
    p = num_partitions or _num_partitions(edges)
    e = edges.select("src", "dst").dropDuplicates().repartition(p, "src").localCheckpoint()
    probe = e.select(
        F.col("src").alias("__ps"), F.col("dst").alias("__pd"), F.lit(1).alias("__common")
    )
    starts = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .dropDuplicates()
    )
    out_rows = [
        starts.select(F.col("id").alias("walk_id"), F.lit(0).alias("step"), F.col("id").alias("v"))
    ]
    # state: (walk_id, prev, v); step 1 is first-order so prev starts as v
    cur = (
        starts.select(F.col("id").alias("walk_id"), F.col("id").alias("prev"), F.col("id").alias("v"))
        .repartition(p, "v")
        .localCheckpoint()
    )
    for t in range(1, walk_len + 1):
        cand = cur.join(e, cur.v == e.src, "inner")
        if t == 1:
            pri = _mix(F.col("walk_id"), t, F.col("dst"))
        else:
            cand = cand.join(
                probe,
                (F.col("prev") == F.col("__ps")) & (F.col("dst") == F.col("__pd")),
                "left",
            )
            cost = (
                F.when(F.col("dst") == F.col("prev"), F.lit(return_cost))
                .when(F.col("__common").isNotNull(), F.lit(1))
                .otherwise(F.lit(explore_cost))
            ).cast("long")
            pri = _mix(F.col("walk_id"), t, F.col("dst")) * cost
        nxt = (
            cand.groupBy("walk_id", "v")
            .agg(F.min_by(F.col("dst"), F.struct(pri.alias("__p"), F.col("dst"))).alias("nv"))
            .select("walk_id", F.col("v").alias("prev"), F.col("nv").alias("v"))
            .repartition(p, "v")
            .localCheckpoint()
        )
        out_rows.append(nxt.select("walk_id", F.lit(t).alias("step"), "v"))
        cur = nxt

    out = out_rows[0]
    for s in out_rows[1:]:
        out = out.unionByName(s)
    return out


def skipgram_pairs(walks: DataFrame, window: int = 2) -> DataFrame:
    """Aggregate (center, context) co-occurrence counts from a walk table
    ``(walk_id, step, v)`` — the skip-gram training pairs an embedding
    trainer consumes (window = max step distance, both directions).

    One self-join keyed by walk_id (walks are short, so the per-key fan-out
    is bounded by walk_len^2) followed by one map-side-combined count
    aggregate on (center, context). Returns ``(center, context, cnt)``.
    """
    a = walks.select("walk_id", F.col("step").alias("__sc"), F.col("v").alias("center"))
    b = walks.select("walk_id", F.col("step").alias("__st"), F.col("v").alias("context"))
    return (
        a.join(b.hint("shuffle_hash"), "walk_id")
        .filter(
            (F.col("__sc") != F.col("__st"))
            & (F.abs(F.col("__sc") - F.col("__st")) <= window)
        )
        .groupBy("center", "context")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def pmi_scores(pairs: DataFrame, min_count: int = 1) -> DataFrame:
    """Pointwise mutual information over ``(center, context, cnt)``
    co-occurrence counts (:func:`skipgram_pairs` output):

        pmi(a, b) = ln( (cnt(a,b) * N) / (cnt(a) * cnt(b)) )

    with N = total pair count and cnt(x) the marginal center/context
    totals — the association score an embedding or collocation pipeline
    derives before factorization (word2vec's implicit matrix). Returns
    ``(center, context, cnt, pmi)``, pruned to ``cnt >= min_count``.

    Plan: two marginal aggregates broadcast back onto the pair table (the
    vertex/term vocabulary after aggregation is tiny next to the pair
    table), the grand total as an in-plan broadcast scalar — one pass over
    the pairs, no re-shuffle of the pair key.
    """
    ctr = pairs.groupBy("center").agg(F.sum("cnt").alias("__nc"))
    ctx = pairs.groupBy("context").agg(F.sum("cnt").alias("__nx"))
    tot = pairs.agg(F.sum("cnt").alias("__n"))
    return (
        pairs.filter(F.col("cnt") >= min_count)
        .join(F.broadcast(ctr), "center")
        .join(F.broadcast(ctx), "context")
        .crossJoin(F.broadcast(tot))
        .select(
            "center", "context", "cnt",
            F.round(
                F.log(
                    (F.col("cnt").cast("double") * F.col("__n"))
                    / (F.col("__nc").cast("double") * F.col("__nx"))
                ),
                6,
            ).alias("pmi"),
        )
    )


def negative_samples(
    pairs: DataFrame,
    k: int = 3,
    table_size: int = 1024,
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """word2vec/LINE-style deterministic negative sampling for embedding
    training over id pairs: for every positive pair (a, b) draw ``k``
    negatives from the unigram distribution of the context column, via the
    public word2vec technique of a quantized inverse-CDF lookup table
    (Mikolov et al.'s 1e8-slot unigram table; here ``table_size`` slots).

    Returns ``(a, b, j, neg)`` for j in 1..k. Fully deterministic and
    SQL-replayable: the slot index is the same modular LCG mixer as
    ``pseudorandom_walks`` (ids reduced mod table_size BEFORE multiplying —
    int64-exact on engines that error on overflow), and the table targets
    are exact integer arithmetic ``((2s+1)*total) div (2*table_size)`` —
    no floating point anywhere. Collisions (neg == b) are kept and left to
    the caller, exactly like the reference implementation's table draw.

    Plan shape: one map-side-combined count over the pairs (the vocabulary
    relation, tiny next to the corpus), a cumulative-sum window over the
    vocabulary, an as-of join building the ``table_size``-row LUT, then one
    BROADCAST equi-join of the exploded (pair, j) rows against the LUT —
    the corpus-sized side is touched exactly once and never re-shuffled.
    The vocabulary cumsum here is a single-partition window (fine while the
    vocabulary is small next to the corpus); at a 10^7-term vocabulary swap
    in ``operators/cumsum.py::distributed_cumsum`` — the engine's two-phase
    prefix sum with no single-partition window.
    """
    from ..operators.temporal import asof_join

    m = table_size
    a, b = F.col(a_col), F.col(b_col)
    cnts = pairs.groupBy(b.alias("tok")).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.orderBy("tok").rowsBetween(Window.unboundedPreceding, 0)
    cum = cnts.select(
        "tok", F.lit(0).alias("__one"), (F.sum("cnt").over(w) - F.col("cnt")).alias("lo")
    )
    tot = cnts.agg(F.sum("cnt").alias("__total"))
    slots = (
        pairs.sparkSession.range(m)
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("id").alias("slot"),
            F.lit(0).alias("__one"),
            F.expr(f"(2 * id + 1) * __total DIV {2 * m}").alias("target"),
        )
    )
    lut = asof_join(slots, cum, on="target", by="__one", value_cols=["tok"], right_on="lo").select(
        "slot", F.col("tok").alias("neg")
    )
    samples = pairs.select(
        a.alias("a"),
        b.alias("b"),
        F.explode(F.expr(f"sequence(1, {k})")).alias("j"),
    ).withColumn(
        "slot",
        ((F.col("a") % m) * 1009 + (F.col("b") % m) * 7919 + F.col("j") * 131 + 17) % m,
    )
    return samples.join(F.broadcast(lut), "slot").select("a", "b", "j", "neg")
