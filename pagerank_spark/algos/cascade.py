"""Deterministic linear-threshold influence cascade.

The classic LT diffusion model (Kempe-Kleinberg-Tardos) run as a monotone
frontier fixpoint: a vertex activates once the fraction of its active
in-neighbors reaches ``num/den``. With uniform edge weights and a rational
threshold the whole computation is exact BIGINT algebra (``cnt * den >=
indeg * num`` — no division anywhere), so an unrolled SQL oracle replays it
bit-for-bit.

Scale design (same shape as the reference's iteration driver,
reference: pagerank.v top-level FSM — gather / threshold-apply / swap):

- edges are shuffled ONCE (repartition by ``src`` + localCheckpoint);
  every superstep's gather joins on that layout with no new exchange;
- work per round is proportional to the NEW frontier's out-edges, not the
  graph (delta propagation — the accumulated active-in-neighbor count is
  carried in vertex state, so already-counted contributions never re-send);
- activation is monotone, so stopping at an empty frontier equals running
  all ``max_iters`` rounds — the oracle-parity property that lets a fixed
  unrolled SQL oracle check a convergence-stopped run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _num_partitions(df: DataFrame) -> int:
    return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))


def linear_threshold_cascade(
    edges: DataFrame,
    seeds: DataFrame,
    num: int = 1,
    den: int = 2,
    max_iters: int = 20,
    num_partitions: int | None = None,
) -> DataFrame:
    """Return ``(id, round)`` for every vertex the cascade activates.

    ``edges``: directed (src, dst), deduplicated — influence flows src->dst
    with uniform weight 1/indeg(dst). ``seeds``: one column ``id``,
    activated at round 0 unconditionally. A non-seed vertex v activates at
    the first round where ``active_in(v) * den >= indeg(v) * num``.
    """
    if not (0 < num <= den):
        raise ValueError(f"threshold {num}/{den} must be in (0, 1]")
    p = num_partitions or _num_partitions(edges)
    e = edges.select("src", "dst").repartition(p, "src").localCheckpoint()
    indeg = (
        e.groupBy(F.col("dst").alias("id"))
        .agg(F.count(F.lit(1)).alias("indeg"))
        .repartition(p, "id")
        .localCheckpoint()
    )

    # state: every activated vertex + its activation round; acc: active-in
    # counts for NOT-yet-active vertices only (sparse — the delta frontier
    # keeps per-round work proportional to newly-activated out-edges).
    state = seeds.select("id", F.lit(0).alias("round")).repartition(p, "id").localCheckpoint()
    frontier = state.select("id")
    acc = None

    for r in range(1, max_iters + 1):
        gathered = (
            e.join(frontier.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        if acc is None:
            acc = gathered
        else:
            acc = (
                acc.withColumnRenamed("cnt", "c0")
                .join(gathered, "id", "full_outer")
                .select("id", (F.coalesce("c0", F.lit(0)) + F.coalesce("cnt", F.lit(0))).alias("cnt"))
            )
        # drop accumulators for already-active vertices; test the threshold
        acc = (
            acc.join(state.select("id"), "id", "left_anti")
            .join(indeg, "id")
            .repartition(p, "id")
            .localCheckpoint()
        )
        newly = acc.filter(F.col("cnt") * F.lit(den) >= F.col("indeg") * F.lit(num)).select("id")
        n_new = newly.count()
        if n_new == 0:
            break
        frontier = newly.localCheckpoint(eager=False)
        state = (
            state.unionByName(frontier.select("id", F.lit(r).alias("round")))
            .repartition(p, "id")
            .localCheckpoint()
        )
        acc = acc.select("id", "cnt")

    return state
