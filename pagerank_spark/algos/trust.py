"""TrustRank and spam mass (Gyongyi, Garcia-Molina, Pedersen, VLDB'04):
the canonical web-graph trust/spam signals, re-expressed as ONE amortized
superstep loop.

TrustRank is personalized PageRank whose teleport (and dangling mass) lands
on a curated trusted seed set; **spam mass** compares every vertex's global
PageRank with the share of it that is reachable from trust:

    mass(v) = (PR(v) - TR(v)) / PR(v)

A page whose rank comes almost entirely from outside the trusted
neighborhood (mass near 1) earns its rank from link spam; well-linked
legitimate pages sit near (or below) 0 — the relative mass is NOT clamped,
matching the paper. For agent-transcript graphs the same signal flags
conversations whose centrality comes from bot-loop reply farms rather than
the human-rooted subgraph.

Scale shape: the two rank chains (global PR, trusted TR) differ only in
their teleport vector, so running them as separate :func:`pagerank` jobs
would pay the edge shuffle/layout twice. Here state is keyed
``(run, id)`` with the per-vertex teleport riding along as a static column
(mirroring :func:`pagerank_damping_sweep`'s dval dimension): every
iteration is one gather join + one grouped sum for BOTH chains, dangling
mass is a 2-row broadcast, and the edge table is laid out exactly once.
Per-run state is a 2x fan-out of the vertex table — visible and budgeted,
not a hidden re-shuffle. Reference kernel parity: same recurrence as
pagerank.v's damped update (cf. /root/reference/src/pagerank.v fixed-point
loop), generalized over a run dimension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from pagerank_spark.algos.pagerank import _num_partitions


def spam_mass(
    edges: DataFrame,
    trusted: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    num_partitions: int | None = None,
) -> DataFrame:
    """Relative spam mass after ``iters`` synchronous iterations of both
    chains (fixed count — diagnostic shape; convergence-driven runs use
    :func:`pagerank` per chain and join).

    ``trusted``: DataFrame with an ``id`` column — the oracle seed set.
    Seeds absent from the graph are ignored (their teleport share would be
    lost mass, not trust). Returns ``(id, pr, tr, spam_mass)`` with all
    three rounded to 6 dp.
    """
    p = num_partitions or _num_partitions(edges)
    e = edges.select("src", "dst").dropDuplicates().repartition(p, "src").localCheckpoint()
    deg = e.groupBy(F.col("src").alias("id")).agg(F.count(F.lit(1)).alias("out_degree"))
    v = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .dropDuplicates()
    )
    vd = v.join(deg, "id", "left").select(
        "id", F.coalesce("out_degree", F.lit(0)).alias("out_degree")
    )
    seeds = trusted.select(F.col("id")).dropDuplicates().withColumn("__s", F.lit(1))
    vds = vd.join(seeds, "id", "left").localCheckpoint()
    n_tbl = vds.groupBy().agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.sum(F.coalesce("__s", F.lit(0))).cast("double").alias("__ns"),
    )
    # static per-(run, vertex) teleport vector: pr -> uniform, tr -> seed mass
    runs = edges.sparkSession.createDataFrame([("pr",), ("tr",)], "run string")
    state = (
        vds.crossJoin(F.broadcast(runs))
        .crossJoin(F.broadcast(n_tbl))
        .select(
            "run",
            "id",
            "out_degree",
            F.when(F.col("run") == "pr", F.lit(1.0) / F.col("__n"))
            .otherwise(
                F.when(F.col("__s") == 1, F.lit(1.0) / F.col("__ns")).otherwise(F.lit(0.0))
            )
            .alias("tele"),
        )
        .withColumn("rank", F.col("tele"))
        .repartition(p, "id")
        .localCheckpoint()
    )
    d = float(damping)
    for _ in range(iters):
        dang = (
            state.filter(F.col("out_degree") == 0)
            .groupBy("run")
            .agg(F.sum("rank").alias("__m"))
        )
        contrib = (
            e.join(
                state.select("run", F.col("id").alias("src"), "rank", "out_degree").hint(
                    "shuffle_hash"
                ),
                "src",
            )
            .select("run", "dst", (F.col("rank") / F.col("out_degree")).alias("__c"))
            .groupBy("run", F.col("dst").alias("id"))
            .agg(F.sum("__c").alias("__contrib"))
        )
        state = (
            state.select("run", "id", "out_degree", "tele")
            .join(F.broadcast(dang), "run", "left")
            .join(contrib, ["run", "id"], "left")
            .select(
                "run",
                "id",
                "out_degree",
                "tele",
                (
                    (1 - d) * F.col("tele")
                    + d * F.coalesce(F.col("__contrib"), F.lit(0.0))
                    + d * F.coalesce(F.col("__m"), F.lit(0.0)) * F.col("tele")
                ).alias("rank"),
            )
            .repartition(p, "id")
            .localCheckpoint()
        )
    pr = state.filter(F.col("run") == "pr").select("id", F.col("rank").alias("__pr"))
    tr = state.filter(F.col("run") == "tr").select("id", F.col("rank").alias("__tr"))
    return pr.join(tr, "id").select(
        "id",
        F.round("__pr", 6).alias("pr"),
        F.round("__tr", 6).alias("tr"),
        F.round((F.col("__pr") - F.col("__tr")) / F.col("__pr"), 6).alias("spam_mass"),
    )
