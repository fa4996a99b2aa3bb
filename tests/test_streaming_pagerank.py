"""Streaming warm PageRank refresh: a file stream of edge batches drives
foreachBatch, each micro-batch folds new edges into the accumulated edge
table and re-converges PageRank warm-started from the previous ranks
(init_ranks) — the streaming form of the pagerank_warm_refresh gate.

The damped iteration is a contraction with a unique fixed point, so the
warm-started stream must land on the SAME ranks (allclose 1e-6, the
north-rule bar) as one cold batch run over all edges."""

import os

import pytest
from pyspark.sql import functions as F

from pagerank_spark.algos.pagerank import pagerank


def _edges(spark, lo, hi):
    # deterministic irregular slice: the DIV term makes later batches add
    # genuinely new edges (dst is NOT a function of src alone), degrees
    # grow unevenly, and the fixed point is non-uniform
    return spark.range(lo, hi).select(
        (F.col("id") % 97).alias("src"),
        ((F.col("id") * 7 + (F.col("id") / 97).cast("long") * 31 + 3) % 97).alias("dst"),
    ).where(F.col("src") != F.col("dst")).distinct()


def test_streaming_warm_refresh_matches_cold_batch(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    ck_dir = str(tmp_path / "ck")
    os.makedirs(in_dir)

    state = {"ranks": None, "edges": None, "iters": []}

    def on_batch(batch_df, batch_id):
        new = batch_df.select("src", "dst")
        acc = new if state["edges"] is None else state["edges"].unionByName(new)
        acc = acc.distinct().localCheckpoint()
        res = pagerank(acc, tol=1e-12, max_iters=200, init_ranks=state["ranks"])
        state["edges"] = acc
        state["ranks"] = res.ranks.localCheckpoint()
        state["iters"].append(res.iterations)

    for lo, hi in ((0, 120), (120, 240), (240, 300)):
        _edges(spark, lo, hi).write.mode("append").parquet(in_dir)
        q = (
            spark.readStream.schema("src long, dst long")
            .parquet(in_dir)
            .writeStream.foreachBatch(on_batch)
            .option("checkpointPath", ck_dir)
            .option("checkpointLocation", ck_dir)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    cold = pagerank(_edges(spark, 0, 300), tol=1e-12, max_iters=200)
    warm = {r["id"]: r["rank"] for r in state["ranks"].collect()}
    want = {r["id"]: r["rank"] for r in cold.ranks.collect()}
    assert set(warm) == set(want)
    for v, r in want.items():
        assert warm[v] == pytest.approx(r, abs=1e-6)
    # warm starts near the fixed point converge strictly faster than cold
    assert state["iters"][-1] < cold.iterations
