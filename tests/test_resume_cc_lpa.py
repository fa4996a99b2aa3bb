"""Checkpoint/resume for connected components and label propagation:
interrupted runs continue from the last committed superstep and end with
results identical to uninterrupted runs."""

import numpy as np

from pagerank_spark.algos.components import connected_components
from pagerank_spark.algos.labelprop import label_propagation
from pagerank_spark.plans.checkpoint import Checkpointer
from pagerank_spark.sources.graphs import er_edges_numpy


def _edges_df(spark, arr):
    return spark.createDataFrame([(int(s), int(d)) for s, d in arr], "src long, dst long")


def test_cc_resume_identical(spark, tmp_path):
    arr = er_edges_numpy(80, 70, seed=12)  # sparse, multi-component
    edges = _edges_df(spark, arr)

    full = {r["id"]: r["component"] for r in connected_components(edges).collect()}

    ck = Checkpointer(spark, str(tmp_path / "cc"))
    connected_components(edges, max_iters=1, checkpointer=ck)  # "killed" after 1
    assert ck.committed_supersteps() == [1]
    resumed = {r["id"]: r["component"] for r in connected_components(edges, checkpointer=ck).collect()}
    assert resumed == full
    # frontier sizes recorded per superstep, last one zero
    fr = [m["frontier"] for m in ck.metrics()]
    assert fr[-1] == 0 and fr[0] > 0

    # a third run short-circuits off the converged checkpoint (no supersteps)
    again = {r["id"]: r["component"] for r in connected_components(edges, checkpointer=ck).collect()}
    assert again == full


def test_lpa_resume_identical(spark, tmp_path):
    edges = []
    for base in (0, 5):
        for i in range(5):
            for j in range(i + 1, 5):
                edges.append((base + i, base + j))
    edges.append((4, 5))
    df = _edges_df(spark, np.array(edges, dtype=np.int64))

    full = {r["id"]: r["label"] for r in label_propagation(df, max_iters=8).collect()}

    ck = Checkpointer(spark, str(tmp_path / "lpa"))
    label_propagation(df, max_iters=2, checkpointer=ck)
    assert ck.committed_supersteps() and max(ck.committed_supersteps()) <= 2
    resumed = {r["id"]: r["label"] for r in label_propagation(df, max_iters=8, checkpointer=ck).collect()}
    assert resumed == full


def test_cc_incremental_warm_start_matches_full(spark):
    """Grown edge table: warm-starting from the previous components produces
    the same exact components as a cold full recompute — including batches
    that MERGE previously separate components."""
    import random

    from pagerank_spark.algos.components import connected_components

    rng = random.Random(12)
    # batch 1: two chains (components {0..9} and {20..29})
    b1 = [[i, i + 1] for i in range(9)] + [[i, i + 1] for i in range(20, 29)]
    # batch 2: new vertices + a bridge that MERGES the two old components
    b2 = [[9, 20], [30, 31], [31, 32], [5, 30]]
    e1 = spark.createDataFrame(b1, ["src", "dst"])
    e_all = spark.createDataFrame(b1 + b2, ["src", "dst"])

    old = connected_components(e1, num_partitions=4)
    warm = connected_components(e_all, num_partitions=4, init_labels=old)
    cold = connected_components(e_all, num_partitions=4)
    got_w = {r["id"]: r["component"] for r in warm.collect()}
    got_c = {r["id"]: r["component"] for r in cold.collect()}
    assert got_w == got_c
    assert set(got_w.values()) == {0}  # everything merged into component 0
