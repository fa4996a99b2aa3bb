"""Kill/resume identity for k-truss and Luby MIS (plans/checkpoint.py):
a run interrupted after round 1 and resumed produces exactly the
uninterrupted result."""

import random

from pagerank_spark.algos.mis import luby_mis
from pagerank_spark.algos.truss import k_truss
from pagerank_spark.plans.checkpoint import Checkpointer


def _graph(seed, n, m):
    rng = random.Random(seed)
    pairs = list({tuple(sorted((rng.randrange(n), rng.randrange(n)))) for _ in range(m)})
    return [list(p) for p in pairs if p[0] != p[1]]


def test_truss_resume_identity(spark, tmp_path):
    pairs = _graph(7, 16, 60)
    edges = spark.createDataFrame(pairs, ["src", "dst"])
    full = k_truss(edges, 4, num_partitions=4)
    exp = {(r["a"], r["b"]): r["support"] for r in full.edges.collect()}
    assert full.rounds >= 2  # the interruption point below is mid-run

    ck = Checkpointer(spark, str(tmp_path / "truss_ck"))
    partial = k_truss(edges, 4, max_rounds=1, num_partitions=4, checkpointer=ck)
    assert not partial.converged
    resumed = k_truss(edges, 4, num_partitions=4, checkpointer=ck)
    got = {(r["a"], r["b"]): r["support"] for r in resumed.edges.collect()}
    assert got == exp
    assert resumed.converged and resumed.rounds == full.rounds

    # a rerun against the converged checkpoint returns without peeling
    again = k_truss(edges, 4, num_partitions=4, checkpointer=ck)
    assert again.converged
    assert {(r["a"], r["b"]): r["support"] for r in again.edges.collect()} == exp


def test_mis_resume_identity_both_modes(spark, tmp_path):
    pairs = _graph(3, 18, 70)
    edges = spark.createDataFrame(pairs, ["src", "dst"])
    for mode, coloring in (("mis", False), ("color", True)):
        full = luby_mis(edges, num_partitions=4, coloring=coloring)
        exp = {r["id"]: r["round"] for r in full.members.collect()}
        assert full.rounds >= 2

        ck = Checkpointer(spark, str(tmp_path / f"{mode}_ck"))
        partial = luby_mis(edges, max_rounds=1, num_partitions=4, coloring=coloring, checkpointer=ck)
        assert not partial.converged
        resumed = luby_mis(edges, num_partitions=4, coloring=coloring, checkpointer=ck)
        got = {r["id"]: r["round"] for r in resumed.members.collect()}
        assert got == exp, mode
        assert resumed.converged
