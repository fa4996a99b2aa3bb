"""k=3 clique percolation (algos/percolation.py) on the planted strip graph
(sources/graphs.py::synth_strips): closed-form community structure, the
overlapping-membership property, decoy non-merging, and plan shape."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def result(spark):
    from pagerank_spark.algos.percolation import clique_percolation3
    from pagerank_spark.sources.graphs import synth_strips

    edges = synth_strips(spark, 12)
    rows = clique_percolation3(edges, num_partitions=8).collect()
    return [(r["id"], r["community"]) for r in rows]


def test_closed_form_structure(result):
    # 12 chains: T = 8 + (c % 3) * 4 triangles, T + 2 vertices each; chains
    # with c % 4 == 0 add a detached triangle = 3 memberships (one overlap)
    exp_strip = sum((8 + (c % 3) * 4) + 2 for c in range(12))
    exp_detached = 3 * len([c for c in range(12) if c % 4 == 0])
    assert len(result) == exp_strip + exp_detached
    comms = {c for _, c in result}
    # one community per chain + one per detached triangle
    assert len(comms) == 12 + 3


def test_chain_is_one_community(result):
    by_comm = {}
    for i, c in result:
        by_comm.setdefault(c, set()).add(i)
    # chain 1 (base 1000, T = 12): vertices 1000..1013 in ONE community
    chain1 = {m for m in range(1000, 1014)}
    assert chain1 in by_comm.values()


def test_overlap_and_decoys(result):
    from collections import Counter

    n_comms = Counter(i for i, _ in result)
    # base vertex of c % 4 == 0 chains sits in exactly 2 communities
    # (its strip + the vertex-sharing detached triangle, which k=3
    # percolation must NOT merge)
    for c in (0, 4, 8):
        assert n_comms[c * 1000] == 2
    # interior strip vertices: exactly one community
    assert n_comms[1005] == 1
    # pendant endpoints (base + 500) are in no triangle => no membership
    assert all(i % 1000 != 500 for i, _ in result)
    # detached triangle vertices (base + 600/601) form their own community
    by_comm = {}
    for i, c in result:
        by_comm.setdefault(c, set()).add(i)
    assert {0, 600, 601} in by_comm.values()


def test_plan_no_python(spark):
    from pagerank_spark.algos.percolation import clique_percolation3
    from pagerank_spark.sources.graphs import synth_strips

    out = clique_percolation3(synth_strips(spark, 4), num_partitions=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
