"""Strongly connected components: engine vs brute-force transitive closure,
plus kill/resume identity through the Checkpointer.

Ground truth is a tiny NumPy Floyd–Warshall-style boolean closure —
independent of both the engine and the DuckDB recursive-CTE oracle used by
the gate (tools/check_oracles.py scc_synth), so the three agree pairwise.
"""

import collections

import numpy as np

from pagerank_spark.algos.scc import strongly_connected_components
from pagerank_spark.plans.checkpoint import Checkpointer
from pagerank_spark.sources.graphs import synth_cyclic


def _truth(pairs, n):
    adj = np.zeros((n, n), dtype=bool)
    for s, d in pairs:
        adj[s, d] = True
    reach = adj.copy()
    for k in range(n):
        reach |= np.outer(reach[:, k], reach[k, :])
    mutual = reach & reach.T
    np.fill_diagonal(mutual, True)
    verts = {s for s, _ in pairs} | {d for _, d in pairs}
    return {i: int(max(np.nonzero(mutual[i])[0])) for i in verts}


def _run(spark, pairs, n):
    edges = spark.createDataFrame(
        [(int(s), int(d)) for s, d in pairs], "src long, dst long"
    )
    res = strongly_connected_components(edges, num_partitions=4)
    assert res.converged
    got = {r.id: r.scc for r in res.labels.collect()}
    assert got == _truth(pairs, n)


def test_scc_synth_cyclic_matches_closure(spark):
    n = 140
    edges = synth_cyclic(spark, n, block=10)
    pairs = [(r.src, r.dst) for r in edges.collect()]
    res = strongly_connected_components(edges, num_partitions=4)
    assert res.converged
    got = {r.id: r.scc for r in res.labels.collect()}
    assert got == _truth(pairs, n)
    # structure is genuinely mixed: singletons (trim), rings, merged blocks
    sizes = collections.Counter(collections.Counter(got.values()).values())
    assert sizes[1] >= 30 and sizes[10] >= 4


def test_scc_two_cycles_dag_bridge(spark):
    # 0->1->2->0 and 5->6->5, bridged 2->5: two SCCs + labels are max ids
    _run(spark, [(0, 1), (1, 2), (2, 0), (5, 6), (6, 5), (2, 5)], 7)


def test_scc_pure_dag_all_singletons(spark):
    _run(spark, [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)], 5)


def test_scc_self_loops_and_isolated_cycle(spark):
    # self-loop-only vertex 9 is a singleton SCC and must appear in output
    pairs = [(9, 9), (1, 2), (2, 1)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    res = strongly_connected_components(edges, num_partitions=4)
    got = {r.id: r.scc for r in res.labels.collect()}
    assert res.converged and got == {9: 9, 1: 2, 2: 2}


def test_scc_single_big_cycle(spark):
    # one 23-cycle with monotone ids: the worst case for max-propagation
    # (the wavefront moves one hop per superstep) — exercises O(D) supersteps
    # in both the color and collect fixpoints
    n = 23
    _run(spark, [(i, (i + 1) % n) for i in range(n)], n)


def test_scc_resume_identity(spark, tmp_path):
    # four 2-cycles chained high->low: each round's collect can only take
    # the current top color class, forcing 4 outer rounds (the condensation
    # chain points against the id order)
    pairs = [(0, 1), (1, 0), (2, 3), (3, 2), (4, 5), (5, 4), (6, 7), (7, 6),
             (6, 4), (4, 2), (2, 0)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    full = strongly_connected_components(edges, num_partitions=4)
    exp = {r.id: r.scc for r in full.labels.collect()}
    assert full.converged and full.rounds >= 2  # interruption below is mid-run

    ck = Checkpointer(spark, str(tmp_path / "scc_ck"))
    partial = strongly_connected_components(edges, max_rounds=1, num_partitions=4, checkpointer=ck)
    assert not partial.converged
    resumed = strongly_connected_components(edges, num_partitions=4, checkpointer=ck)
    assert resumed.converged and resumed.rounds == full.rounds
    got = {r.id: r.scc for r in resumed.labels.collect()}
    assert got == exp == _truth(pairs, 8)

    # a rerun against the converged checkpoint returns without peeling
    again = strongly_connected_components(edges, num_partitions=4, checkpointer=ck)
    assert again.converged
    assert {r.id: r.scc for r in again.labels.collect()} == exp


def test_scc_budget_cut_reports_unconverged(spark):
    # two chained 2-cycles need 2 rounds; max_rounds=1 must return a partial
    # result flagged converged=False (never a silently-wrong full answer)
    pairs = [(0, 1), (1, 0), (2, 3), (3, 2), (2, 0)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    res = strongly_connected_components(edges, max_rounds=1, num_partitions=4)
    assert not res.converged and res.rounds == 1
    got = {r.id: r.scc for r in res.labels.collect()}
    assert got == {2: 3, 3: 3}  # round 1 resolves only the top color class


def test_bowtie_decomposition_hand_graph(spark):
    # core cycle {1,2,3}; 0 -> core (IN); core -> 4 (OUT); 0 -> 5 is an
    # IN-tendril (OTHER); 9 -> 10 disconnected (OTHER); 4 -> 6 OUT-chain
    # stays OUT-reachable (6 is OUT); singleton SCCs everywhere else
    from pagerank_spark.algos.scc import bowtie_decomposition

    pairs = [(1, 2), (2, 3), (3, 1), (0, 1), (3, 4), (0, 5), (9, 10), (4, 6)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    got = {r.id: r.region for r in bowtie_decomposition(edges, num_partitions=4).collect()}
    assert got == {
        1: "SCC", 2: "SCC", 3: "SCC",
        0: "IN",
        4: "OUT", 6: "OUT",
        5: "OTHER", 9: "OTHER", 10: "OTHER",
    }
