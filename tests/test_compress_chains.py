"""Chain (unary-path) compression — hand fixtures and a brute-force
pointer-chase oracle."""

import pytest

from pagerank_spark.operators.graphstats import compress_chains


def _edges_df(spark, pairs):
    return spark.createDataFrame([(int(s), int(d)) for s, d in pairs], "src long, dst long")


def _brute_compress(pairs):
    """Reference semantics: drop self-loops, dedupe; a chain vertex has
    out-degree 1 and in-degree 1; every edge from a NON-chain vertex is kept
    with its target chased through consecutive chain vertices to the terminal."""
    edges = {(int(s), int(d)) for s, d in pairs if int(s) != int(d)}
    outd, ind, succ = {}, {}, {}
    for s, d in edges:
        outd[s] = outd.get(s, 0) + 1
        ind[d] = ind.get(d, 0) + 1
        succ[s] = d  # only trusted where outd == 1
    chain = {v for v in outd if outd[v] == 1 and ind.get(v, 0) == 1}
    out = set()
    for s, d in edges:
        if s in chain:
            continue
        t = d
        seen = set()
        while t in chain and t not in seen:
            seen.add(t)
            t = succ[t]
        out.add((s, t))
    return out


def _run(spark, pairs, rounds=8):
    got = {(r["src"], r["dst"]) for r in compress_chains(_edges_df(spark, pairs), rounds=rounds).collect()}
    assert got == _brute_compress(pairs)
    return got


def test_simple_chain_collapses(spark):
    # 1 -> 2 -> 3 -> 4 -> 5 with a side branch 1 -> 6: vertices 2,3,4 are
    # (1,1)-chain; result is {(1,5), (1,6)}
    got = _run(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (1, 6)])
    assert got == {(1, 5), (1, 6)}


def test_branching_skeleton_preserved(spark):
    # Two chains meeting at a hub: a->x->y->hub, b->z->hub, hub->c
    got = _run(spark, [(10, 1), (1, 2), (2, 7), (20, 3), (3, 7), (7, 30), (40, 10), (40, 20)])
    # hub 7 has in-degree 2 so it is not a chain vertex; 1,2,3 are chain;
    # 10 and 20 have in-degree 1 and out-degree 1 -> also chain vertices
    assert (40, 7) in got and (7, 30) in got


def test_cycle_through_branching_vertex_self_loop(spark):
    # a -> b -> c -> a where a also has an external edge: chain b,c collapse,
    # cycle becomes the self-loop (a, a) — preserved by design
    got = _run(spark, [(1, 2), (2, 3), (3, 1), (1, 9), (8, 1)])
    assert (1, 1) in got


def test_pure_ring_dropped(spark):
    # an isolated 2-regular ring has no entry edge and vanishes whole
    got = _run(spark, [(1, 2), (2, 3), (3, 1), (7, 8)])
    assert got == {(7, 8)}


def test_self_loops_and_dupes_ignored(spark):
    got = _run(spark, [(1, 2), (1, 2), (2, 2), (2, 3), (3, 4)])
    # self-loop (2,2) dropped before degree counting, so 2 and 3 are chain
    assert got == {(1, 4)}


def test_long_chain_needs_log_rounds(spark):
    # chain of 40 interior vertices resolves in ceil(log2 40)=6 jumps
    pairs = [(i, i + 1) for i in range(0, 42)] + [(0, 99)]
    got = _run(spark, pairs, rounds=6)
    assert (0, 42) in got
