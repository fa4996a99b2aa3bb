"""Luby MIS / iterated-MIS coloring (algos/mis.py) vs a pure-Python replay
of the same deterministic priorities."""

import random

from pagerank_spark.algos.mis import KNUTH, luby_mis


def _prio_py(v, rnd):
    return ((v + rnd * 1_000_003) * KNUTH) % (1 << 32)


def _py_luby(pairs, coloring=False):
    e = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    adj = {}
    for a, b in e:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    active = set(adj)
    out = {}
    rnd = 0
    while active:
        rnd += 1
        winners = {
            v
            for v in active
            if all(
                (_prio_py(v, rnd), v) < (_prio_py(u, rnd), u)
                for u in adj[v]
                if u in active
            )
        }
        for v in winners:
            out[v] = rnd
        if coloring:
            active -= winners
        else:
            active -= winners | {u for v in winners for u in adj[v]}
    return out


def _graph(rng, n, m):
    pairs = list({tuple(sorted((rng.randrange(n), rng.randrange(n)))) for _ in range(m)})
    return [list(p) for p in pairs if p[0] != p[1]]


def test_mis_replay_and_properties(spark):
    rng = random.Random(11)
    pairs = _graph(rng, 25, 70)
    res = luby_mis(spark.createDataFrame(pairs, ["src", "dst"]), num_partitions=4)
    assert res.converged
    got = {r["id"]: r["round"] for r in res.members.collect()}
    assert got == _py_luby(pairs)
    # independence + maximality
    mis = set(got)
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    assert not any(u in mis and v in mis for u in adj for v in adj[u])
    assert all(v in mis or (adj[v] & mis) for v in adj)


def test_coloring_replay_and_properness(spark):
    rng = random.Random(4)
    pairs = _graph(rng, 20, 60)
    res = luby_mis(spark.createDataFrame(pairs, ["src", "dst"]), num_partitions=4, coloring=True)
    assert res.converged
    got = {r["id"]: r["round"] for r in res.members.collect()}
    assert got == _py_luby(pairs, coloring=True)
    assert all(got[a] != got[b] for a, b in pairs if a != b)  # proper
    assert set(got) == {v for p in pairs for v in p}  # total


def test_mis_triangle_single_winner_per_component(spark):
    pairs = [[0, 1], [1, 2], [0, 2]]  # triangle: MIS has exactly one vertex
    res = luby_mis(spark.createDataFrame(pairs, ["src", "dst"]), num_partitions=4)
    assert res.members.count() == 1
