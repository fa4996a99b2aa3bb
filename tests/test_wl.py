"""1-WL color refinement: pure-Python replay parity + the classic
isomorphism-invariance / distinguishing-power sanity properties."""

from collections import defaultdict

from pagerank_spark.operators.graphstats import wl_refinement

MOD = 2147483647
MUL = 1000003


def _wl_py(pairs, rounds):
    adj = defaultdict(set)
    for s, d in pairs:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    c = {v: len(ns) for v, ns in adj.items()}
    for _ in range(rounds):
        nxt = {}
        for v in c:
            h = 0
            for x in [c[v]] + sorted(c[n] for n in adj[v]):
                h = (h * MUL + x) % MOD
            nxt[v] = h
        c = nxt
    return c


def test_wl_matches_python_replay(spark):
    pairs = [(0, 1), (1, 2), (2, 3), (3, 0), (1, 3), (4, 0), (5, 4), (6, 4), (7, 7)]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    got = {r.id: r.color for r in wl_refinement(edges, rounds=3, num_partitions=4).collect()}
    assert got == _wl_py(pairs, 3)


def test_wl_isomorphism_invariant_histogram(spark):
    # relabel v -> (7v + 3) mod 31: a bijection on 0..30 — the COLOR
    # HISTOGRAM (multiset of colors) must be identical on both labelings
    base = [(i, (i + 1) % 10) for i in range(10)] + [(3, 7), (2, 8), (10, 3), (11, 10)]
    remap = [((7 * s + 3) % 31, (7 * d + 3) % 31) for s, d in base]
    e1 = spark.createDataFrame(base, "src long, dst long")
    e2 = spark.createDataFrame(remap, "src long, dst long")
    h1 = sorted(r.color for r in wl_refinement(e1, rounds=3, num_partitions=4).collect())
    h2 = sorted(r.color for r in wl_refinement(e2, rounds=3, num_partitions=4).collect())
    assert h1 == h2


def test_wl_distinguishes_path_from_star(spark):
    # P4 and K1,3 have the same degree SEQUENCE total but differ at 1-WL
    path = spark.createDataFrame([(0, 1), (1, 2), (2, 3)], "src long, dst long")
    star = spark.createDataFrame([(0, 1), (0, 2), (0, 3)], "src long, dst long")
    hp = sorted(r.color for r in wl_refinement(path, rounds=2, num_partitions=4).collect())
    hs = sorted(r.color for r in wl_refinement(star, rounds=2, num_partitions=4).collect())
    assert hp != hs
