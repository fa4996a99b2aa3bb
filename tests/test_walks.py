"""Pseudorandom walks: exact replay against a pure-Python oracle, and
structural invariants (every hop is an edge, walks die at sinks)."""

from pagerank_spark.algos.walks import _M, pseudorandom_walks
from pagerank_spark.sources.graphs import er_edges_numpy


def _edges_df(spark, pairs):
    return spark.createDataFrame([(int(s), int(d)) for s, d in pairs], "src long, dst long")


def _brute_walks(pairs, k):
    adj = {}
    verts = set()
    for s, d in pairs:
        s, d = int(s), int(d)
        adj.setdefault(s, set()).add(d)
        verts.update((s, d))
    rows = {(v, 0): v for v in verts}
    cur = {v: v for v in verts}  # walk_id -> current vertex
    for t in range(1, k + 1):
        nxt = {}
        for w, u in cur.items():
            nbrs = adj.get(u)
            if not nbrs:
                continue
            v = min(nbrs, key=lambda x: (((w % _M) * 1009 + t * 131 + (x % _M) * 7919) % _M, x))
            nxt[w] = v
            rows[(w, t)] = v
        cur = nxt
    return rows


def test_walks_match_python_replay(spark):
    arr = er_edges_numpy(70, 350, seed=23)
    got = {
        (r["walk_id"], r["step"]): r["v"]
        for r in pseudorandom_walks(_edges_df(spark, arr), walk_len=5).collect()
    }
    assert got == _brute_walks(arr, 5)


def test_walks_every_hop_is_an_edge_and_sinks_stop(spark):
    pairs = [(1, 2), (2, 3), (2, 4)]  # 3 and 4 are sinks
    rows = pseudorandom_walks(_edges_df(spark, pairs), walk_len=6).collect()
    edges = {(s, d) for s, d in pairs}
    byw = {}
    for r in rows:
        byw.setdefault(r["walk_id"], {})[r["step"]] = r["v"]
    for w, path in byw.items():
        assert path[0] == w
        for t in range(1, max(path) + 1):
            assert t in path  # steps are contiguous
            assert (path[t - 1], path[t]) in edges
    # sink starts emit only step 0; walk from 1 runs 1->2->sink (3 steps max)
    assert set(byw[3]) == {0} and set(byw[4]) == {0}
    assert max(byw[1]) == 2


def test_skipgram_pairs_chain(spark):
    from pagerank_spark.algos.walks import skipgram_pairs

    # one walk 0: [10, 11, 12, 13]; window 2
    rows = [(0, 0, 10), (0, 1, 11), (0, 2, 12), (0, 3, 13)]
    walks = spark.createDataFrame(rows, "walk_id long, step int, v long")
    got = {(r["center"], r["context"]): r["cnt"] for r in skipgram_pairs(walks, window=2).collect()}
    exp = {}
    for _, sc, c in rows:
        for _, st, x in rows:
            if sc != st and abs(sc - st) <= 2:
                exp[(c, x)] = exp.get((c, x), 0) + 1
    assert got == exp


def test_pmi_matches_closed_form(spark):
    import math

    from pagerank_spark.algos.walks import pmi_scores

    rows = [(1, 2, 4), (2, 1, 4), (1, 3, 1), (3, 1, 1)]
    pairs = spark.createDataFrame(rows, ["center", "context", "cnt"])
    got = {(r["center"], r["context"]): (r["cnt"], r["pmi"]) for r in pmi_scores(pairs).collect()}
    n = 10
    # marginals: center 1 -> 5, 2 -> 4, 3 -> 1; context 1 -> 5, 2 -> 4, 3 -> 1
    assert got[(1, 2)] == (4, round(math.log(4 * n / (5 * 4)), 6))
    assert got[(1, 3)] == (1, round(math.log(1 * n / (5 * 1)), 6))
    assert got[(3, 1)] == (1, round(math.log(1 * n / (1 * 5)), 6))
    assert len(pmi_scores(pairs, min_count=2).collect()) == 2


def test_negative_samples_exact_replay(spark):
    import collections
    import random

    from pagerank_spark.algos.walks import negative_samples

    rng = random.Random(3)
    prs = [(rng.randrange(0, 50), rng.randrange(0, 30)) for _ in range(400)]
    pairs = spark.createDataFrame(prs, "a long, b long")
    M, K = 64, 3
    got = sorted((r.a, r.b, r.j, r.neg) for r in negative_samples(pairs, k=K, table_size=M).collect())

    # pure-Python replay: exact-integer inverse-CDF table + LCG mixer
    cnt = collections.Counter(b for _, b in prs)
    cum, lo = [], 0
    for t in sorted(cnt):
        cum.append((t, lo))
        lo += cnt[t]
    total = lo

    def lut_tok(target):
        best = None
        for t, l in cum:
            if l <= target:
                best = t
            else:
                break
        return best

    lut = {s: lut_tok(((2 * s + 1) * total) // (2 * M)) for s in range(M)}
    exp = sorted(
        (a, b, j, lut[((a % M) * 1009 + (b % M) * 7919 + j * 131 + 17) % M])
        for a, b in prs
        for j in range(1, K + 1)
    )
    assert got == exp
    # every positive pair got exactly k negatives
    assert len(got) == len(prs) * K
