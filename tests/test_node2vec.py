"""node2vec-style second-order walks (algos/walks.py:node2vec_walks):
bit-exact pure-Python replay, first-order degeneracy at unit costs, and a
forced-avoid-return fixture."""

from pagerank_spark.algos.walks import _M, node2vec_walks, pseudorandom_walks
from pagerank_spark.sources.graphs import er_edges_numpy


def _edges_df(spark, pairs):
    return spark.createDataFrame([(int(s), int(d)) for s, d in pairs], "src long, dst long")


def _mix(w, t, v):
    return ((w % _M) * 1009 + t * 131 + (v % _M) * 7919) % _M


def _brute(pairs, k, rc, ec):
    adj = {}
    verts = set()
    for s, d in pairs:
        s, d = int(s), int(d)
        adj.setdefault(s, set()).add(d)
        verts.update((s, d))
    rows = {(v, 0): v for v in verts}
    cur = {v: (None, v) for v in verts}  # walk_id -> (prev, current)
    for t in range(1, k + 1):
        nxt = {}
        for w, (prev, u) in cur.items():
            nbrs = adj.get(u)
            if not nbrs:
                continue
            if t == 1:
                v = min(nbrs, key=lambda x: (_mix(w, t, x), x))
            else:
                def cost(x):
                    if x == prev:
                        return rc
                    if x in adj.get(prev, ()):
                        return 1
                    return ec

                v = min(nbrs, key=lambda x: (_mix(w, t, x) * cost(x), x))
            nxt[w] = (u, v)
            rows[(w, t)] = v
        cur = nxt
    return rows


def test_node2vec_matches_python_replay(spark):
    arr = er_edges_numpy(70, 350, seed=29)
    got = {
        (r["walk_id"], r["step"]): r["v"]
        for r in node2vec_walks(
            _edges_df(spark, arr), walk_len=5, return_cost=4, explore_cost=2
        ).collect()
    }
    assert got == _brute(arr, 5, 4, 2)


def test_unit_costs_degenerate_to_first_order(spark):
    arr = er_edges_numpy(50, 220, seed=31)
    df = _edges_df(spark, arr)
    biased = {
        (r["walk_id"], r["step"]): r["v"]
        for r in node2vec_walks(df, walk_len=4, return_cost=1, explore_cost=1).collect()
    }
    plain = {
        (r["walk_id"], r["step"]): r["v"]
        for r in pseudorandom_walks(df, walk_len=4).collect()
    }
    assert biased == plain


def test_huge_return_cost_forces_no_return(spark):
    # 1 <-> 2, 2 -> 3 and 1 -> 3: from the walk at 1, step 2 sits at 2 with
    # candidates {1 (return), 3 (common: 1->3 exists)}. return_cost > M
    # guarantees mix*rc > mix*1, so the walk must go to 3 whatever the mix.
    pairs = [(1, 2), (2, 1), (2, 3), (1, 3), (3, 1)]
    rows = node2vec_walks(
        _edges_df(spark, pairs), walk_len=2, return_cost=2_000_003, explore_cost=1
    ).collect()
    path = {r["step"]: r["v"] for r in rows if r["walk_id"] == 1}
    if path[1] == 2:  # first hop is first-order; only then is step 2 decided
        assert path[2] == 3
    # replay agrees everywhere regardless
    got = {(r["walk_id"], r["step"]): r["v"] for r in rows}
    assert got == _brute(pairs, 2, 2_000_003, 1)


def test_every_hop_is_an_edge(spark):
    pairs = [(1, 2), (2, 3), (2, 4), (4, 1)]
    rows = node2vec_walks(_edges_df(spark, pairs), walk_len=5).collect()
    edges = {(s, d) for s, d in pairs}
    byw = {}
    for r in rows:
        byw.setdefault(r["walk_id"], {})[r["step"]] = r["v"]
    for w, path in byw.items():
        assert path[0] == w
        for t in range(1, max(path) + 1):
            assert (path[t - 1], path[t]) in edges
