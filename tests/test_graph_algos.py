"""Connected components, label propagation, triangle counting goldens."""

import numpy as np

from pagerank_spark.algos.components import connected_components
from pagerank_spark.algos.labelprop import label_propagation
from pagerank_spark.algos.triangles import triangle_count, triangle_count_csr, triangles_per_vertex
from pagerank_spark.operators.edges import transcripts_to_graph
from pagerank_spark.sources.graphs import er_edges_numpy
from pagerank_spark.sources.transcripts import synth_transcripts, transcripts_tiny

from .oracles import components_oracle, triangle_oracle

FIX4 = np.array([[0, 1], [1, 2], [2, 0], [2, 3], [3, 0]], dtype=np.int64)


def _edges_df(spark, arr):
    return spark.createDataFrame([(int(s), int(d)) for s, d in arr], "src long, dst long")


def test_components_tiny_transcripts(spark):
    t = transcripts_tiny(spark)
    ids, edges = transcripts_to_graph(t)
    comp = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    assert comp == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 4, 6: 6, 7: 6, 8: 6, 9: 6, 10: 6}


def test_components_equal_conversations_synth(spark):
    t = synth_transcripts(spark, 40)
    ids, edges = transcripts_to_graph(t)
    comp = connected_components(edges, vertices=ids.select(ids.vid.alias("id")))
    joined = ids.join(comp, ids.vid == comp.id).select("conv_id", "component").collect()
    conv2comp = {}
    for r in joined:
        conv2comp.setdefault(r["conv_id"], set()).add(r["component"])
    # each conversation is exactly one component, and components don't cross convs
    assert all(len(s) == 1 for s in conv2comp.values())
    all_comps = [next(iter(s)) for s in conv2comp.values()]
    assert len(all_comps) == len(set(all_comps))


def test_components_vs_oracle_er(spark):
    v, e = 60, 50  # sparse -> several components
    arr = er_edges_numpy(v, e, seed=4)
    golden = components_oracle(v, arr)
    verts = spark.createDataFrame([(i,) for i in range(v)], "id long")
    comp = {r["id"]: r["component"] for r in connected_components(_edges_df(spark, arr), vertices=verts).collect()}
    got = np.array([comp[i] for i in range(v)])
    assert (got == golden).all()


def test_triangle_count_fix4(spark):
    df = _edges_df(spark, FIX4)
    assert triangle_count(df) == 2
    assert triangle_count_csr(df) == 2
    per = {r["id"]: r["triangles"] for r in triangles_per_vertex(df).collect()}
    # triangles {0,1,2} and {0,2,3}
    assert per == {0: 2, 1: 1, 2: 2, 3: 1}


def test_triangle_count_vs_oracle_er(spark):
    v, e = 40, 200
    arr = er_edges_numpy(v, e, seed=5)
    golden = triangle_oracle(v, arr)
    df = _edges_df(spark, arr)
    assert triangle_count(df) == golden
    assert triangle_count_csr(df) == golden


def test_label_propagation_two_cliques(spark):
    # two 4-cliques joined by one bridge edge: labels converge within cliques
    edges = []
    for grp, base in ((0, 0), (1, 4)):
        for i in range(4):
            for j in range(i + 1, 4):
                edges.append((base + i, base + j))
    edges.append((3, 4))  # bridge
    df = _edges_df(spark, np.array(edges, dtype=np.int64))
    labels = {r["id"]: r["label"] for r in label_propagation(df, max_iters=10).collect()}
    # clique consensus: members 0..2 agree, members 5..7 agree
    assert len({labels[i] for i in (0, 1, 2)}) == 1
    assert len({labels[i] for i in (5, 6, 7)}) == 1


def test_label_propagation_isolated_keeps_label(spark):
    df = _edges_df(spark, np.array([[0, 1]], dtype=np.int64))
    verts = spark.createDataFrame([(0,), (1,), (9,)], "id long")
    labels = {r["id"]: r["label"] for r in label_propagation(df, vertices=verts).collect()}
    assert labels[9] == 9


def test_k_core_vs_oracle(spark):
    from pagerank_spark.algos.kcore import k_core

    from .oracles import kcore_oracle

    arr = er_edges_numpy(80, 400, seed=21)
    df = spark.createDataFrame([(int(s), int(d)) for s, d in arr], "src long, dst long")
    for k in (3, 5):
        got = {r["id"] for r in k_core(df, k=k).collect()}
        assert got == kcore_oracle(arr, k)


def test_k_core_fixed_rounds_vs_oracle(spark):
    from pagerank_spark.algos.kcore import k_core

    from .oracles import kcore_oracle

    arr = er_edges_numpy(60, 200, seed=22)
    df = spark.createDataFrame([(int(s), int(d)) for s, d in arr], "src long, dst long")
    for rounds in (1, 2, 4):
        got = {r["id"] for r in k_core(df, k=4, rounds=rounds).collect()}
        assert got == kcore_oracle(arr, 4, rounds=rounds)


def test_k_core_triangle_graph(spark):
    """A triangle plus a pendant: 2-core = the triangle, 3-core empty."""
    from pagerank_spark.algos.kcore import k_core

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (2, 3)], "src long, dst long"
    )
    assert {r["id"] for r in k_core(edges, k=2).collect()} == {0, 1, 2}
    assert k_core(edges, k=3).count() == 0


def test_seeded_labelprop_matches_python_replay(spark):
    import random

    from pagerank_spark.algos.labelprop import label_propagation_seeded

    rng = random.Random(9)
    pairs = list({tuple(sorted((rng.randrange(20), rng.randrange(20)))) for _ in range(50)})
    pairs = [list(p) for p in pairs if p[0] != p[1]]
    seed_map = {0: 10, 7: 20, 13: 30}

    def replay(iters=20):
        adj = {}
        for a, b in pairs:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        lab = dict(seed_map)
        for _ in range(iters):
            new = dict(seed_map)
            for v in adj:
                if v in seed_map:
                    continue
                votes = {}
                for u in adj[v]:
                    if u in lab:
                        votes[lab[u]] = votes.get(lab[u], 0) + 1
                if votes:
                    best = max(votes.items(), key=lambda kv: (kv[1], -kv[0]))
                    new[v] = best[0]
            if new == lab:
                return lab
            lab = new
        return lab

    edges = spark.createDataFrame(pairs, ["src", "dst"])
    seeds = spark.createDataFrame(list(seed_map.items()), ["id", "label"])
    got = {
        r["id"]: (r["label"], r["seed"])
        for r in label_propagation_seeded(edges, seeds, num_partitions=4).collect()
    }
    exp = replay()
    assert {k: v[0] for k, v in got.items()} == exp
    assert all(got[s] == (l, True) for s, l in seed_map.items())
    assert all(not got[v][1] for v in got if v not in seed_map)


def test_seeded_labelprop_unreachable_stays_unlabeled(spark):
    from pagerank_spark.algos.labelprop import label_propagation_seeded

    # two components; seeds only in the first
    edges = spark.createDataFrame([[0, 1], [1, 2], [10, 11]], ["src", "dst"])
    seeds = spark.createDataFrame([(0, 5)], ["id", "label"])
    got = {r["id"]: r["label"] for r in label_propagation_seeded(edges, seeds, num_partitions=4).collect()}
    assert got == {0: 5, 1: 5, 2: 5}  # 10, 11 never labeled
