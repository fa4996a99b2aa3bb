"""Neighborhood feature aggregation (algos/gnn.py) vs a NumPy oracle."""

import numpy as np
from pyspark.sql import functions as F

from pagerank_spark.algos.gnn import neighborhood_mean


def _numpy_prop(pairs, feats, hops):
    ids = sorted({v for p in pairs for v in p})
    nin = {v: [v] for v in ids}  # self-loop
    for s, d in pairs:
        nin[d].append(s)
    h = {v: np.asarray(feats[v], dtype=float) for v in ids if v in feats}
    for _ in range(hops):
        nh = {}
        for v in ids:
            contrib = [h[u] for u in nin[v] if u in h]
            if contrib:
                nh[v] = np.mean(contrib, axis=0)
        h = nh
    return h


def test_neighborhood_mean_matches_numpy(spark):
    rng = np.random.RandomState(3)
    pairs = [(int(a), int(b)) for a, b in rng.randint(0, 12, size=(40, 2)) if a != b]
    feats = {i: rng.rand(5).tolist() for i in range(12)}
    edges = spark.createDataFrame(pairs, ["src", "dst"])
    fdf = spark.createDataFrame([(i, v) for i, v in feats.items()], ["id", "embedding"])
    for hops in (1, 2):
        got = {r["id"]: r["embedding"] for r in neighborhood_mean(edges, fdf, hops=hops, num_partitions=4).collect()}
        exp = _numpy_prop(pairs, feats, hops)
        assert set(got) == set(exp)
        for v in exp:
            np.testing.assert_allclose(got[v], exp[v], atol=1e-12)


def test_neighborhood_mean_missing_features_average_present_only(spark):
    # vertex 2 has no feature: 0 -> 2 and 1 -> 2; mean over {0, 1} only
    edges = spark.createDataFrame([(0, 2), (1, 2)], ["src", "dst"])
    fdf = spark.createDataFrame([(0, [1.0, 3.0]), (1, [3.0, 5.0])], ["id", "embedding"])
    got = {r["id"]: r["embedding"] for r in neighborhood_mean(edges, fdf, hops=1, num_partitions=4).collect()}
    np.testing.assert_allclose(got[2], [2.0, 4.0])
    np.testing.assert_allclose(got[0], [1.0, 3.0])  # self-loop only


def test_neighborhood_mean_chain_two_hops(spark):
    # 0 -> 1 -> 2 chain, hop 2 mixes grand-neighbor mass into 2
    edges = spark.createDataFrame([(0, 1), (1, 2)], ["src", "dst"])
    fdf = spark.createDataFrame([(0, [8.0]), (1, [0.0]), (2, [0.0])], ["id", "embedding"])
    got = {r["id"]: r["embedding"][0] for r in neighborhood_mean(edges, fdf, hops=2, num_partitions=4).collect()}
    # h1: 0 -> 8, 1 -> 4, 2 -> 0 ; h2: 2 -> mean(h1[1], h1[2]) = 2
    assert got[0] == 8.0 and got[1] == 6.0 and got[2] == 2.0


def test_arrow_mode_parity_with_exploded(spark):
    """The wide-D Arrow path computes the same propagation as the exploded
    Catalyst path (summation-order 1-ulp tolerance), across hops."""
    rng = np.random.RandomState(9)
    pairs = [(int(a), int(b)) for a, b in rng.randint(0, 30, size=(120, 2)) if a != b]
    feats = [(i, rng.rand(8).tolist()) for i in range(30)]
    edges = spark.createDataFrame(pairs, ["src", "dst"])
    fdf = spark.createDataFrame(feats, ["id", "embedding"])
    for hops in (1, 2):
        exploded = {
            r["id"]: r["embedding"]
            for r in neighborhood_mean(edges, fdf, hops=hops, num_partitions=4).collect()
        }
        arrow = {
            r["id"]: r["embedding"]
            for r in neighborhood_mean(
                edges, fdf, hops=hops, num_partitions=4, mode="arrow"
            ).collect()
        }
        assert set(exploded) == set(arrow)
        for v in exploded:
            np.testing.assert_allclose(arrow[v], exploded[v], rtol=1e-12, atol=1e-12)


def test_arrow_mode_matches_numpy_wide(spark):
    rng = np.random.RandomState(4)
    pairs = [(int(a), int(b)) for a, b in rng.randint(0, 10, size=(30, 2)) if a != b]
    feats = {i: rng.rand(64).tolist() for i in range(10)}
    edges = spark.createDataFrame(pairs, ["src", "dst"])
    fdf = spark.createDataFrame([(i, v) for i, v in feats.items()], ["id", "embedding"])
    got = {
        r["id"]: r["embedding"]
        for r in neighborhood_mean(edges, fdf, hops=2, num_partitions=4, mode="auto").collect()
    }
    exp = _numpy_prop(pairs, feats, 2)
    assert set(got) == set(exp)
    for v in exp:
        np.testing.assert_allclose(got[v], exp[v], atol=1e-10)


def test_mode_validation(spark):
    import pytest as _pytest

    edges = spark.createDataFrame([(0, 1)], ["src", "dst"])
    fdf = spark.createDataFrame([(0, [1.0])], ["id", "embedding"])
    with _pytest.raises(ValueError):
        neighborhood_mean(edges, fdf, mode="columnar")


class TestSampleNeighbors:
    def _graph(self, spark):
        from pagerank_spark.sources.graphs import er_graph

        edges = er_graph(spark, 120, 960, seed=23)
        return edges, [(r["src"], r["dst"]) for r in edges.collect()]

    @staticmethod
    def _py_sample(el, k, seed):
        KNUTH, MIX, M31 = 2654435761, 2246822519, 1 << 31
        by_src = {}
        for s, d in el:
            h1 = (s * KNUTH + d) % M31
            prio = (((h1 + seed) % M31) * MIX + 1) % M31
            by_src.setdefault(s, []).append((prio, d))
        out = set()
        for s, lst in by_src.items():
            for _, d in sorted(lst)[:k]:
                out.add((s, d))
        return out

    def test_exact_membership_replay(self, spark):
        from pagerank_spark.algos.gnn import sample_neighbors

        edges, el = self._graph(spark)
        for k, seed in [(1, 0), (3, 0), (3, 99), (1000, 0)]:
            got = {(r["src"], r["dst"]) for r in sample_neighbors(edges, k, seed).collect()}
            assert got == self._py_sample(el, k, seed)

    def test_repartition_stable(self, spark):
        from pagerank_spark.algos.gnn import sample_neighbors

        edges, _ = self._graph(spark)
        a = {(r["src"], r["dst"]) for r in sample_neighbors(edges, 2, 7).collect()}
        b = {
            (r["src"], r["dst"])
            for r in sample_neighbors(edges.repartition(13), 2, 7).collect()
        }
        assert a == b

    def test_fanout_bound_and_seed_variation(self, spark):
        from pagerank_spark.algos.gnn import sample_neighbors
        import pyspark.sql.functions as F

        edges, el = self._graph(spark)
        s = sample_neighbors(edges, 2, 0)
        assert s.groupBy("src").count().agg(F.max("count")).collect()[0][0] <= 2
        other = {(r["src"], r["dst"]) for r in sample_neighbors(edges, 2, 1).collect()}
        mine = {(r["src"], r["dst"]) for r in s.collect()}
        assert mine != other  # different seeds sample different subgraphs

    def test_rejects_bad_k(self, spark):
        from pagerank_spark.algos.gnn import sample_neighbors

        edges, _ = self._graph(spark)
        import pytest

        with pytest.raises(ValueError):
            sample_neighbors(edges, 0)


def test_auto_mode_crossover_knob(spark):
    # Round-5: the exploded->arrow crossover is a parameter (and env
    # override), not a baked-in sandbox constant. Force each side of the
    # crossover on the same 8-d input and check the results agree (the two
    # modes are parity-tested elsewhere; here we check the knob routes).
    from pagerank_spark.algos.gnn import neighborhood_mean

    edges = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], "src long, dst long")
    feats = spark.createDataFrame(
        [(i, [float(i)] * 8) for i in range(3)], "id long, embedding array<double>"
    )
    lo = neighborhood_mean(edges, feats, mode="auto", arrow_min_dim=4).collect()
    hi = neighborhood_mean(edges, feats, mode="auto", arrow_min_dim=1000).collect()
    assert {r.id: r.embedding for r in lo} == {r.id: r.embedding for r in hi}
