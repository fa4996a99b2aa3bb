"""NDCG: hand-computed on a fixed ranking."""

from pagerank_spark.operators.mleval import ndcg_at_k, ndcg_weights


def test_perfect_ranking_is_one(spark):
    rows = [(1, 3), (2, 2), (3, 1), (4, 0)]
    df = spark.createDataFrame(rows, "rank int, rel long")
    r = ndcg_at_k(df, "rel", "rank", k=4).collect()[0]
    assert r.dcg_micro == r.idcg_micro
    assert r.ndcg_micro == 1_000_000


def test_hand_computed_inversion(spark):
    # rel already non-increasing except ranks 1/2 swapped
    rows = [(1, 0), (2, 3), (3, 1)]
    df = spark.createDataFrame(rows, "rank int, rel long")
    r = ndcg_at_k(df, "rel", "rank", k=10).collect()[0]
    w = ndcg_weights(10)
    dcg = 0 * w[0] + 3 * w[1] + 1 * w[2]
    idcg = 3 * w[0] + 1 * w[1] + 0 * w[2]
    assert (r.dcg_micro, r.idcg_micro) == (dcg, idcg)
    assert r.ndcg_micro == dcg * 1_000_000 // idcg
    assert r.n_ranked == 3


def test_all_zero_relevance(spark):
    df = spark.createDataFrame([(1, 0), (2, 0)], "rank int, rel long")
    r = ndcg_at_k(df, "rel", "rank", k=5).collect()[0]
    assert (r.dcg_micro, r.idcg_micro, r.ndcg_micro) == (0, 0, 0)
