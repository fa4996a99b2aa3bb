"""Mutual kNN: planted reciprocal/non-reciprocal pairs."""

from pagerank_spark.operators.similarity import mutual_knn


def test_planted_reciprocity(spark):
    # 0 and 1 are near-identical (mutual rank-1); 2 points near them but
    # they point back at each other first; k=1 keeps only the (0,1) pair
    vecs = [
        (0, [1.0, 0.0]),
        (1, [0.999, 0.01]),
        (2, [0.7, 0.7]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = [(r.a, r.b, r.rank_ab, r.rank_ba) for r in mutual_knn(df, k=1).collect()]
    assert got == [(0, 1, 1, 1)]
    # k=2: every pair becomes mutual in a 3-point set
    got2 = sorted((r.a, r.b) for r in mutual_knn(df, k=2).collect())
    assert got2 == [(0, 1), (0, 2), (1, 2)]
