"""Hubness histogram: planted hub geometry, conservation, antihubs."""

from pagerank_spark.operators.similarity import hubness


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )


def test_histogram_sums_to_vector_count_and_edges(spark):
    vecs = [[1, 0], [0.9, 0.1], [0, 1], [0.1, 0.9], [0.7, 0.7], [1, 0.2]]
    hist = {r.n_rknn: r.n_vectors for r in hubness(_emb(spark, vecs), k=2).collect()}
    assert sum(hist.values()) == len(vecs)
    assert sum(n * c for n, c in hist.items()) == len(vecs) * 2  # k edges each


def test_planted_hub_and_antihub(spark):
    # hub [1,0] + 4 near-copies; antihub [0,1] orthogonal to everyone
    vecs = [[1, 0], [0.99, 0.01], [0.98, 0.02], [0.97, 0.03], [0.96, 0.04], [0, 1]]
    df = _emb(spark, vecs)
    hist = {r.n_rknn: r.n_vectors for r in hubness(df, k=1).collect()}
    # vec 5's single nearest is some x-axis vector; vectors 0..4 pick a
    # same-cluster neighbor; vec 5 gets zero incoming
    assert hist.get(0, 0) >= 1
    assert sum(hist.values()) == 6


def test_zero_norm_vectors_excluded(spark):
    vecs = [[1, 0], [0.9, 0.1], [0, 0]]
    hist = {r.n_rknn: r.n_vectors for r in hubness(_emb(spark, vecs), k=1).collect()}
    assert sum(hist.values()) == 2
