"""Product quantization (operators/similarity.py pq_*): encode/ADC
exactness against NumPy given the trained codebooks, determinism, and
recall vs exact search."""

import numpy as np
from pyspark.sql import functions as F

from pagerank_spark.operators.similarity import pq_codebooks, pq_encode, pq_topk


def _emb_df(spark, mat):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(mat)], ["vec_id", "embedding"]
    )


def test_pq_encode_and_adc_match_numpy(spark):
    rng = np.random.RandomState(6)
    mat = rng.randn(60, 16)
    emb = _emb_df(spark, mat)
    books = pq_codebooks(emb, n_sub=4, n_codes=8)
    assert books.shape == (4, 8, 4)

    got = {r["vec_id"]: list(r["codes"]) for r in pq_encode(emb, books).collect()}
    for i, row in enumerate(mat):
        exp = [
            int(np.argmin(((books[s] - row[s * 4:(s + 1) * 4]) ** 2).sum(axis=1)))
            for s in range(4)
        ]
        assert got[i] == exp, i

    q = 0
    lut = np.stack([books[s] @ mat[q, s * 4:(s + 1) * 4] for s in range(4)])
    scores = {
        i: float(lut[np.arange(4), got[i]].sum()) for i in range(60) if i != q
    }
    exp_top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    got_top = [(r["vec_id"], r["score"]) for r in pq_topk(emb, q, k=5, n_sub=4, n_codes=8).collect()]
    assert [i for i, _ in got_top] == [i for i, _ in exp_top]
    for (gi, gs), (_, es) in zip(got_top, exp_top):
        assert abs(gs - es) < 1e-9


def test_pq_deterministic_across_calls(spark):
    # the hash-spread seeding and code assignments are exactly stable; the
    # Lloyd means reduce in partition order, so codebooks agree to fp
    # reduction tolerance (measured 1 ulp) under repartitioning
    rng = np.random.RandomState(1)
    emb = _emb_df(spark, rng.randn(40, 8))
    b1 = pq_codebooks(emb, n_sub=2, n_codes=4)
    b2 = pq_codebooks(emb.repartition(7), n_sub=2, n_codes=4)
    np.testing.assert_allclose(b1, b2, atol=1e-12)


def test_pq_recall_vs_exact(spark):
    # clustered corpus: PQ must recover most of the true top-10
    rng = np.random.RandomState(3)
    centers = rng.randn(8, 16) * 4
    mat = np.vstack([c + rng.randn(25, 16) * 0.3 for c in centers])
    emb = _emb_df(spark, mat)
    q = 5
    exact = np.argsort(-(mat @ mat[q]))
    exact_top = [i for i in exact if i != q][:10]
    got = [r["vec_id"] for r in pq_topk(emb, q, k=10, n_sub=4, n_codes=16).collect()]
    recall = len(set(got) & set(exact_top)) / 10
    assert recall >= 0.6, recall
