"""Adjusted Rand Index: closed forms (identical, independent, known)."""

import math

from pagerank_spark.operators.mleval import partition_agreement


def _mk(spark, assign):
    return spark.createDataFrame(list(assign.items()), "id long, label long")


def test_ari_identical_partitions_one(spark):
    a = {i: i % 3 for i in range(12)}
    la = _mk(spark, a)
    r = partition_agreement(la, _mk(spark, {k: v * 10 for k, v in a.items()})).collect()[0]
    assert r.ari_micro == 1_000_000  # label names don't matter


def test_ari_known_value(spark):
    # classic 6-point example: A = {0,1,2 | 3,4,5}, B = {0,1 | 2,3 | 4,5}
    a = {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1}
    b = {0: 0, 1: 0, 2: 1, 3: 1, 4: 2, 5: 2}
    r = partition_agreement(_mk(spark, a), _mk(spark, b)).collect()[0]
    # cells: (0,0)=2 (0,1)=1 (1,1)=1 (1,2)=2 -> sc = 1+0+0+1 = 2
    # sa = 2*C(3,2) = 6; sb = 3*C(2,2)... C(2,2)=1 each -> sb = 3; T = 15
    assert (r.n, r.sum_cells_pairs, r.sum_a_pairs, r.sum_b_pairs) == (6, 2, 6, 3)
    expect = 6.0 * 3 / 15.0
    ari = (2.0 - expect) / ((6 + 3) / 2.0 - expect)
    assert r.ari_micro == math.floor(ari * 1e6 + 0.5)


def test_ari_singletons_vs_one_block_zero(spark):
    # A all singletons, B one block: sa = 0 -> ARI = (0-0)/(sb/2-0) = 0
    a = {i: i for i in range(8)}
    b = {i: 0 for i in range(8)}
    r = partition_agreement(_mk(spark, a), _mk(spark, b)).collect()[0]
    assert r.ari_micro == 0


def test_ece_exact_replay(spark):
    """ece_exact (operators/mleval.py): pure-Python replay + the
    perfectly-calibrated-degenerate and maximally-miscalibrated cases."""
    from pagerank_spark.operators.mleval import ece_exact
    import pytest as _pt
    from pyspark.sql import functions as F

    rows = [(i, (i * 97) % 1000001, 1 if (i * 31) % 100 < (i * 97) % 1000001 // 10000 else 0)
            for i in range(400)]
    df = spark.createDataFrame(rows, "id long, conf long, y long")
    got = {r["bin"]: (r["n"], r["pos"], r["sum_score"], r["gap"], r["ece_micro"])
           for r in ece_exact(df, "conf", "y").collect()}
    bins = {}
    for _, c, y in rows:
        b = c * 10 // 1000001
        n, p, s = bins.get(b, (0, 0, 0))
        bins[b] = (n + 1, p + y, s + c)
    tg = sum(abs(p * 1000000 - s) for n, p, s in bins.values())
    tn = sum(n for n, _, _ in bins.values())
    for b, (n, p, s) in bins.items():
        assert got[b] == (n, p, s, abs(p * 1000000 - s), tg // tn)
    # all-confident, all-correct => zero ECE
    perfect = spark.createDataFrame([(1000000, 1)] * 10, "conf long, y long")
    assert ece_exact(perfect, "conf", "y").collect()[0]["ece_micro"] == 0
    # all-confident, all-wrong => ECE = 1e6
    wrong = spark.createDataFrame([(1000000, 0)] * 10, "conf long, y long")
    assert ece_exact(wrong, "conf", "y").collect()[0]["ece_micro"] == 1000000
    with _pt.raises(ValueError):
        ece_exact(df, "conf", "y", n_bins=0)
