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
