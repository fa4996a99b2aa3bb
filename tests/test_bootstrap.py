"""Poisson bootstrap (operators/hyptest.py::poisson_bootstrap_mean)."""

import math

import pytest

from pagerank_spark.operators.hyptest import poisson_bootstrap_mean


def _py_replay(rows, n_boot):
    thresholds = []
    acc, fact = 0.0, 1
    for k in range(10):
        if k:
            fact *= k
        acc += math.exp(-1.0) / fact
        thresholds.append(int(math.floor(acc * 4294967296.0)))

    def weight(i, b):
        h1 = ((i * 2654435761) % 4294967296) % 1000003
        h = ((h1 + b * 7919) * 2654435761) % 4294967296
        for k, t in enumerate(thresholds):
            if h < t:
                return k
        return 10

    out = {}
    for b in range(1, n_boot + 1):
        sx = sum(weight(i, b) * x for i, x in rows)
        ne = sum(weight(i, b) for i, _ in rows)
        out[b] = (ne, sx / ne if ne else None)
    return out


def test_bootstrap_exact_replay(spark):
    rows = [(i, 100 + (i * 37) % 250) for i in range(300)]
    df = spark.createDataFrame(rows, ["id", "x"])
    got = {r["b"]: (r["n_eff"], r["mean"]) for r in poisson_bootstrap_mean(df, "x", "id", 20).collect()}
    want = _py_replay(rows, 20)
    assert got.keys() == want.keys()
    for b in want:
        assert got[b][0] == want[b][0]
        assert got[b][1] == pytest.approx(want[b][1], abs=1e-12)


def test_bootstrap_distribution_brackets_true_mean(spark):
    rows = [(i, 1000 + (i * 97) % 500) for i in range(2000)]
    df = spark.createDataFrame(rows, ["id", "x"])
    means = sorted(r["mean"] for r in poisson_bootstrap_mean(df, "x", "id", 100).collect())
    true = sum(x for _, x in rows) / len(rows)
    # 2.5%..97.5% percentile interval should contain the sample mean
    assert means[2] <= true <= means[97]
    # replicate n_eff concentrates near n (Poisson(1) sum)
    assert abs(sum(means) / len(means) - true) < 25


def test_bootstrap_is_repartition_stable(spark):
    rows = [(i, (i * 13) % 77) for i in range(500)]
    df = spark.createDataFrame(rows, ["id", "x"])
    a = sorted((r["b"], r["n_eff"], r["mean"]) for r in poisson_bootstrap_mean(df.repartition(2), "x", "id", 5).collect())
    b = sorted((r["b"], r["n_eff"], r["mean"]) for r in poisson_bootstrap_mean(df.repartition(17), "x", "id", 5).collect())
    assert a == b
