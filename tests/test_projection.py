"""Signed random projection (operators/projection.py): bit-exact pure-Python
replay of the hash, the quantization, and the integer sums."""

import math

import pytest
from pyspark.sql import functions as F

from pagerank_spark.operators.projection import (
    KNUTH,
    M31,
    MIX,
    signed_random_projection,
    srp_code,
)


def _sign(idx, salt=5):
    h1 = (idx * KNUTH + salt) % M31
    h1 ^= h1 >> 15
    h2 = (h1 * MIX + 1) % M31
    h2 ^= h2 >> 13
    return 1 if (h2 % 2) == 1 else -1


def _quant(x, scale=1024):
    return math.floor(float(x) * float(scale) + 0.5)


def _replay(vecs, k=16, scale=1024, salt=5):
    out = {}
    for vid, v in vecs:
        q = [_quant(x, scale) for x in v]
        for j in range(k):
            out[(vid, j)] = sum(_sign(i * k + j, salt) * q[i] for i in range(len(q)))
    return out


VECS = [
    (0, [0.25, -1.5, 3.0, 0.0001]),
    (1, [1.0, 1.0, 1.0, 1.0]),
    (2, [-0.333, 2.718, -3.141, 0.5]),
    (3, [0.0, 0.0, 0.0, 0.0]),
]


def test_projection_matches_python_replay(spark):
    df = spark.createDataFrame(VECS, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    got = {
        (r["vec_id"], r["dim"]): r["proj"]
        for r in signed_random_projection(df, k=16).collect()
    }
    want = _replay([(i, v) for i, v in VECS])
    assert got == want


def test_identical_vectors_identical_projections(spark):
    df = spark.createDataFrame(
        [(7, [0.1, 0.2, 0.3]), (8, [0.1, 0.2, 0.3])], ["vec_id", "embedding"]
    )
    rows = signed_random_projection(df, k=8).collect()
    a = sorted((r["dim"], r["proj"]) for r in rows if r["vec_id"] == 7)
    b = sorted((r["dim"], r["proj"]) for r in rows if r["vec_id"] == 8)
    assert a == b


def test_code_consistent_with_projection_signs(spark):
    df = spark.createDataFrame(VECS, ["vec_id", "embedding"])
    proj = {
        (r["vec_id"], r["dim"]): r["proj"]
        for r in signed_random_projection(df, k=12).collect()
    }
    codes = {r["vec_id"]: r["code"] for r in srp_code(df, k=12).collect()}
    for vid, _ in VECS:
        want = sum(1 << j for j in range(12) if proj[(vid, j)] > 0)
        assert codes[vid] == want
    assert codes[3] == 0  # zero vector: no positive projections


def test_zero_shuffle_plan(spark):
    df = spark.createDataFrame(VECS, ["vec_id", "embedding"])
    for out in (signed_random_projection(df, k=8), srp_code(df, k=8)):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bad_k_rejected(spark):
    df = spark.createDataFrame(VECS, ["vec_id", "embedding"])
    with pytest.raises(ValueError):
        signed_random_projection(df, k=0)
    with pytest.raises(ValueError):
        srp_code(df, k=63)
