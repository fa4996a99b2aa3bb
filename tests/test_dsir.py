"""DSIR importance weights (operators/trainprep.py::dsir_weights) vs an
exact pure-Python replay, the domain-affinity property, and plan shape."""

import math
import re

import pytest
from pyspark.sql import functions as F

KNUTH = 2654435761
MIX = 2246822519
M31 = 1 << 31


def _poly31(s):
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) % M31
    return h


def _mix31(v, salt=0):
    h1 = (v * KNUTH + salt) % M31
    h1 ^= h1 >> 15
    h2 = (h1 * MIX + 1) % M31
    return h2 ^ (h2 >> 13)


def _feats(text):
    t = text.strip()
    if t == "":
        return []
    ws = re.split(r"\s+", t)
    return ws + [f"{a} {b}" for a, b in zip(ws, ws[1:])]


def _nano(x):
    return math.floor(x * 1e9 + 0.5)


def _python_dsir(rows, targets, buckets):
    tc, rc = {}, {}
    tt = tr = 0
    hashed = {
        doc_id: [_mix31(_poly31(f)) % buckets for f in _feats(text)]
        for doc_id, text in rows
    }
    for doc_id, _ in rows:
        for h in hashed[doc_id]:
            rc[h] = rc.get(h, 0) + 1
            tr += 1
            if doc_id in targets:
                tc[h] = tc.get(h, 0) + 1
                tt += 1
    out = {}
    for doc_id, _ in rows:
        hs = hashed[doc_id]
        total = sum(
            _nano(math.log(tc.get(h, 0) + 1))
            - _nano(math.log(tt + buckets))
            - _nano(math.log(rc.get(h, 0) + 1))
            + _nano(math.log(tr + buckets))
            for h in hs
        )
        n = len(hs)
        # Spark `div` and DuckDB `//` both truncate toward zero on
        # negatives (Python // floors) — replicate truncation
        trunc = 0 if n == 0 else (abs(total) // n) * (1 if total >= 0 else -1)
        out[doc_id] = (n, total, trunc)
    return out


@pytest.fixture(scope="module")
def corpus():
    en = [(i, f"the quick brown fox jumps over dog {i % 3}") for i in range(8)]
    other = [(10 + i, f"zr qx vb nm kl pq {i}") for i in range(8)]
    edge = [(30, ""), (31, "  "), (32, "solo")]
    return en, other, edge


def test_matches_python_replay(spark, corpus):
    from pagerank_spark.operators.trainprep import dsir_weights

    en, other, edge = corpus
    rows = en + other + edge
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dsir_weights(df, F.col("doc_id") < 10, n_buckets=64)
    got = {
        r["doc_id"]: (r["n_feats"], r["dsir_nano"], r["avg_dsir_nano"])
        for r in out.collect()
    }
    assert got == _python_dsir(rows, {i for i, _ in en}, 64)


def test_target_affinity(spark, corpus):
    from pagerank_spark.operators.trainprep import dsir_weights

    en, other, edge = corpus
    df = spark.createDataFrame(en + other + edge, "doc_id long, text string")
    rows = {
        r["doc_id"]: r
        for r in dsir_weights(df, F.col("doc_id") < 10, n_buckets=4096).collect()
    }
    # every in-domain doc outweighs every out-of-domain doc
    worst_in = min(rows[i]["avg_dsir_nano"] for i, _ in en)
    best_out = max(rows[i]["avg_dsir_nano"] for i, _ in other)
    assert worst_in > best_out
    # zero-feature docs are the defined zero
    assert rows[30]["n_feats"] == 0 and rows[30]["dsir_nano"] == 0
    assert rows[31]["n_feats"] == 0


def test_plan_no_python(spark, corpus):
    from pagerank_spark.operators.trainprep import dsir_weights

    en, other, edge = corpus
    df = spark.createDataFrame(en + other + edge, "doc_id long, text string")
    out = dsir_weights(df, F.col("doc_id") < 10, n_buckets=64)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
