"""Feature encoders (operators/encoding.py)."""

from collections import Counter

from pagerank_spark.operators.encoding import feature_hash, target_encode_loo
from pagerank_spark.operators.sketches import M31


def _poly31_py(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) % M31
    return h


def test_loo_excludes_self(spark):
    rows = [(1, "a", 10), (2, "a", 20), (3, "a", 30), (4, "b", 7)]
    df = spark.createDataFrame(rows, "id long, cat string, y long")
    got = {r.id: r.te_micro for r in target_encode_loo(df, "cat", "y", "id").collect()}
    assert got[1] == (20 + 30) * 1_000_000 // 2
    assert got[2] == (10 + 30) * 1_000_000 // 2
    assert got[3] == (10 + 20) * 1_000_000 // 2
    # singleton category -> global mean
    assert got[4] == (10 + 20 + 30 + 7) * 1_000_000 // 4


def test_feature_hash_matches_python_replay(spark):
    rows = [(1, "the cat sat"), (2, "the the dog"), (3, None), (4, "  ")]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {
        (r.id, r.bucket): r.cnt
        for r in feature_hash(df, "text", "id", n_buckets=16).collect()
    }
    exp = Counter()
    for i, t in rows:
        for tok in (t or "").lower().split():
            exp[(i, _poly31_py(tok) % 16)] += 1
    assert got == dict(exp)


def test_feature_hash_no_vocab_rows_bounded(spark):
    df = spark.createDataFrame([(i, f"tok{i} shared") for i in range(50)], "id long, text string")
    out = feature_hash(df, "text", "id", n_buckets=8)
    assert out.count() <= 50 * 8
    assert out.groupBy().sum("cnt").first()[0] == 100  # every token counted once
