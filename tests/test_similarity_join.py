"""Exact set-similarity join (operators/dedup.py:jaccard_similarity_join):
prefix filtering must lose NO pairs — engine output == brute-force token-set
Jaccard on the same corpus, values exact integers."""

import pytest
from pyspark.sql import functions as F

from pagerank_spark.operators.dedup import jaccard_similarity_join


def _corpus():
    docs = []
    for i in range(60):
        words = [f"w{(i * 7 + k) % 40}" for k in range(10)]
        docs.append((i, " ".join(words)))
    # planted near-dups: one word swapped -> inter 9, union 11 (J ~ .818)
    for i in range(0, 60, 6):
        words = [f"w{(i * 7 + k) % 40}" for k in range(9)] + ["zz%d" % i]
        docs.append((1000 + i, " ".join(words)))
    docs.append((9000, ""))  # empty doc: no tokens, never in output
    return docs


def _brute(docs, pct):
    sets = {i: set(t.lower().split()) - {""} for i, t in docs}
    want = {}
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            if not sets[a] or not sets[b]:
                continue
            inter = len(sets[a] & sets[b])
            un = len(sets[a] | sets[b])
            if inter * 100 >= pct * un:
                want[(a, b)] = (inter, un, (inter * 1_000_000) // un)
    return want


def _got(df):
    return {
        (r["a"], r["b"]): (r["inter"], r["union_size"], r["jaccard_micro"])
        for r in df.collect()
    }


def test_matches_bruteforce(spark):
    docs = _corpus()
    out = jaccard_similarity_join(spark.createDataFrame(docs, ["doc_id", "text"]), 80)
    want = _brute(docs, 80)
    assert _got(out) == want
    assert len(want) >= 10  # the planted near-dups actually exercise the join


def test_threshold_boundary_inclusive(spark):
    # inter 8, union 10 -> exactly 0.80: must be included at pct=80
    a = " ".join(f"w{k}" for k in range(9))
    b = " ".join(f"w{k}" for k in range(8)) + " w9"
    df = spark.createDataFrame([(1, a), (2, b)], ["doc_id", "text"])
    got = _got(jaccard_similarity_join(df, 80))
    assert got == {(1, 2): (8, 10, 800000)}
    assert _got(jaccard_similarity_join(df, 81)) == {}


def test_lower_threshold_widens(spark):
    docs = _corpus()
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    assert _got(jaccard_similarity_join(df, 50)) == _brute(docs, 50)


def test_hot_token_cap_drops_and_logs(spark, caplog):
    # 30 identical docs: every prefix token is hot at cap 5 -> pairs missed,
    # warning logged (the documented precision trade); distinct docs with
    # cold prefixes are unaffected
    docs = [(i, "x0 x1 x2 x3 x4") for i in range(30)]
    docs += [(100, "a b c d e f g h i j"), (101, "a b c d e f g h i k")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    import logging

    with caplog.at_level(logging.WARNING, logger="pagerank_spark.operators.dedup"):
        got = _got(jaccard_similarity_join(df, 80, max_token_bucket=5))
    assert (100, 101) in got and all(a >= 100 for a, _ in got)
    assert any("hot prefix tokens" in r.message for r in caplog.records)
    # uncapped finds all 30*29/2 identical pairs too
    assert len(_got(jaccard_similarity_join(df, 80))) == 435 + 1


def test_no_cartesian_in_plan(spark):
    df = spark.createDataFrame(_corpus(), ["doc_id", "text"])
    plan = jaccard_similarity_join(df, 80)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_bad_threshold_rejected(spark):
    df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    with pytest.raises(ValueError):
        jaccard_similarity_join(df, 0)
    with pytest.raises(ValueError):
        jaccard_similarity_join(df, 101)
