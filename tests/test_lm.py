"""Bigram LM training + surprisal scoring (operators/lm.py) vs an exact
pure-Python replay, plus the CCNet filter property and plan shape."""

import math

import pytest
from pyspark.sql import functions as F


def _python_lm_scores(train_texts, score_rows, add_k=1):
    """Exact replay of train_bigram_lm + lm_score semantics."""
    uni, bi = {}, {}
    for t in train_texts:
        ws = t.split(" ")
        for w in ws:
            uni[w] = uni.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            bi[(a, b)] = bi.get((a, b), 0) + 1
    v = len(uni)
    out = {}
    for doc_id, t in score_rows:
        ws = t.split(" ")
        terms = list(zip(ws, ws[1:]))
        total = 0
        for a, b in terms:
            p = (bi.get((a, b), 0) + add_k) / (uni.get(a, 0) + add_k * v)
            # Python round() is banker's; replicate HALF_UP on positives
            x = -math.log(p) * 1e6
            total += math.floor(x + 0.5)
        n = len(terms)
        out[doc_id] = (n, total, 0 if n == 0 else total // n)
    return out


@pytest.fixture(scope="module")
def corpus(spark):
    train = [
        "the cat sat on the mat",
        "the dog sat on the rug",
        "a cat and a dog",
        "the cat and the dog sat",
    ]
    score = [
        (0, "the cat sat"),
        (1, "the dog sat on the mat"),
        (2, "zebra quark flux"),  # fully OOV
        (3, "single"),  # no bigrams
        (4, "the the the the"),
    ]
    return train, score


def test_matches_python_replay(spark, corpus):
    from pagerank_spark.operators.lm import lm_score, train_bigram_lm

    train, score = corpus
    train_df = spark.createDataFrame([(t,) for t in train], "text string")
    score_df = spark.createDataFrame(score, "doc_id long, text string")
    uni, bi, v = train_bigram_lm(train_df)
    assert v == len({w for t in train for w in t.split(" ")})
    got = {
        r["doc_id"]: (r["n_bigrams"], r["surprisal_micro"], r["avg_surprisal_micro"])
        for r in lm_score(score_df, uni, bi, v).collect()
    }
    assert got == _python_lm_scores(train, score)


def test_surprisal_positive_and_oov_higher(spark, corpus):
    from pagerank_spark.operators.lm import lm_score, train_bigram_lm

    train, score = corpus
    train_df = spark.createDataFrame([(t,) for t in train], "text string")
    score_df = spark.createDataFrame(score, "doc_id long, text string")
    uni, bi, v = train_bigram_lm(train_df)
    rows = {r["doc_id"]: r for r in lm_score(score_df, uni, bi, v).collect()}
    # surprisal is strictly positive wherever bigrams exist
    for r in rows.values():
        if r["n_bigrams"] > 0:
            assert r["surprisal_micro"] > 0
    # the fully-OOV document scores as the least corpus-like (CCNet signal)
    in_domain = rows[0]["avg_surprisal_micro"]
    oov = rows[2]["avg_surprisal_micro"]
    assert oov > in_domain
    # no-bigram doc is the defined zero
    assert rows[3]["n_bigrams"] == 0 and rows[3]["surprisal_micro"] == 0


def test_plan_no_python(spark, corpus):
    from pagerank_spark.operators.lm import lm_score, train_bigram_lm

    train, score = corpus
    train_df = spark.createDataFrame([(t,) for t in train], "text string")
    score_df = spark.createDataFrame(score, "doc_id long, text string")
    uni, bi, v = train_bigram_lm(train_df)
    plan = lm_score(score_df, uni, bi, v)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_min_k_surprisal_replay(spark, corpus):
    """Min-K% (operators/lm.py::min_k_surprisal) vs pure-Python: top-20%
    surprisal mean, OOV docs dominated by their worst bigrams."""
    from pagerank_spark.operators.lm import min_k_surprisal, train_bigram_lm

    train, score = corpus
    train_df = spark.createDataFrame([(t,) for t in train], "text string")
    score_df = spark.createDataFrame(score, "doc_id long, text string")
    uni, bi, v = train_bigram_lm(train_df)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["m_topk"], r["mink_sum_micro"], r["mink_avg_micro"])
        for r in min_k_surprisal(score_df, uni, bi, v, k_pct=50).collect()
    }
    full = _python_lm_scores(train, score)
    # python replay: rebuild per-term surprisals, take top ceil(n*50/100)
    uni_c, bi_c = {}, {}
    for t in train:
        ws = t.split(" ")
        for w in ws:
            uni_c[w] = uni_c.get(w, 0) + 1
        for a, b in zip(ws, ws[1:]):
            bi_c[(a, b)] = bi_c.get((a, b), 0) + 1
    vs = len(uni_c)
    for doc_id, text in score:
        ws = text.split(" ")
        sps = []
        for a, b in zip(ws, ws[1:]):
            import math as _m

            p = (bi_c.get((a, b), 0) + 1) / (uni_c.get(a, 0) + vs)
            sps.append(_m.floor(-_m.log(p) * 1e6 + 0.5))
        sps.sort(reverse=True)
        n = len(sps)
        m = (n * 50 + 99) // 100
        s = sum(sps[:m])
        assert got[doc_id] == (n, m, s, 0 if n == 0 else s // m)
    # full-doc surprisal and top-k agree on ordering for the OOV doc
    assert got[2][3] >= full[2][2] // max(full[2][0], 1)
