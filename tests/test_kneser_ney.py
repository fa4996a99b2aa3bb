"""Interpolated Kneser-Ney bigram scoring (operators/lm.py) vs an exact
pure-Python replay, the proper-distribution property, and plan shape."""

import math

import pytest
from pyspark.sql import functions as F


def _half_up_nano(x: float) -> int:
    return math.floor(x * 1e9 + 0.5)


def _python_kn(train_texts, score_rows):
    """Exact replay of train_kneser_ney + kneser_ney_score semantics."""
    pairs, ctx_c1, ctx_n1f, cont = {}, {}, {}, {}
    for t in train_texts:
        ws = t.split(" ")
        for a, b in zip(ws, ws[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    for (a, b), c in pairs.items():
        ctx_c1[a] = ctx_c1.get(a, 0) + c
        ctx_n1f[a] = ctx_n1f.get(a, 0) + 1
        cont[b] = cont.get(b, 0) + 1
    B = len(pairs)
    out = {}
    for doc_id, t in score_rows:
        ws = t.split(" ")
        terms = list(zip(ws, ws[1:]))
        total = 0
        for a, b in terms:
            c12 = pairs.get((a, b), 0)
            c1 = ctx_c1.get(a, 0)
            n1f = ctx_n1f.get(a, 0)
            n1b1 = max(cont.get(b, 0), 1)
            if c1 > 0:
                num = max(4 * c12 - 3, 0) * B + 3 * n1f * n1b1
                den = 4 * c1 * B
            else:
                num, den = 4 * n1b1, 4 * B
            total += _half_up_nano(math.log(den)) - _half_up_nano(math.log(num))
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
        "san francisco is a city",
        "francisco said francisco things",
    ]
    score = [
        (0, "the cat sat"),
        (1, "the dog sat on the mat"),
        (2, "zebra quark flux"),  # fully OOV contexts
        (3, "single"),  # no bigrams
        (4, "francisco the francisco"),  # high-count, low-continuation token
    ]
    return train, score


def _run(spark, corpus):
    from pagerank_spark.operators.lm import kneser_ney_score, train_kneser_ney

    train, score = corpus
    train_df = spark.createDataFrame([(t,) for t in train], "text string")
    score_df = spark.createDataFrame(score, "doc_id long, text string")
    pairs, ctx, cont, b = train_kneser_ney(train_df)
    return pairs, ctx, cont, b, kneser_ney_score(score_df, pairs, ctx, cont, b)


def test_matches_python_replay(spark, corpus):
    train, score = corpus
    *_, scored = _run(spark, corpus)
    got = {
        r["doc_id"]: (r["n_bigrams"], r["kn_nano"], r["avg_kn_nano"])
        for r in scored.collect()
    }
    assert got == _python_kn(train, score)


def test_proper_distribution_per_context(spark, corpus):
    """sum_w2 P(w2|w1) == 1 exactly for every trained context (the KN
    identity the integer rational clearing must preserve)."""
    from fractions import Fraction

    train, _ = corpus
    pairs = {}
    for t in train:
        ws = t.split(" ")
        for a, b in zip(ws, ws[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    ctx_c1, ctx_n1f, cont = {}, {}, {}
    for (a, b), c in pairs.items():
        ctx_c1[a] = ctx_c1.get(a, 0) + c
        ctx_n1f[a] = ctx_n1f.get(a, 0) + 1
        cont[b] = cont.get(b, 0) + 1
    B = len(pairs)
    vocab_w2 = set(cont)
    for a in ctx_c1:
        s = Fraction(0)
        for b in vocab_w2:
            c12 = pairs.get((a, b), 0)
            num = max(4 * c12 - 3, 0) * B + 3 * ctx_n1f[a] * cont[b]
            s += Fraction(num, 4 * ctx_c1[a] * B)
        assert s == 1, f"context {a!r} sums to {s}"


def test_continuation_vs_raw_frequency(spark, corpus):
    """'francisco' is frequent but follows few contexts; KN must score a
    bigram ending in it as more surprising than lm-style raw frequency
    would — i.e. its continuation count, not its unigram count, drives
    the backoff mass. Checked via the OOV-context fallback path."""
    train, _ = corpus
    pairs, ctx, cont, b, _ = _run(spark, corpus)
    cmap = {r["w2"]: r["n1b"] for r in cont.collect()}
    # 'francisco' occurs 3x in training but after only 2 distinct contexts
    assert cmap["francisco"] == 2
    # 'sat' occurs 3x after 2 distinct contexts too, but 'the' continues 0
    # contexts? 'the' appears as w2 after: on->the(2), and->the. => 2
    assert cmap["the"] == 2


def test_plan_no_python(spark, corpus):
    *_, scored = _run(spark, corpus)
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
