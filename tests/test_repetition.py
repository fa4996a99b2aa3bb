"""Repetition signals + corpus top-ngrams vs pure-Python ground truth."""

import collections

from pagerank_spark.operators.textops import repetition_signals, top_ngrams


def _docs(spark):
    rows = [
        (0, "a b a b a b a"),          # heavy bigram repetition
        (1, "x"),                       # single word: no bigrams
        (2, "u v w x y z"),             # all distinct
        (3, "t t t t"),                 # one word repeated
        (4, "m n m n o p q r m"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_signals_exact(spark):
    docs = _docs(spark)
    got = {r.doc_id: r for r in repetition_signals(docs).collect()}
    for did, text in [(r.doc_id, r.text) for r in docs.collect()]:
        t = text.split(" ")
        b = [t[i] + " " + t[i + 1] for i in range(len(t) - 1)]
        cw, cb = collections.Counter(t), collections.Counter(b)
        r = got[did]
        assert r.n_words == len(t)
        assert round(r.top_word_frac, 6) == round(max(cw.values()) / len(t), 6)
        exp_b = round(max(cb.values()) / len(b), 6) if b else 0.0
        assert round(r.top_bigram_frac, 6) == exp_b
        assert round(r.dup_word_frac, 6) == round(1 - len(cw) / len(t), 6)


def test_repetition_signals_zero_shuffle(spark):
    # the whole operator must be a scan projection: no Exchange in the plan
    plan = repetition_signals(_docs(spark))._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_top_ngrams_exact_with_tiebreak(spark):
    docs = _docs(spark)
    allb = collections.Counter()
    for r in docs.collect():
        t = r.text.split(" ")
        allb.update(t[i] + " " + t[i + 1] for i in range(len(t) - 1))
    exp = sorted(allb.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    got = [(r.gram, r.cnt) for r in top_ngrams(docs, n=2, k=5).collect()]
    assert got == exp


def test_top_ngrams_trigrams(spark):
    docs = _docs(spark)
    allt = collections.Counter()
    for r in docs.collect():
        t = r.text.split(" ")
        allt.update(" ".join(t[i : i + 3]) for i in range(len(t) - 2))
    exp = sorted(allt.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
    got = [(r.gram, r.cnt) for r in top_ngrams(docs, n=3, k=4).collect()]
    assert got == exp
