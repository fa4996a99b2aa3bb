"""LZ78 complexity: pure-Python parse replay, redundancy ordering, edges."""

from pagerank_spark.operators.textops import lz78_complexity

import re


def py_lz78(text):
    toks = re.findall(r"[a-z0-9]+", (text or "").lower())
    seen, cur, phrases = set(), "", 0
    for t in toks:
        cand = cur + "\x1f" + t
        if cand in seen:
            cur = cand
        else:
            seen.add(cand)
            phrases += 1
            cur = ""
    if cur:
        phrases += 1
    return len(toks), phrases


def _run(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {
        r.doc_id: (r.n_tokens, r.n_phrases, r.ratio_micro)
        for r in lz78_complexity(df).collect()
    }


def test_matches_python_parse(spark):
    texts = [
        "the cat sat on the mat the cat sat again",
        "a a a a a a a a",
        "every word here is fully distinct tokens galore",
        "spam spam spam spam eggs spam spam spam spam eggs",
    ]
    got = _run(spark, texts)
    for i, t in enumerate(texts):
        n, p = py_lz78(t)
        assert got[i] == (n, p, p * 1000000 // n), t


def test_repetitive_text_scores_lower(spark):
    rep = "buy now " * 50
    prose = "colorless green ideas sleep furiously while quantum cats debate"
    got = _run(spark, [rep, prose])
    assert got[0][2] < got[1][2]


def test_empty_and_null_text(spark):
    df = spark.createDataFrame([(0, ""), (1, None)], "doc_id long, text string")
    got = {
        r.doc_id: (r.n_tokens, r.n_phrases, r.ratio_micro)
        for r in lz78_complexity(df).collect()
    }
    assert got == {0: (0, 0, None), 1: (0, 0, None)}


def test_trailing_partial_phrase_counts(spark):
    # parse of [a, a]: 'a' new (1), then 'a' extends -> trailing partial (+1)
    got = _run(spark, ["a a"])
    assert got[0] == (2, 2, 1000000)
