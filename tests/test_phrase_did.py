"""Phrase search windows + DiD cell algebra."""

import pytest

from pagerank_spark.operators.causal import diff_in_diff
from pagerank_spark.operators.retrieval import phrase_search


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_phrase_hits_counted_with_overlap(spark):
    texts = [
        "big data and big data again",      # 2 hits
        "Big Data!",                        # case/punct -> 1 hit
        "data big",                         # wrong order -> miss
        "big little data",                  # gap -> miss
        "",                                 # too short -> filtered
    ]
    got = {r.doc_id: r.n_hits for r in phrase_search(_docs(spark, texts), "big data").collect()}
    assert got == {0: 2, 1: 1}


def test_phrase_single_word_and_triple(spark):
    texts = ["a b c a b c a", "c c c"]
    assert {
        r.doc_id: r.n_hits
        for r in phrase_search(_docs(spark, texts), "a b c").collect()
    } == {0: 2}
    assert {
        r.doc_id: r.n_hits for r in phrase_search(_docs(spark, texts), "c").collect()
    } == {0: 2, 1: 3}


def test_phrase_empty_rejected(spark):
    with pytest.raises(ValueError):
        phrase_search(_docs(spark, ["x"]), "!!!")


def test_did_closed_form(spark):
    # control: 10 -> 12 (+2); treated: 20 -> 25 (+5); DiD = +3
    rows = (
        [(0, 0, 10)] * 4 + [(0, 1, 12)] * 4 + [(1, 0, 20)] * 4 + [(1, 1, 25)] * 4
    )
    df = spark.createDataFrame(rows, "treat int, post int, y long")
    r = diff_in_diff(df, "treat", "post", "y").collect()[0]
    assert (r.n_00, r.s_00, r.n_11, r.s_11) == (4, 40, 4, 100)
    assert r.did_micro == 3_000_000


def test_did_empty_cell_yields_null(spark):
    rows = [(0, 0, 10), (0, 1, 12), (1, 1, 25)]  # no treated-pre cell
    df = spark.createDataFrame(rows, "treat int, post int, y long")
    r = diff_in_diff(df, "treat", "post", "y").collect()[0]
    assert r.n_10 == 0 and r.did_micro is None
