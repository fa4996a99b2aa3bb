"""Cross-document boilerplate segment removal (textops.remove_frequent_segments)."""

import pytest
from pyspark.sql import functions as F

from pagerank_spark.operators.textops import remove_frequent_segments


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_planted_boilerplate_removed_in_order(spark):
    rows = [
        (1, "COOKIE NOTICE\nreal content one\nFOOTER"),
        (2, "COOKIE NOTICE\nreal content two\nFOOTER"),
        (3, "COOKIE NOTICE\nunique middle\nanother unique\nFOOTER"),
        (4, "all original text here"),
    ]
    out = {
        r["doc_id"]: (r["text"], r["n_removed"])
        for r in remove_frequent_segments(_docs(spark, rows), min_docs=3).collect()
    }
    assert out[1] == ("real content one", 2)
    assert out[2] == ("real content two", 2)
    assert out[3] == ("unique middle\nanother unique", 2)
    assert out[4] == ("all original text here", 0)


def test_fully_boilerplate_doc_survives_as_empty(spark):
    rows = [(1, "X"), (2, "X"), (3, "X")]
    out = remove_frequent_segments(_docs(spark, rows), min_docs=2).collect()
    assert len(out) == 3
    assert all(r["text"] == "" and r["n_removed"] == 1 for r in out)


def test_min_chars_spares_short_segments(spark):
    rows = [(1, "ok\nlong boilerplate line"), (2, "ok\nlong boilerplate line")]
    out = {
        r["doc_id"]: r["text"]
        for r in remove_frequent_segments(
            _docs(spark, rows), min_docs=2, min_chars=5
        ).collect()
    }
    assert out[1] == "ok" and out[2] == "ok"


def test_duplicate_segment_within_one_doc_counts_once(spark):
    # 'dup' appears twice in doc 1 but only 1 distinct doc -> not removed
    rows = [(1, "dup\ndup\nbody"), (2, "other")]
    out = {
        r["doc_id"]: r["text"]
        for r in remove_frequent_segments(_docs(spark, rows), min_docs=2).collect()
    }
    assert out[1] == "dup\ndup\nbody"


def test_custom_separator_is_escaped_literal(spark):
    rows = [(1, "a|b|common"), (2, "x|common"), (3, "y|common")]
    out = {
        r["doc_id"]: r["text"]
        for r in remove_frequent_segments(_docs(spark, rows), min_docs=3, sep="|").collect()
    }
    assert out == {1: "a|b", 2: "x", 3: "y"}


def test_rejects_min_docs_below_two(spark):
    with pytest.raises(ValueError):
        remove_frequent_segments(_docs(spark, [(1, "a")]), min_docs=1)


def test_python_replay_on_word_granularity(spark):
    import itertools

    rows = [(i, " ".join(f"w{(i * j) % 7}" for j in range(1, 9))) for i in range(20)]
    min_docs = 10
    # pure-Python oracle
    from collections import defaultdict

    docs_of = defaultdict(set)
    for i, t in rows:
        for w in t.split(" "):
            docs_of[w].add(i)
    frequent = {w for w, s in docs_of.items() if len(s) >= min_docs}
    want = {
        i: (
            " ".join(w for w in t.split(" ") if w not in frequent),
            sum(1 for w in t.split(" ") if w in frequent),
        )
        for i, t in rows
    }
    got = {
        r["doc_id"]: (r["text"], r["n_removed"])
        for r in remove_frequent_segments(_docs(spark, rows), min_docs, sep=" ").collect()
    }
    assert got == want
