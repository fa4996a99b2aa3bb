"""TextRank keyword extraction (operators/textops.py::textrank_keywords).

Pure-Python oracle: build the adjacent-word co-occurrence graph and run
k iterations of weighted damped PageRank with dangling redistribution —
the exact recurrence of algos/pagerank.py (and the reference's
rank-propagation core).
"""

from collections import defaultdict

import pytest

from pagerank_spark.operators.textops import textrank_keywords

DOCS = [
    (0, "spark shuffle join shuffle spark"),
    (1, "join query plan query join plan"),
    (2, "plan"),  # single-token doc: contributes no edges
    (3, "spark plan spark plan shuffle"),
    (4, ""),  # empty text -> one empty token, dropped
]


def _py_textrank(docs, k, d=0.85):
    w = defaultdict(int)
    for _, text in docs:
        ws = text.split(" ")
        if len(ws) < 2:
            continue
        for a, b in zip(ws, ws[1:]):
            if a != b and a and b:
                w[(a, b)] += 1
                w[(b, a)] += 1
    verts = sorted({x for pair in w for x in pair})
    n = len(verts)
    wout = defaultdict(float)
    for (a, _), c in w.items():
        wout[a] += c
    rank = {v: 1.0 / n for v in verts}
    for _ in range(k):
        contrib = defaultdict(float)
        for (a, b), c in w.items():
            contrib[b] += rank[a] * (c / wout[a])
        dangling = sum(rank[v] for v in verts if wout[v] == 0)
        rank = {
            v: (1 - d) / n + d * contrib[v] + d * dangling / n for v in verts
        }
    return rank


def test_textrank_matches_python_oracle(spark):
    docs = spark.createDataFrame(DOCS, ["doc_id", "text"])
    got = {
        r["id"]: r["rank"]
        for r in textrank_keywords(docs, k_iters=4).collect()
    }
    want = _py_textrank(DOCS, 4)
    assert set(got) == set(want)
    for v, r in want.items():
        assert got[v] == pytest.approx(r, abs=1e-12)
    # symmetric graph sums to 1 (no dangling mass loss)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_textrank_excludes_self_and_empty(spark):
    docs = spark.createDataFrame(
        [(0, "a a a"), (1, " b")], ["doc_id", "text"]
    )
    # "a a a" only yields self-pairs; " b" splits to ["", "b"] whose pair
    # has an empty side — so no edges and no vertices at all
    assert textrank_keywords(docs, k_iters=2).count() == 0
