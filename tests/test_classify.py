"""Naive Bayes classifier: exact pure-Python micro-cost replay + planted
separable classes recovered."""

import math

from pagerank_spark.operators.classify import nb_predict, train_naive_bayes

DOCS = [
    (0, "spam", "buy cheap pills now buy now"),
    (1, "spam", "cheap cheap offer buy"),
    (2, "spam", "offer now pills"),
    (3, "ham", "meeting agenda for tomorrow"),
    (4, "ham", "lunch tomorrow agenda"),
    (5, "ham", "project meeting notes agenda notes"),
    (6, "ham", ""),  # empty text -> prior-only score
    (7, "spam", "buy pills offer cheap now"),
]


def _py_nb(docs, add_k=1):
    """Exact integer-micro replay of classify.py's arithmetic."""
    tc: dict[tuple[str, str], int] = {}
    nt: dict[str, int] = {}
    ndc: dict[str, int] = {}
    vocab = set()
    for _i, cls, text in docs:
        ndc[cls] = ndc.get(cls, 0) + 1
        for t in text.lower().split():
            tc[(cls, t)] = tc.get((cls, t), 0) + 1
            nt[cls] = nt.get(cls, 0) + 1
            vocab.add(t)
    v, n = len(vocab), len(docs)
    out = {}
    for i, _cls, text in docs:
        best = None
        for cls in sorted(ndc):
            cost = round(-math.log(ndc[cls] / n) * 1e6)
            for t in text.lower().split():
                w = round(
                    -math.log((tc.get((cls, t), 0) + add_k) / (nt.get(cls, 0) + add_k * v))
                    * 1e6
                )
                cost += w
            if best is None or (cost, cls) < best:
                best = (cost, cls)
        out[i] = (best[1], best[0])
    return out


def test_nb_matches_python_replay_and_recovers_classes(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, lang string, text string")
    tc, cs, v, n = train_naive_bayes(df, class_col="lang")
    got = {
        r.doc_id: (r.pred_cls, r.cost_micro)
        for r in nb_predict(df, tc, cs, v, n).collect()
    }
    exp = _py_nb(DOCS)
    assert got == exp
    # planted separation: every non-empty doc gets its true class back
    for i, cls, text in DOCS:
        if text:
            assert got[i][0] == cls
    # empty doc -> prior argmin (spam: 4 docs vs ham: 4 -> tie broken 'ham')
    assert got[6][0] == "ham"


def test_nb_all_rows_present(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, lang string, text string")
    tc, cs, v, n = train_naive_bayes(df, class_col="lang")
    assert nb_predict(df, tc, cs, v, n).count() == len(DOCS)
