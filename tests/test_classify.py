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


def _logreg_replay(rows, iters=3, eta=0.125):
    # rows: (y, x1, x2); replicates the engine's exact arithmetic
    d = 3
    beta = [0.0] * d
    n = len(rows)
    for _ in range(iters):
        g = [0] * d
        for y, x1, x2 in rows:
            zv = (beta[0] + beta[1] * x1) + beta[2] * x2
            s = 1.0 / (1.0 + __import__("math").exp(-zv))
            for j, xj in enumerate((1.0, x1, x2)):
                g[j] += _round_half_up(((s - float(y)) * xj) * 1e9)
        beta = [beta[j] - eta * ((g[j] / 1e9) / n) for j in range(d)]
    correct = 0
    psum = 0
    for y, x1, x2 in rows:
        zv = (beta[0] + beta[1] * x1) + beta[2] * x2
        s = 1.0 / (1.0 + __import__("math").exp(-zv))
        correct += int((zv >= 0.0) == (y == 1))
        psum += _round_half_up(s * 1e9)
    return beta, correct, psum


def _round_half_up(x):
    from decimal import ROUND_HALF_UP, Decimal

    return int(Decimal(repr(x)).quantize(Decimal("1"), rounding=ROUND_HALF_UP))


def test_logreg_matches_python_replay(spark):
    from pyspark.sql import functions as F

    from pagerank_spark.operators.classify import logreg_gd

    # separable-ish planted data: y correlates with x1
    rows = [
        (1, 2.0, 0.5), (1, 1.5, 0.25), (1, 3.0, 0.0), (1, 2.5, 0.75),
        (0, -1.0, 0.5), (0, -2.0, 0.25), (0, -0.5, 0.0), (0, -1.5, 0.75),
        (1, 0.5, 0.5), (0, 0.25, 0.25),
    ]
    df = spark.createDataFrame(rows, "y long, x1 double, x2 double")
    got = logreg_gd(df, F.col("y"), [F.col("x1"), F.col("x2")], iters=3, eta=0.125).collect()[0]
    beta, correct, psum = _logreg_replay(rows)
    assert got.n == 10
    assert got.beta0_nano == round(beta[0] * 1e9)
    assert got.beta1_nano == round(beta[1] * 1e9)
    assert got.beta2_nano == round(beta[2] * 1e9)
    assert got.n_correct == correct
    assert got.prob_sum_nano == psum
    # gradient descent moved the slope toward the label correlation
    assert got.beta1_nano > 0
    assert got.n_correct >= 8


def test_knn_loo_two_clusters(spark):
    from pagerank_spark.operators.classify import knn_classifier_loo

    # two tight clusters with distinct labels + one mislabeled point
    vecs = (
        [(i, [4.0 + 0.25 * i, 0.5], 0) for i in range(4)]
        + [(10 + i, [0.5, 4.0 + 0.25 * i], 1) for i in range(4)]
        + [(99, [4.9, 0.4], 1)]  # sits in cluster 0, labeled 1
    )
    emb = spark.createDataFrame(vecs, "vec_id long, embedding array<float>, label int")
    got = {r.vec_id: r for r in knn_classifier_loo(emb, k=3).collect()}
    for i in range(4):
        assert got[i].pred == 0 and got[i].correct == 1
    for i in range(4):
        assert got[10 + i].pred == 1 and got[10 + i].correct == 1
    # the planted mislabeled point is predicted into its geometric cluster
    assert got[99].pred == 0 and got[99].correct == 0
    assert got[99].votes == 3


def test_platt_style_single_feature_logreg(spark):
    from pyspark.sql import functions as F

    from pagerank_spark.operators.classify import logreg_gd

    # a monotone score separating classes: calibrated slope must be
    # positive and accuracy beats the majority baseline
    rows = [(1, s / 4.0) for s in range(6, 14)] + [(0, s / 4.0) for s in range(-6, 2)]
    df = spark.createDataFrame(rows, "y long, x double")
    got = logreg_gd(df, F.col("y"), [F.col("x")], iters=3, eta=0.125).collect()[0]
    beta, correct, psum = _logreg_replay([(y, x, 0.0) for y, x in rows])
    # replay with x2 frozen at 0 reproduces the d=2 run's shared columns
    assert got.beta1_nano == round(beta[1] * 1e9)
    assert got.beta0_nano == round(beta[0] * 1e9)
    assert got.beta1_nano > 0
    assert got.n_correct == correct and got.n_correct >= 14
