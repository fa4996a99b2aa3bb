"""Exact AUC (Mann-Whitney with ties) + confusion matrix on hand data."""

from pagerank_spark.operators.mleval import auc_exact, confusion_matrix


def _auc_py(pairs):
    """Brute-force AUC: mean over (pos, neg) pairs of [s_p > s_n] + 0.5[=]."""
    pos = [s for s, y in pairs if y == 1]
    neg = [s for s, y in pairs if y == 0]
    num = sum((p > n_) + 0.5 * (p == n_) for p in pos for n_ in neg)
    return pos, neg, num / (len(pos) * len(neg))


def test_auc_exact_with_ties(spark):
    pairs = [
        (10, 1), (9, 1), (8, 0), (8, 1), (7, 0), (7, 0), (5, 1), (3, 0), (3, 1), (1, 0),
    ]
    pos, neg, auc = _auc_py(pairs)
    df = spark.createDataFrame(pairs, "score long, label int")
    r = auc_exact(df, "score", "label").collect()[0]
    assert (r.n_pos, r.n_neg) == (len(pos), len(neg))
    assert r.two_u == round(2 * auc * len(pos) * len(neg))
    assert r.auc_micro == int(2 * auc * len(pos) * len(neg) * 1_000_000) // (2 * len(pos) * len(neg))


def test_auc_perfect_and_random(spark):
    # perfect separation -> AUC 1.0
    perfect = [(i + 100, 1) for i in range(5)] + [(i, 0) for i in range(5)]
    r = auc_exact(spark.createDataFrame(perfect, "score long, label int"), "score", "label").collect()[0]
    assert r.auc_micro == 1_000_000
    # all scores identical -> AUC exactly 1/2
    flat = [(7, 1)] * 4 + [(7, 0)] * 6
    r = auc_exact(spark.createDataFrame(flat, "score long, label int"), "score", "label").collect()[0]
    assert r.auc_micro == 500_000


def test_confusion_matrix_counts(spark):
    rows = [("a", "a")] * 3 + [("a", "b")] * 1 + [("b", "b")] * 5 + [("b", "c")] * 2
    df = spark.createDataFrame(rows, "actual string, pred string")
    out = {(r.actual, r.predicted): (r.n, r.row_total)
           for r in confusion_matrix(df, "actual", "pred").collect()}
    assert out == {
        ("a", "a"): (3, 4),
        ("a", "b"): (1, 4),
        ("b", "b"): (5, 7),
        ("b", "c"): (2, 7),
    }


def test_cohen_kappa_replay(spark):
    from pagerank_spark.operators.mleval import cohen_kappa

    # hand-planted 2-class confusion: a/a x20, a/b x5, b/a x10, b/b x15
    rows = (
        [("a", "a")] * 20 + [("a", "b")] * 5 + [("b", "a")] * 10 + [("b", "b")] * 15
    )
    df = spark.createDataFrame(rows, "actual string, pred string")
    r = cohen_kappa(df, "actual", "pred").collect()[0]
    n, d = 50, 35
    s = 25 * 30 + 25 * 20  # row_a*col_a + row_b*col_b
    assert (r.total, r.diag, r.chance) == (n, d, s)
    assert r.kappa_micro == round((d * n - s) / (n * n - s) * 1e6)


def test_cohen_kappa_perfect_and_negative(spark):
    from pagerank_spark.operators.mleval import cohen_kappa

    perfect = spark.createDataFrame(
        [("x", "x")] * 3 + [("y", "y")] * 3, "actual string, pred string"
    )
    assert cohen_kappa(perfect, "actual", "pred").collect()[0].kappa_micro == 1_000_000
    # systematic disagreement -> kappa == -1
    anti = spark.createDataFrame(
        [("x", "y")] * 3 + [("y", "x")] * 3, "actual string, pred string"
    )
    assert cohen_kappa(anti, "actual", "pred").collect()[0].kappa_micro == -1_000_000
