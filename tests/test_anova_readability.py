"""ANOVA exact replay + readability closed forms."""

import math

from pagerank_spark.operators.hyptest import anova_oneway
from pagerank_spark.operators.textops import readability


def _anova_py(groups):
    vals = [v for vs in groups.values() for v in vs]
    n, k = len(vals), len(groups)
    s_total, ssq = sum(vals), sum(v * v for v in vals)
    t_milli = sum(
        math.floor(float(sum(vs)) * sum(vs) / len(vs) * 1000.0 + 0.5)
        for vs in groups.values()
    )
    ssb = t_milli / 1000.0 - float(s_total) * s_total / n
    ssw = float(ssq) - t_milli / 1000.0
    f = (ssb / (k - 1)) / (ssw / (n - k))
    return n, k, s_total, ssq, t_milli, math.floor(f * 1e6 + 0.5)


def test_anova_matches_replay(spark):
    groups = {
        "a": [12, 15, 11, 14, 13],
        "b": [22, 25, 21, 24],
        "c": [12, 14, 16, 13, 15, 14],
    }
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v long")
    r = anova_oneway(df, "g", "v").collect()[0]
    assert (r.n, r.k, r.s_total, r.ssq, r.t_milli_sum, r.f_micro) == _anova_py(groups)
    assert r.f_micro > 10_000_000  # group b is far off: F >> 10


def test_anova_degenerate_constant_groups(spark):
    rows = [("a", 5), ("a", 5), ("b", 7), ("b", 7)]
    df = spark.createDataFrame(rows, "g string, v long")
    r = anova_oneway(df, "g", "v").collect()[0]
    assert r.f_micro == -1  # SSW == 0: sentinel, no division


def test_readability_closed_form(spark):
    rows = [
        # 4 words, 2 sentences, 5 vowel runs: the cat sat. it ran!
        (1, "The cat sat. It ran!"),
        # no terminator: sentence count floors at 1
        (2, "hello world"),
        # no letters: dropped
        (3, "12345 !!!"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in readability(df).collect()}
    assert set(got) == {1, 2}
    r1 = got[1]
    assert (r1.n_words, r1.n_sentences, r1.n_syllables) == (5, 2, 5)
    f = 206.835 - 1.015 * (5.0 / 2) - 84.6 * (5.0 / 5)
    assert r1.flesch_micro == math.floor(f * 1e6 + 0.5)
    r2 = got[2]
    assert (r2.n_words, r2.n_sentences, r2.n_syllables) == (2, 1, 3)
