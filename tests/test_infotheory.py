"""Token divergence: pure-Python replay + identity/symmetry properties."""

import math

from pagerank_spark.operators.infotheory import token_divergence


def _replay(docs_a, docs_b, k=1):
    def counts(docs):
        c = {}
        for d in docs:
            for t in d.lower().split():
                c[t] = c.get(t, 0) + 1
        return c

    ca, cb = counts(docs_a), counts(docs_b)
    vocab = sorted(set(ca) | set(cb))
    ta, tb, v = sum(ca.values()), sum(cb.values()), len(vocab)
    ha = hb = kab = kba = js = 0
    for t in vocab:
        p = (ca.get(t, 0) + float(k)) / (ta + float(k) * v)
        q = (cb.get(t, 0) + float(k)) / (tb + float(k) * v)
        m = (p + q) / 2.0
        ha += round(-p * math.log(p) * 1e9)
        hb += round(-q * math.log(q) * 1e9)
        kab += round(p * math.log(p / q) * 1e9)
        kba += round(q * math.log(q / p) * 1e9)
        js += round(0.5 * (p * math.log(p / m) + q * math.log(q / m)) * 1e9)
    return (v, ta, tb, ha, hb, kab, kba, js)


DOCS_A = ["the cat sat", "the dog ran", "cat and dog"]
DOCS_B = ["der Hund lief", "die Katze sass", "the dog"]


def _run(spark, docs_a, docs_b):
    rows = [("a", t) for t in docs_a] + [("b", t) for t in docs_b]
    df = spark.createDataFrame(rows, "grp string, text string")
    r = token_divergence(df, "grp", "a", "b").collect()[0]
    return (
        r.n_vocab, r.tot_a, r.tot_b,
        r.entropy_a_nano, r.entropy_b_nano,
        r.kl_ab_nano, r.kl_ba_nano, r.js_nano,
    )


def test_matches_python_replay(spark):
    assert _run(spark, DOCS_A, DOCS_B) == _replay(DOCS_A, DOCS_B)


def test_identical_slices_zero_divergence(spark):
    got = _run(spark, DOCS_A, DOCS_A)
    v, ta, tb, ha, hb, kab, kba, js = got
    assert ta == tb and ha == hb
    assert kab == 0 and kba == 0 and js == 0


def test_js_bounded_by_ln2(spark):
    # JS divergence <= ln 2 always (Lin 1991)
    js = _run(spark, ["aaa aaa aaa"], ["zzz zzz zzz"])[-1]
    assert 0 < js <= round(math.log(2) * 1e9)


def test_mutual_information_python_replay(spark):
    import math

    from pagerank_spark.operators.infotheory import mutual_information

    # f strongly predicts y; g is pure noise
    data = [(i % 3, i % 2, 1 if i % 3 == 0 else 0) for i in range(12)]
    df = spark.createDataFrame(data, "f long, g long, y long")

    def mi_nano(pairs):
        from collections import Counter
        nxy = Counter(pairs)
        nx = Counter(b for b, _ in pairs)
        ny = Counter(y for _, y in pairs)
        t = len(pairs)
        return sum(
            round((c / t) * math.log(c * t / (nx[b] * ny[y])) * 1_000_000_000)
            for (b, y), c in nxy.items()
        )

    got = {r.feature: (r.n_cells, r.n_rows, r.mi_nano)
           for r in mutual_information(df, "y = 1", {"f": "f", "g": "g"}).collect()}
    f_pairs = [(a, c) for a, _, c in data]
    g_pairs = [(b, c) for _, b, c in data]
    assert got["f"] == (len(set(f_pairs)), 12, mi_nano(f_pairs))
    assert got["g"] == (len(set(g_pairs)), 12, mi_nano(g_pairs))
    # ranking sanity: the predictive feature dominates; noise MI ~ 0
    assert got["f"][2] > got["g"][2] and abs(got["g"][2]) < 1000


def test_token_class_chi2_hand_computed(spark):
    from pyspark.sql import functions as F

    from pagerank_spark.operators.infotheory import token_class_chi2

    # 4 docs, class = first two; "aa" exclusively in class, "bb" everywhere,
    # "cc" only outside, "dd" df=1 (dropped by min_df)
    rows = [
        (0, "aa bb", 1), (1, "aa bb", 1), (2, "bb cc", 0), (3, "bb cc dd", 0),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, cls long")
    got = {
        r.token: (r.df, r.df_class, r.chi2_micro)
        for r in token_class_chi2(docs, F.col("cls"), min_df=2, k=10).collect()
    }
    assert "dd" not in got
    # aa: a=2 b=0 c=0 d=2 -> chi2 = 4*(4-0)^2/(2*2*2*2) = 4
    assert got["aa"] == (2, 2, 4_000_000)
    # cc is the mirror image
    assert got["cc"] == (2, 0, 4_000_000)
    # bb: df = n_docs -> guarded sentinel 0
    assert got["bb"] == (4, 2, 0)


def test_token_class_chi2_order_and_k(spark):
    from pyspark.sql import functions as F

    from pagerank_spark.operators.infotheory import token_class_chi2

    rows = [(0, "x y", 1), (1, "x z", 1), (2, "y z", 0), (3, "z w q", 0)]
    docs = spark.createDataFrame(rows, "doc_id long, text string, cls long")
    out = token_class_chi2(docs, F.col("cls"), min_df=2, k=2).collect()
    assert len(out) == 2
    # descending chi2, token tiebreak ascending
    pairs = [(r.chi2_micro, r.token) for r in out]
    assert pairs == sorted(pairs, key=lambda p: (-p[0], p[1]))


def test_psi_identical_slices_near_zero_and_replay(spark):
    import math

    from pyspark.sql import functions as F

    from pagerank_spark.operators.infotheory import psi

    # identical bin distributions -> PSI exactly 0 (p == q per bin)
    rows = [(s, b) for s in (0, 1) for b in (1, 1, 2, 2, 2, 3)]
    df = spark.createDataFrame(rows, "sl long, b long")
    got = psi(df, F.col("sl"), F.col("b")).collect()[0]
    assert (got.n_base, got.n_cur, got.n_bins) == (6, 6, 3)
    assert got.psi_nano == 0

    # shifted distribution: exact replay of the smoothed nano terms
    rows2 = [(0, 1)] * 8 + [(0, 2)] * 2 + [(1, 1)] * 2 + [(1, 2)] * 8
    df2 = spark.createDataFrame(rows2, "sl long, b long")
    got2 = psi(df2, F.col("sl"), F.col("b")).collect()[0]
    want = 0
    for ca, cb in ((8, 2), (2, 8)):
        pa = (ca + 1) / (10 + 2)
        pb = (cb + 1) / (10 + 2)
        want += round((pa - pb) * math.log(pa / pb) * 1e9)
    assert got2.psi_nano == want
    assert got2.psi_nano > 250_000_000  # "shifted" by the rule of thumb
