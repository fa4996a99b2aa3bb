"""Dedup, text-analysis, and similarity operator tests (planted fixtures)."""

import numpy as np
from pyspark.sql import functions as F

from pagerank_spark.operators.dedup import (
    estimated_jaccard,
    exact_dedup,
    minhash_dedup,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard,
    simhash,
    hamming64,
)
from pagerank_spark.operators.similarity import (
    cosine_near_dup_pairs,
    cosine_topk_bruteforce,
    cosine_topk_pandas,
    lsh_bucketed_topk,
)
from pagerank_spark.operators.textops import lang_id, quality_filter, text_profile

BASE = (
    "the quick brown fox jumps over the lazy dog and runs far away to the hills "
    "where it meets a friend and they play in the sun all day long until dusk"
)


def _docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # exact dup of 0
        (2, BASE.replace("quick", "rapid")),  # near dup of 0
        (3, "completely different content about database engines and query optimizers running distributed joins"),
        (4, "der hund und die katze ist im haus und der vogel ist der beste"),
        (5, "short text"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(spark):
    got = {r["doc_id"]: r["canonical_id"] for r in exact_dedup(_docs(spark)).collect()}
    assert got[0] == 0 and got[1] == 0
    assert got[2] == 2 and got[3] == 3


def test_minhash_near_dup(spark):
    docs = _docs(spark)
    got = {r["doc_id"]: r["canonical_id"] for r in minhash_dedup(docs, threshold=0.5).collect()}
    assert got[1] == 0  # exact dup groups with 0
    assert got[2] == 0  # near dup groups with 0
    assert got[3] == 3 and got[4] == 4


def test_minhash_estimates_sane(spark):
    docs = _docs(spark)
    sigs = minhash_signatures(docs).persist()
    cands = minhash_lsh_candidates(sigs)
    est = {(r["a"], r["b"]): r["est_jaccard"] for r in estimated_jaccard(sigs, cands).collect()}
    assert est.get((0, 1)) == 1.0  # identical docs agree on every hash
    sigs.unpersist()


def test_ngram_jaccard_exact(spark):
    docs = _docs(spark)
    pairs = spark.createDataFrame([(0, 1), (0, 3)], "a long, b long")
    got = {(r["a"], r["b"]): r["jaccard"] for r in ngram_jaccard(docs, pairs).collect()}
    assert got[(0, 1)] == 1.0
    assert got[(0, 3)] < 0.05


def test_simhash_close_for_near_dups(spark):
    docs = _docs(spark)
    sh = simhash(docs)
    a = sh.alias("a")
    b = sh.alias("b")
    d = (
        a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("x"),
            F.col("b.doc_id").alias("y"),
            hamming64(F.col("a.simhash"), F.col("b.simhash")).alias("ham"),
        )
        .collect()
    )
    ham = {(r["x"], r["y"]): r["ham"] for r in d}
    assert ham[(0, 1)] == 0  # identical text -> identical simhash
    assert ham[(0, 2)] < ham[(0, 3)]  # near dup closer than unrelated


def test_text_profile_and_quality(spark):
    docs = _docs(spark)
    prof = {r["doc_id"]: r for r in text_profile(docs).collect()}
    assert prof[0]["n_tokens"] == len(BASE.split())
    assert prof[5]["n_tokens"] == 2
    assert prof[0]["quality"] == 1.0  # long, sane tokens, has stopwords
    passing = {r["doc_id"] for r in quality_filter(docs, 0.7).collect()}
    assert 0 in passing and 5 not in passing  # "short text" fails length band


def test_lang_id(spark):
    docs = _docs(spark)
    got = {r["doc_id"]: r["lang_pred"] for r in lang_id(docs).collect()}
    assert got[0] == "en"
    assert got[4] == "de"


def _emb(spark, n=50, dim=8, seed=3):
    rng = np.random.default_rng(seed)
    mat = rng.standard_normal((n, dim)).astype(np.float32)
    mat[1] = mat[0] + 0.01 * rng.standard_normal(dim).astype(np.float32)  # near dup of 0
    rows = [(i, [float(x) for x in mat[i]]) for i in range(n)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), mat


def test_cosine_topk_exact_and_pandas_agree(spark):
    emb, mat = _emb(spark)
    bf = [(r["vec_id"], r["sim"]) for r in cosine_topk_bruteforce(emb, 0, k=5).collect()]
    pu = [(r["vec_id"], r["sim"]) for r in cosine_topk_pandas(emb, 0, k=5).collect()]
    assert [x[0] for x in bf] == [x[0] for x in pu]
    for (_, a), (_, b) in zip(bf, pu):
        assert abs(a - b) < 1e-6
    # NumPy oracle
    m = mat.astype(np.float64)
    sims = m @ m[0] / (np.linalg.norm(m, axis=1) * np.linalg.norm(m[0]))
    sims[0] = -np.inf
    expect_top = int(np.argmax(sims))
    assert bf[0][0] == expect_top == 1


def test_lsh_topk_recall(spark):
    emb, _ = _emb(spark, n=100)
    exact = [r["vec_id"] for r in cosine_topk_bruteforce(emb, 0, k=5).collect()]
    approx = [r["vec_id"] for r in lsh_bucketed_topk(emb, 0, k=5, n_planes=6).collect()]
    # multiprobe LSH at 100 vectors should recover the top hit
    assert exact[0] in approx


def test_cosine_near_dup_pairs(spark):
    emb, _ = _emb(spark)
    pairs = {(r["a"], r["b"]) for r in cosine_near_dup_pairs(emb, threshold=0.99).collect()}
    assert (0, 1) in pairs


def test_synth_docs_planted_groups(spark):
    """The columnar corpus generator plants exact-dup pairs at a known rate,
    and minhash_dedup recovers exactly those groups."""
    from pagerank_spark.operators.dedup import minhash_dedup
    from pagerank_spark.sources.docs import synth_docs

    docs = synth_docs(spark, 300, dup_every=50).persist()
    # expected: doc_id i with i % 50 == 1 (i > 0) groups with i-1
    got = {r["doc_id"]: r["canonical_id"] for r in minhash_dedup(docs, threshold=0.9).collect()}
    for i in range(300):
        if i % 50 == 1 and i > 0:
            assert got[i] == i - 1
        else:
            assert got[i] == i
    docs.unpersist()


def test_ivf_topk_recall(spark):
    from pagerank_spark.operators.similarity import ivf_topk

    emb, _ = _emb(spark, n=200)
    exact = [r["vec_id"] for r in cosine_topk_bruteforce(emb, 0, k=5).collect()]
    approx = [r["vec_id"] for r in ivf_topk(emb, 0, k=5, n_centroids=8, nprobe=3).collect()]
    # IVF with 3/8 lists probed must recover the top hit (the planted near-dup)
    assert exact[0] in approx


def test_bpe_token_count_exact(spark):
    """Pretokenizer counts on contraction/punctuation/digit/unicode cases."""
    from pagerank_spark.functions.text import bpe_token_count

    cases = {
        "it's a well-known fact!": 8,   # it 's a well - known fact !
        "abc123 x,y;z": 7,              # abc 123 x , y ; z
        "": 0,
        "   ": 0,
        "don't stop... 42 times": 8,    # don 't stop . . . 42 times
    }
    df = spark.createDataFrame(list(cases.items()), "text string, expected long")
    rows = df.select("expected", bpe_token_count("text").alias("got")).collect()
    for r in rows:
        assert r["got"] == r["expected"]


def test_winnow_fingerprints_guarantee(spark):
    """Winnowing guarantee: docs sharing a substring of length >= k+w-1
    share at least one fingerprint; disjoint docs share none."""
    from pagerank_spark.operators.textops import winnow_fingerprints

    df = spark.createDataFrame(
        [(1, "aaaa commonsegment bbbb"), (2, "cccc commonsegment dddd"), (3, "unrelated words entirely")],
        "doc_id long, text string",
    )
    rows = winnow_fingerprints(df, k=5, w=4, hashed=False).collect()
    sets = {i: {r["fp"] for r in rows if r["doc_id"] == i} for i in (1, 2, 3)}
    assert sets[1] & sets[2]                      # shared 14-char substring
    assert not (sets[1] & sets[3]) and not (sets[2] & sets[3])
    # hashed mode fingerprints the same gram selection (same row count)
    assert len(winnow_fingerprints(df, k=5, w=4, hashed=True).collect()) == len(rows)


def test_simhash_near_dups_equals_bruteforce(spark):
    """Pigeonhole banding is exact: banded pairs == all-pairs hamming filter."""
    from pagerank_spark.operators.dedup import hamming64, simhash, simhash_near_dups
    from pagerank_spark.sources.docs import synth_docs

    docs = synth_docs(spark, 60, dup_every=10)  # planted exact dups -> hamming 0
    got = {(r["a"], r["b"], r["hamming"]) for r in simhash_near_dups(docs, max_hamming=3).collect()}

    sh = simhash(docs).cache()
    a = sh.select(F.col("doc_id").alias("a"), F.col("simhash").alias("ha"))
    b = sh.select(F.col("doc_id").alias("b"), F.col("simhash").alias("hb"))
    brute = (
        a.crossJoin(b).filter(F.col("a") < F.col("b"))
        .select("a", "b", hamming64(F.col("ha"), F.col("hb")).alias("hamming"))
        .filter(F.col("hamming") <= 3)
    )
    want = {(r["a"], r["b"], r["hamming"]) for r in brute.collect()}
    assert got == want and len(want) > 0


def test_simhash_near_dups_max_hamming_zero(spark):
    """max_hamming=0 degenerates to a single full-width (64-bit) band — the
    mask must be two's-complement -1, not the LongType-overflowing
    (1 << 64) - 1. Expected pairs: exactly the planted exact dups."""
    from pagerank_spark.operators.dedup import simhash_near_dups
    from pagerank_spark.sources.docs import synth_docs

    docs = synth_docs(spark, 60, dup_every=10)
    got = {(r["a"], r["b"], r["hamming"]) for r in simhash_near_dups(docs, max_hamming=0).collect()}
    want = {(i - 1, i, 0) for i in range(1, 60) if i % 10 == 1}
    assert got == want


# -- hot-bucket caps (boilerplate mega-bucket defence) ----------------------


def _boilerplate_corpus(spark, n_copies=120):
    """n_copies identical docs (one LSH mega-bucket) + the 6-doc base set
    (ids shifted by 1000) with its known exact/near-dup structure."""
    mega = [(i, "standard legal boilerplate footer text repeated verbatim on every single page of this site") for i in range(n_copies)]
    extra = [(1000 + i, t) for i, (_, t) in enumerate([
        (0, BASE),
        (1, BASE),
        (2, BASE.replace("quick", "rapid")),
        (3, "completely different content about database engines and query optimizers running distributed joins"),
        (4, "der hund und die katze ist im haus und der vogel ist der beste"),
        (5, "short text"),
    ])]
    return spark.createDataFrame(mega + extra, "doc_id long, text string")


def test_lsh_hot_bucket_star_bounds_candidates(spark):
    """A 120-copy mega-bucket emits 119 star pairs instead of C(120,2)=7140,
    and connectivity (hence dedup grouping) is preserved exactly."""
    docs = _boilerplate_corpus(spark).persist()
    sigs = minhash_signatures(docs).persist()

    capped = minhash_lsh_candidates(sigs, n_hashes=64, max_bucket_size=10).collect()
    mega_pairs = [(r["a"], r["b"]) for r in capped if r["b"] < 1000]
    assert len(mega_pairs) == 119  # rep 0 -> each of 1..119, O(g) not O(g^2)
    assert all(a == 0 for a, _ in mega_pairs)

    got = {
        r["doc_id"]: r["canonical_id"]
        for r in minhash_dedup(docs, threshold=0.5, max_bucket_size=10).collect()
    }
    for i in range(120):
        assert got[i] == 0  # whole mega-group still collapses to one canonical
    assert got[1001] == 1000 and got[1002] == 1000  # base near-dups unchanged
    assert got[1003] == 1003 and got[1004] == 1004
    sigs.unpersist()
    docs.unpersist()


def test_lsh_hot_bucket_cap_is_noop_below_cap(spark):
    """When no bucket exceeds the cap, capped == uncapped exactly."""
    from pagerank_spark.sources.docs import synth_docs

    docs = synth_docs(spark, 300, dup_every=50).persist()
    base = {(r["doc_id"], r["canonical_id"]) for r in minhash_dedup(docs, threshold=0.9).collect()}
    capped = {
        (r["doc_id"], r["canonical_id"])
        for r in minhash_dedup(docs, threshold=0.9, max_bucket_size=10).collect()
    }
    assert base == capped
    docs.unpersist()


def test_lsh_hot_bucket_drop_mode_logs(spark, caplog):
    """Drop mode excludes the mega-bucket's pairs and says so out loud."""
    import logging

    docs = _boilerplate_corpus(spark)
    sigs = minhash_signatures(docs).persist()
    with caplog.at_level(logging.WARNING, logger="pagerank_spark.operators.dedup"):
        pairs = minhash_lsh_candidates(
            sigs, n_hashes=64, max_bucket_size=10, hot_bucket_mode="drop"
        ).collect()
    assert not [r for r in pairs if r["b"] < 1000]  # mega pairs gone
    assert any("hot LSH buckets" in rec.message for rec in caplog.records)
    sigs.unpersist()


def test_simhash_hot_bucket_star(spark):
    """Star-capped simhash still pairs every mega-bucket member with the
    representative at hamming 0, and cold-bucket pairs are untouched."""
    from pagerank_spark.operators.dedup import simhash_near_dups

    docs = _boilerplate_corpus(spark, n_copies=40).persist()
    capped = {
        (r["a"], r["b"], r["hamming"])
        for r in simhash_near_dups(docs, max_hamming=3, max_bucket_size=10).collect()
    }
    # every mega member reachable from rep 0 at distance 0
    assert {(0, b, 0) for b in range(1, 40)} <= capped
    # the base-set near-dup pair survives via its (cold) buckets
    uncapped = {
        (r["a"], r["b"], r["hamming"])
        for r in simhash_near_dups(docs, max_hamming=3).collect()
    }
    assert {(a, b, h) for a, b, h in uncapped if a >= 1000} == {
        (a, b, h) for a, b, h in capped if a >= 1000
    }
    docs.unpersist()


def test_ivf_lloyd_iterations_match_numpy_replay(spark):
    """Multi-iteration Lloyd trainer: exact parity with a NumPy replay on
    dyadic-component vectors (sums exact in any reduction order), and
    quantization error is non-increasing across iterations."""
    import numpy as np

    from pagerank_spark.operators.similarity import ivf_assignments

    # two tight axis clusters + a far stray, dyadic components
    vecs = (
        [[4.0 + 0.25 * i, 0.5] for i in range(8)]
        + [[0.5, 4.0 + 0.25 * i] for i in range(8)]
        + [[-8.0, -8.0]]
    )
    emb = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )
    mat = np.array([[float(np.float32(x)) for x in v] for v in vecs])

    def replay(iters):
        import numpy as _np

        # seed selection replicated through the engine itself (hash order)
        a0, c0 = ivf_assignments(emb, n_centroids=3, lloyd_iters=0)
        c = c0.copy()
        for _ in range(iters):
            cn = c / _np.maximum(_np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
            mn = mat / _np.maximum(_np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            lab = _np.argmax(mn @ cn.T, axis=1)
            for li in range(3):
                if (lab == li).any():
                    c[li] = mat[lab == li].mean(axis=0)
        cn = c / _np.maximum(_np.linalg.norm(c, axis=1, keepdims=True), 1e-12)
        mn = mat / _np.maximum(_np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        return _np.argmax(mn @ cn.T, axis=1), c

    for iters in (1, 3):
        assigned, cents = ivf_assignments(emb, n_centroids=3, lloyd_iters=iters)
        got = {r.vec_id: r.list for r in assigned.collect()}
        want, cw = replay(iters)
        assert got == {i: int(want[i]) for i in range(len(vecs))}
        assert np.allclose(cents, cw)


def test_isotropy_collapsed_vs_spread(spark):
    from pagerank_spark.operators.similarity import isotropy

    # collapsed: all vectors identical -> mean cos ~ 1
    col = spark.createDataFrame(
        [(i, [3.0, 4.0]) for i in range(6)], "vec_id long, embedding array<float>"
    )
    got = isotropy(col).collect()[0]
    assert got.n == 6 and got.dim == 2
    assert abs(got.mean_cos_micro - 1_000_000) <= 5
    # balanced: axis-aligned +/- pairs -> mean cos ~ -1/(n-1) = -1/3
    spread = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [-1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.0, -1.0])],
        "vec_id long, embedding array<float>",
    )
    got2 = isotropy(spread).collect()[0]
    assert abs(got2.mean_cos_micro - (-333_333)) <= 5
    # zero vectors drop; singleton emits sentinel
    one = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [2.0, 0.0])], "vec_id long, embedding array<float>"
    )
    got3 = isotropy(one).collect()[0]
    assert (got3.n, got3.mean_cos_micro) == (1, 0)
