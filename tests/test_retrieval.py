"""BM25 retrieval vs an exact pure-Python replay (integer-rational scoring)."""

import collections
import math

from pagerank_spark.operators.retrieval import bm25_topk, build_postings

CORPUS = [
    (0, "spark shuffle join spark spark"),
    (1, "join join join query table row"),
    (2, "query plan scan filter"),
    (3, "the the the the the the the the spark"),   # long doc, one hit
    (4, "shuffle"),                                  # shortest possible doc
    (5, "agg window sort"),                          # no query terms at all
    (6, "spark query spark query"),
    (7, "Spark  SHUFFLE   join "),                   # case + runs of spaces
]
QUERY = ["spark", "shuffle", "join", "query", "missing"]


def _py_bm25(rows, q_tokens, k):
    toks = {d: t.lower().split() for d, t in rows}
    q = sorted({t.lower() for t in q_tokens})
    n_docs = len(toks)
    total = sum(len(t) for t in toks.values())
    tf = {d: collections.Counter(t) for d, t in toks.items()}
    df = {t: sum(1 for d in toks if t in tf[d]) for t in q}
    scores = collections.defaultdict(int)
    for term in q:
        if df[term] == 0:
            continue
        # half-away-from-zero on a positive value == floor(x + 0.5)
        idf_micro = math.floor(
            math.log((2 * n_docs + 2) / (2 * df[term] + 1)) * 1_000_000 + 0.5
        )
        for d in toks:
            f = tf[d][term]
            if f == 0:
                continue
            num = idf_micro * 44 * total * f
            den = 20 * total * f + 6 * total + 18 * len(toks[d]) * n_docs
            scores[d] += num // den
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:k]


def _docs(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def test_bm25_matches_integer_replay(spark):
    got = [(r.doc_id, r.score_micro) for r in bm25_topk(_docs(spark), QUERY, k=6).collect()]
    assert got == _py_bm25(CORPUS, QUERY, 6)


def test_bm25_excludes_no_hit_docs(spark):
    got = {r.doc_id for r in bm25_topk(_docs(spark), QUERY, k=20).collect()}
    assert 5 not in got and got == {0, 1, 2, 3, 4, 6, 7}


def test_bm25_accepts_prebuilt_postings(spark):
    docs = _docs(spark)
    post = build_postings(docs).localCheckpoint()
    got = [(r.doc_id, r.score_micro) for r in bm25_topk(docs, QUERY, k=6, postings=post).collect()]
    assert got == _py_bm25(CORPUS, QUERY, 6)


def test_bm25_length_normalization_orders_equal_tf(spark):
    # doc 3 (len 9, tf=1 'spark') must score below doc 7 (len 3, tf=1 'spark')
    got = {r.doc_id: r.score_micro for r in bm25_topk(_docs(spark), ["spark"], k=8).collect()}
    assert got[7] > got[3]


def test_bm25_postings_plan_is_partial_agg(spark):
    # indexing = explode + hash-agg; no window, no cartesian
    plan = build_postings(_docs(spark))._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan and "Cartesian" not in plan


def test_rrf_fuse_hand_replay(spark):
    from pagerank_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame([(1, 9.0), (2, 5.0), (3, 1.0)], "doc_id long, score double")
    b = spark.createDataFrame([(2, 7.0), (4, 7.0), (1, 2.0)], "doc_id long, score double")
    got = {
        r.doc_id: (r.rrf_scaled, r.n_rankers)
        for r in rrf_fuse({"a": a, "b": b}, k=60).collect()
    }
    c = lambda r: 1_000_000_000 // (60 + r)
    # b ranks: score tie 7.0 between 2 and 4 -> id-asc puts 2 first
    assert got[1] == (c(1) + c(3), 2)
    assert got[2] == (c(2) + c(1), 2)
    assert got[3] == (c(3), 1)
    assert got[4] == (c(2), 1)
