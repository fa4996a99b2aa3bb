"""Training-corpus preparation operators (operators/trainprep.py):
decontamination, tf-idf, deterministic blending, paragraph dedup."""

import math

from pyspark.sql import functions as F

from pagerank_spark.operators.trainprep import (
    blend_corpora,
    decontaminate,
    dedup_paragraphs,
    tfidf_top_terms,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_decontaminate_flags_ngram_collisions(spark):
    train = _docs(
        spark,
        [
            (0, "alpha beta gamma delta epsilon"),  # shares 3-gram with eval
            (1, "one two three four five"),  # clean
            (2, "alpha beta gamma"),  # whole doc is one clamped gram? no: 3 toks -> 1 gram
            (3, "zz"),  # short doc, clamped single gram, clean
        ],
    )
    ev = _docs(spark, [(100, "xx alpha beta gamma yy"), (101, "alpha beta gamma")])
    out = {
        r["doc_id"]: (r["n_grams"], r["n_hits"], r["contaminated"])
        for r in decontaminate(train, ev, n=3).collect()
    }
    # doc 0: grams {a b g, b g d, g d e} -> 1 hit
    assert out[0] == (3, 1, 1)
    assert out[1] == (3, 0, 0)
    assert out[2] == (1, 1, 1)
    assert out[3] == (1, 0, 0)


def test_decontaminate_min_hits_threshold(spark):
    train = _docs(spark, [(0, "a b c d e f")])
    ev = _docs(spark, [(1, "a b c d")])  # eval grams: {a b c, b c d}
    one = decontaminate(train, ev, n=3, min_hits=3).collect()[0]
    assert one["n_hits"] == 2 and one["contaminated"] == 0


def test_tfidf_matches_closed_form(spark):
    docs = _docs(
        spark,
        [
            (0, "cat cat dog"),
            (1, "dog bird"),
            (2, "cat fish fish fish"),
        ],
    )
    out = tfidf_top_terms(docs, k=2).collect()
    n = 3

    def score(tf, df):
        return tf * (math.log((n + 1) / (df + 1)) + 1.0)

    got = {(r["doc_id"], r["rk"]): (r["term"], r["tf"], r["score"]) for r in out}
    # doc 0: cat tf=2 df=2 -> 2*(ln(4/3)+1); dog tf=1 df=2
    assert got[(0, 1)][0] == "cat"
    assert abs(got[(0, 1)][2] - round(score(2, 2), 6)) < 1e-9
    assert got[(0, 2)][0] == "dog"
    # doc 2: fish tf=3 df=1 ranks above cat tf=1 df=2
    assert got[(2, 1)][0] == "fish"
    assert abs(got[(2, 1)][2] - round(score(3, 1), 6)) < 1e-9
    # ties (equal tf, df) break by term string: doc 1 dog/bird both tf=1 df=2... bird df=1
    assert got[(1, 1)][0] == "bird"  # df=1 -> higher idf than dog (df=2)


def test_blend_exact_proportions_and_determinism(spark):
    rows = [(i, "t", "en" if i % 4 != 3 else "de") for i in range(400)]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = blend_corpora(docs, {"en": 0.5, "de": 0.5})
    by = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    # n_en=300, n_de=100 -> S = min(300/.5, 100/.5) = 200 -> 100 each
    assert by == {"en": 100, "de": 100}
    ids_a = sorted(r["doc_id"] for r in out.collect())
    ids_b = sorted(r["doc_id"] for r in blend_corpora(docs.repartition(13), {"en": 0.5, "de": 0.5}).collect())
    assert ids_a == ids_b  # stable under repartitioning


def test_blend_salt_changes_sample_not_counts(spark):
    # en oversupplied (200 docs) vs its 25% mixture share; de is the binding
    # domain: S = min(200/.25, 100/.75) = 133 -> take en 33, de 99
    rows = [(i, "t", "en" if i < 200 else "de") for i in range(300)]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    weights = {"en": 0.25, "de": 0.75}
    s0 = blend_corpora(docs, weights, salt=0)
    s1 = blend_corpora(docs, weights, salt=7)
    c0 = {r["lang"]: r["n"] for r in s0.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    c1 = {r["lang"]: r["n"] for r in s1.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert c0 == c1 == {"en": 33, "de": 99}
    en0 = set(r["doc_id"] for r in s0.filter(F.col("lang") == "en").collect())
    en1 = set(r["doc_id"] for r in s1.filter(F.col("lang") == "en").collect())
    assert len(en0) == len(en1) == 33 and en0 != en1  # salt reshuffles the pick


def test_prepare_training_corpus_stage_interactions(spark):
    from pagerank_spark.operators.packing import KNUTH
    from pagerank_spark.operators.trainprep import prepare_training_corpus

    good = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    evaltxt = "one two three four five six seven eight nine ten eleven twelve thirteen"
    rows = [
        (0, "tiny"),                      # fails quality (1 token)
        (1, good),                        # survives, canonical of the dup pair
        (2, good),                        # exact dup of 1 -> dropped
        (3, evaltxt),                     # contaminated (13-gram hit) -> dropped
        (4, good + " nu"),                # survives
        (5, good + " nu xi"),             # survives
    ]
    docs = _docs(spark, rows)
    ev = _docs(spark, [(100, evaltxt)])
    out = {r["doc_id"]: r for r in prepare_training_corpus(docs, ev, budget=13).collect()}
    assert set(out) == {1, 4, 5}

    def split_of(i):
        b = ((i * KNUTH) % (1 << 32)) % 100
        return "train" if b < 90 else ("val" if b < 95 else "test")

    # packing offsets are PER SPLIT, over survivors only, doc_id ascending
    offsets = {}
    for i in (1, 4, 5):
        s = split_of(i)
        assert out[i]["split"] == s
        start = offsets.get(s, 0)
        n = len(rows[i][1].split())
        assert out[i]["start_offset"] == start, i
        assert out[i]["first_chunk"] == start // 13
        assert out[i]["last_chunk"] == (start + n - 1) // 13
        offsets[s] = start + n


def test_dedup_paragraphs_first_occurrence_order(spark):
    docs = _docs(spark, [(0, "A\nB\nA\nC\nB"), (1, "X"), (2, "A\nA\nA")])
    got = {r["doc_id"]: r for r in dedup_paragraphs(docs).collect()}
    assert (got[0]["n_paras"], got[0]["n_kept"], got[0]["text_dedup"]) == (5, 3, "A\nB\nC")
    assert (got[1]["n_paras"], got[1]["n_kept"], got[1]["text_dedup"]) == (1, 1, "X")
    assert (got[2]["n_paras"], got[2]["n_kept"], got[2]["text_dedup"]) == (3, 1, "A")


def test_prepare_corpus_job_partitioned_write(spark, tmp_path):
    import importlib.util
    import os as _os

    spec = importlib.util.spec_from_file_location(
        "run_prepare_corpus",
        _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))),
                      "jobs", "run_prepare_corpus.py"),
    )
    job = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(job)

    sf = "/root/testdata/sf0.001"
    ev_dir, out_dir = str(tmp_path / "ev"), str(tmp_path / "out")
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    docs.filter(F.col("doc_id") % 37 == 0).write.parquet(ev_dir)
    summary = job.run(spark, f"{sf}/documents.parquet", ev_dir, out_dir,
                      0.7, 13, 2048, 90, 5)
    assert summary["kept_docs"] < summary["input_docs"]
    back = spark.read.parquet(out_dir)
    assert set(r["split"] for r in back.select("split").distinct().collect()) <= {"train", "val", "test"}
    assert back.count() == summary["kept_docs"]
    # placement columns survive the partitioned layout
    assert {"doc_id", "n_tokens", "start_offset", "first_chunk", "last_chunk", "n_chunks", "split"} <= set(back.columns)


# ---------------------------------------------------------------------------
# DSIR-style importance weighting
# ---------------------------------------------------------------------------

def _poly_bucket(tok: str, n_buckets: int = 16) -> int:
    h = 0
    for ch in tok:
        h = (h * 31 + ord(ch)) % (2**31)
    return h % n_buckets


def _np_importance(rows, target_ids, n_buckets=16):
    """Pure-Python replay of importance_weights' exact-integer contract."""
    feats, is_t = {}, {}
    for doc_id, text in rows:
        toks = [t for t in text.strip().lower().split() if t]
        c = [0] * n_buckets
        for t in toks:
            c[_poly_bucket(t, n_buckets)] += 1
        feats[doc_id] = c
        is_t[doc_id] = doc_id in target_ids
    R = [sum(feats[d][b] for d in feats) for b in range(n_buckets)]
    T = [sum(feats[d][b] for d in feats if is_t[d]) for b in range(n_buckets)]
    rt, tt = sum(R) + n_buckets, sum(T) + n_buckets
    out = {}
    for d, c in feats.items():
        num = sum(cb * (T[b] + 1) for b, cb in enumerate(c)) * rt
        den = sum(cb * (R[b] + 1) for b, cb in enumerate(c)) * tt
        out[d] = (num, den)
    return out


def test_importance_weights_exact_replay(spark):
    from pagerank_spark.operators.trainprep import importance_weights

    rows = [
        (0, "the cat sat on the mat"),
        (1, "quantum flux capacitor array"),
        (2, "the dog sat on the log"),
        (3, "   "),  # empty after trim: never selected
        (4, "quantum entanglement"),
    ]
    docs = _docs(spark, rows)
    got = {
        r["doc_id"]: (r["imp_num"], r["imp_den"], r["selected"])
        for r in importance_weights(
            docs, F.col("doc_id").isin(1, 4), threshold_num=1, threshold_den=1
        ).collect()
    }
    exp = _np_importance(rows, {1, 4})
    for d, (num, den) in exp.items():
        sel = 1 if den > 0 and num >= den else 0
        assert got[d] == (num, den, sel), d
    # doc 1 (pure target vocabulary) self-selects at threshold 1.0; the
    # non-target docs rank below it (doc 4 may dip under 1.0 when its
    # buckets collide with common raw words — that's the hashing trade)
    assert got[1][2] == 1
    ratio = lambda d: got[d][0] / got[d][1]  # noqa: E731
    assert ratio(1) > ratio(0) and ratio(1) > ratio(2)
    assert got[3] == (0, 0, 0)  # empty doc: zero weight, never selected


def test_importance_logratio_matches_numpy(spark):
    import numpy as np
    from pagerank_spark.operators.trainprep import importance_logratio

    rows = [
        (0, "the cat sat on the mat"),
        (1, "quantum flux capacitor array"),
        (2, "the dog sat on the log"),
        (4, "quantum entanglement"),
    ]
    docs = _docs(spark, rows)
    got = {
        r["doc_id"]: r["log_weight"]
        for r in importance_logratio(docs, F.col("doc_id").isin(1, 4)).collect()
    }
    exp_int = _np_importance(rows, {1, 4})
    # recompute the true log-LR from the same feature counts
    n_buckets = 16
    feats = {}
    for doc_id, text in rows:
        c = [0] * n_buckets
        for t in [t for t in text.strip().lower().split() if t]:
            c[_poly_bucket(t)] += 1
        feats[doc_id] = c
    R = [sum(feats[d][b] for d in feats) for b in range(n_buckets)]
    T = [sum(feats[d][b] for d in feats if d in (1, 4)) for b in range(n_buckets)]
    rt, tt = sum(R) + n_buckets, sum(T) + n_buckets
    for d, c in feats.items():
        lw = sum(
            cb * (math.log((T[b] + 1) / tt) - math.log((R[b] + 1) / rt))
            for b, cb in enumerate(c)
        )
        assert abs(got[d] - lw) < 1e-9, d
    # orderings agree with the exact-integer variant on this fixture
    by_log = sorted(got, key=got.get)
    by_lin = sorted(exp_int, key=lambda d: exp_int[d][0] / max(exp_int[d][1], 1))
    assert by_log[-1] == by_lin[-1]


def test_importance_repartition_stable(spark):
    from pagerank_spark.operators.trainprep import importance_weights

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pred = F.col("source").isin("src1", "src2")
    a = sorted(importance_weights(docs, pred).collect())
    b = sorted(importance_weights(docs.repartition(13), pred).collect())
    assert a == b
