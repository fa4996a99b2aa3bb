"""Unigram-LM tokenizer: exact Python Viterbi replay + contract cases."""

import math

from pagerank_spark.operators.unigram import unigram_segment, unigram_vocab


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _replay_vocab(texts, max_len=4, min_count=2):
    words = {}
    for t in texts:
        for w in t.split():
            w = w[:48]
            if w:
                words[w] = words.get(w, 0) + 1
    counts = {}
    for w, c in words.items():
        for j in range(len(w)):
            for l in range(1, min(max_len, len(w) - j) + 1):
                p = w[j : j + l]
                counts[p] = counts.get(p, 0) + c
    kept = {p: c for p, c in counts.items() if len(p) == 1 or c >= min_count}
    total = sum(kept.values())
    return words, {p: round(math.log(c / total) * 1e9) for p, c in kept.items()}


def _replay_segment(w, scores, max_len=4):
    n = len(w)
    # (score, -ntok, j) lexicographic max == the packed-key order
    best = [None] * (n + 1)
    best[0] = (0, 0, -1)
    for i in range(1, n + 1):
        cands = []
        for j in range(max(0, i - max_len), i):
            p = w[j:i]
            if p in scores and best[j] is not None:
                cands.append((best[j][0] + scores[p], best[j][1] - 1, j))
        best[i] = max(cands)
    toks, pos = [], n
    while pos > 0:
        j = best[pos][2]
        toks.append(w[j:pos])
        pos = j
    return list(reversed(toks)), -best[n][1], best[n][0]


def test_unigram_vocab_matches_replay(spark):
    texts = ["the theme theme the them", "the theme of them all the all"]
    _, scores = _replay_vocab(texts, min_count=3)
    got = {
        r.piece: (r.cnt, r.score_nano)
        for r in unigram_vocab(_docs(spark, texts), min_count=3).collect()
    }
    assert set(got) == set(scores)
    for p, s in scores.items():
        assert got[p][1] == s
    # the fallback alphabet survives the count floor
    assert "f" in got and got["f"][0] == 1


def test_unigram_segment_matches_replay(spark):
    texts = ["the theme theme the them", "the theme of them all the all"]
    words, scores = _replay_vocab(texts, min_count=3)
    got = {
        r.w: (r.seg, r.n_tokens, r.score_nano)
        for r in unigram_segment(_docs(spark, texts), min_count=3).collect()
    }
    assert set(got) == set(words)
    for w in words:
        toks, nt, sc = _replay_segment(w, scores)
        assert got[w] == (" ".join(toks), nt, sc), w
    # frequent whole words stay single pieces
    assert got["the"][0] == "the"
    assert got["them"][0] == "them"


def test_unigram_every_word_segmentable(spark):
    # rare junk word: only single-char fallback pieces cover it
    texts = ["zqxv", "aa aa aa"]
    got = {r.w: r for r in unigram_segment(_docs(spark, texts), min_count=3).collect()}
    assert got["zqxv"].seg == "z q x v"
    assert got["zqxv"].n_tokens == 4
    assert got["aa"].n_tokens == 1
    # reassembly invariant
    for w, r in got.items():
        assert r.seg.replace(" ", "") == w


def test_unigram_fertility_per_doc(spark):
    from pagerank_spark.operators.unigram import unigram_fertility

    texts = ["the theme theme the them", "the theme of them all the all", ""]
    got = {r.doc_id: (r.n_words, r.n_pieces, r.fert_micro)
           for r in unigram_fertility(_docs(spark, texts), min_count=3).collect()}
    words, scores = _replay_vocab(texts, min_count=3)
    nt = {w: _replay_segment(w, scores)[1] for w in words}

    def doc_stats(t):
        ws = [w[:48] for w in t.split() if w]
        n_w = len(ws)
        n_p = sum(nt[w] for w in ws)
        return (n_w, n_p, (n_p * 10**6) // n_w if n_w else 0)

    assert got[0] == doc_stats(texts[0])
    assert got[1] == doc_stats(texts[1])
    # empty doc -> sentinel row, not a missing row
    assert got[2] == (0, 0, 0)


def test_unigram_em_round_matches_replay_and_prunes(spark):
    texts = ["the theme theme the them", "the theme of them all the all"]
    from pagerank_spark.operators.unigram import unigram_em_round

    words, scores0 = _replay_vocab(texts, min_count=3)
    # hard-EM replay: re-count used pieces, alphabet floor, re-score
    used = {}
    for w, c in words.items():
        toks, _, _ = _replay_segment(w, scores0)
        for t in toks:
            used[t] = used.get(t, 0) + c
    alpha = {ch for w in words for ch in w}
    counts2 = {}
    for p in set(used) | alpha:
        c = used.get(p, 0) + (1 if len(p) == 1 else 0)
        if c > 0:
            counts2[p] = c
    total2 = sum(counts2.values())
    scores2 = {p: round(math.log(c / total2) * 1e9) for p, c in counts2.items()}
    got = {
        r.w: (r.seg, r.n_tokens, r.score_nano)
        for r in unigram_em_round(_docs(spark, texts), min_count=3).collect()
    }
    for w in words:
        toks, nt, sc = _replay_segment(w, scores2)
        assert got[w] == (" ".join(toks), nt, sc), w
    # pruning really happened: some round-0 multi-char piece is unused
    assert any(len(p) > 1 and p not in counts2 for p in scores0)


def test_unigram_segment_tricky_corpora_match_replay(spark):
    corpora = [
        ["aaaa aaaa aa a", "aaa aa aaaa"],                      # repeats
        ["ab, cd! ab, ef?", "ab, xy."],                         # punctuation
        ["héllo wörld héllo", "wörld wörld héllo"],             # unicode
        ["x", "y", "x y x"],                                    # single chars
        ["abcd" * 15 + " ab", "ab abcd"],                       # 60-char word (cap 48)
    ]
    for texts in corpora:
        words, scores = _replay_vocab(texts, min_count=2)
        got = {
            r.w: (r.seg, r.n_tokens, r.score_nano)
            for r in unigram_segment(_docs(spark, texts), min_count=2).collect()
        }
        assert set(got) == set(words), texts
        for w in words:
            toks, nt, sc = _replay_segment(w, scores)
            assert got[w] == (" ".join(toks), nt, sc), (texts, w)
