"""Distributed BPE merge learning vs an exact pure-Python replay."""

import collections
import random

from pagerank_spark.operators.bpe import SEP, apply_bpe_merges, learn_bpe_merges


def _py_bpe(texts, k):
    docs = [t.split(" ") for t in texts]
    rules = []
    for rnd in range(1, k + 1):
        cnt = collections.Counter()
        for d in docs:
            cnt.update(zip(d, d[1:]))
        if not cnt:
            break
        (l, r), freq = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        if freq < 2:
            break
        rules.append((rnd, l, r, freq))
        m = l + SEP + r
        nxt = []
        for d in docs:
            out = []
            for x in d:
                if out and out[-1] == l and x == r:
                    out[-1] = m
                else:
                    out.append(x)
            nxt.append(out)
        docs = nxt
    return rules, docs


def test_bpe_learn_and_apply_match_python_replay(spark):
    rng = random.Random(11)
    vocab = ["aa", "bb", "cc", "dd", "ee"]
    texts = [" ".join(rng.choice(vocab) for _ in range(rng.randrange(3, 18))) for _ in range(50)]
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")

    exp_rules, exp_docs = _py_bpe(texts, 5)
    got = [(r["round"], r["left"], r["right"], r["freq"]) for r in learn_bpe_merges(docs, k=5).collect()]
    assert got == exp_rules

    applied = {r.doc_id: list(r.tokens) for r in apply_bpe_merges(docs, [(l, r) for _, l, r, _ in exp_rules]).collect()}
    assert applied == dict(enumerate(exp_docs))
    # repeated tokens merge greedily left-to-right, never overlapping
    tri = spark.createDataFrame([(0, "z z z")], "doc_id long, text string")
    toks = apply_bpe_merges(tri, [("z", "z")]).collect()[0]
    assert list(toks.tokens) == ["z" + SEP + "z", "z"]


def test_bpe_stops_when_no_pair_repeats(spark):
    docs = spark.createDataFrame([(0, "a b"), (1, "c d")], "doc_id long, text string")
    rules = learn_bpe_merges(docs, k=5).collect()
    assert rules == []  # every pair occurs once -> freq<2 -> no rule


def test_bpe_planted_closed_form(spark):
    # the gate corpus: closed-form 6-merge sequence incl. a tie at round 2
    docs = spark.range(400).selectExpr(
        "id AS doc_id",
        "IF(id % 2 = 0, 'x y x y x y x y', 'p q p q p q') AS text",
    )
    got = [(r["round"], r["left"], r["right"], r["freq"]) for r in learn_bpe_merges(docs, k=8).collect()]
    m1, m2 = "x" + SEP + "y", "p" + SEP + "q"
    assert got == [
        (1, "x", "y", 800),
        (2, "p", "q", 600),
        (3, m1, m1, 600),
        (4, m2, m2, 400),
        (5, m2 + SEP + m2, m2, 200),
        (6, m1 + SEP + m1, m1 + SEP + m1, 200),
    ]


def test_bpe_apply_long_rule_chain_checkpoint_path(spark):
    # >8 rules exercises the mid-chain localCheckpoint in apply_bpe_merges
    text = " ".join(str(i) for i in range(12))  # "0 1 2 ... 11"
    docs = spark.createDataFrame([(0, text), (1, text)], "doc_id long, text string")
    rules = []
    cur = [str(i) for i in range(12)]
    for _ in range(10):  # fold left: merge the first pair repeatedly
        rules.append((cur[0], cur[1]))
        cur = [cur[0] + SEP + cur[1]] + cur[2:]
    out = {r.doc_id: (list(r.tokens), r.n_tokens) for r in apply_bpe_merges(docs, rules).collect()}
    assert out[0] == (cur, 2) and out[1] == (cur, 2)


# -- byte/char-level mode ----------------------------------------------------


def _py_bpe_byte(texts, k):
    """Canonical Sennrich byte-level BPE over a weighted word vocabulary."""
    wc = collections.Counter(w for t in texts for w in t.split() if w)
    vocab = {w: tuple(list(w) + ["</w>"]) for w in wc}
    rules = []
    for rnd in range(1, k + 1):
        cnt = collections.Counter()
        for w, syms in vocab.items():
            for p in zip(syms, syms[1:]):
                cnt[p] += wc[w]
        if not cnt:
            break
        (l, r), freq = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        if freq < 2:
            break
        rules.append((rnd, l, r, freq))
        m = l + r
        nxt = {}
        for w, syms in vocab.items():
            out = []
            for x in syms:
                if out and out[-1] == l and x == r:
                    out[-1] = m
                else:
                    out.append(x)
            nxt[w] = tuple(out)
        vocab = nxt
    return rules, vocab


def test_bpe_byte_learn_and_apply_match_python_replay(spark):
    from pagerank_spark.operators.bpe import apply_bpe_merges_byte, learn_bpe_merges_byte

    rng = random.Random(7)
    words = ["low", "lower", "lowest", "newer", "newest", "wider", "widest", "new"]
    texts = [" ".join(rng.choice(words) for _ in range(rng.randrange(2, 12))) for _ in range(60)]
    docs = spark.createDataFrame(list(enumerate(texts)), "doc_id long, text string")

    exp_rules, exp_vocab = _py_bpe_byte(texts, 10)
    got = [
        (r["round"], r["left"], r["right"], r["freq"])
        for r in learn_bpe_merges_byte(docs, k=10).collect()
    ]
    assert got == exp_rules

    applied = {
        r.doc_id: list(r.tokens)
        for r in apply_bpe_merges_byte(docs, [(l, r) for _, l, r, _ in exp_rules]).collect()
    }
    want = {i: [s for w in t.split() if w for s in exp_vocab[w]] for i, t in enumerate(texts)}
    assert applied == want


def test_bpe_byte_merges_stay_within_words(spark):
    """No merge rule may span a word boundary: every learned symbol must be
    a substring of some word + optional </w> suffix."""
    from pagerank_spark.operators.bpe import learn_bpe_merges_byte

    docs = spark.createDataFrame(
        [(i, "ab cd ab cd ab") for i in range(20)], "doc_id long, text string"
    )
    rules = learn_bpe_merges_byte(docs, k=6).collect()
    for r in rules:
        stripped = (r["left"] + r["right"]).replace("</w>", "")
        assert stripped in ("ab", "cd", "a", "b", "c", "d")


def test_bpe_byte_planted_closed_form(spark):
    """The gate corpus: 100x 'aaab ab' + 50x 'cd cd cd' collapses in exactly
    6 hand-computed merges, exercising 3-way and 2-way count ties."""
    from pagerank_spark.operators.bpe import learn_bpe_merges_byte

    rows = [(i, "aaab ab") for i in range(100)] + [(100 + i, "cd cd cd") for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = [(r["round"], r["left"], r["right"], r["freq"]) for r in learn_bpe_merges_byte(docs, k=8).collect()]
    assert got == [
        (1, "a", "a", 200),
        (2, "a", "b", 200),
        (3, "ab", "</w>", 200),
        (4, "c", "d", 150),
        (5, "cd", "</w>", 150),
        (6, "aa", "ab</w>", 100),
    ]
