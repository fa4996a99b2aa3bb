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
