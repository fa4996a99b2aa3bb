"""Vocabulary growth curve: brute-force prefix-distinct replay."""

from pagerank_spark.operators.textops import vocab_growth


def test_vocab_growth_matches_bruteforce(spark):
    texts = [
        "a b c",
        "a b",
        "d e",
        "a f g h",
        "b c d",
        "i",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.bucket: (r.docs_bound, r.tokens_so_far, r.vocab_so_far)
        for r in vocab_growth(docs, bucket_size=2).collect()
    }
    # brute force per 2-doc prefix
    toks = 0
    seen: set[str] = set()
    expected = {}
    for i, t in enumerate(texts):
        ws = t.split()
        toks += len(ws)
        seen.update(ws)
        if i % 2 == 1:
            expected[i // 2] = ((i // 2 + 1) * 2, toks, len(seen))
    assert got == expected


def test_empty_and_whitespace_docs(spark):
    docs = spark.createDataFrame(
        [(0, "x y"), (1, "   "), (2, "x")], "doc_id long, text string"
    )
    got = {r.bucket: (r.tokens_so_far, r.vocab_so_far) for r in vocab_growth(docs, 1).collect()}
    assert got == {0: (2, 2), 2: (3, 2)}  # bucket 1 has no tokens -> absent
