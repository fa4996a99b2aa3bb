"""Span corruption: Python replay of mask rule + sentinel collapse."""

from pagerank_spark.operators.trainprep import span_corruption

KNUTH = 2654435761


def py_span(doc_id, text, mask_mod=5):
    import re

    toks = re.findall(r"[a-z0-9]+", text.lower())
    mk = [
        (((doc_id % (1 << 31)) * 31 + i) * KNUTH) % mask_mod == 0
        for i in range(1, len(toks) + 1)
    ]
    inp, tgt, k = [], [], -1
    for i, (t, m) in enumerate(zip(toks, mk)):
        start = m and (i == 0 or not mk[i - 1])
        if start:
            k += 1
            inp.append(f"<extra_id_{k}>")
            tgt.append(f"<extra_id_{k}> {t}")
        elif m:
            tgt.append(t)
        else:
            inp.append(t)
    return len(toks), sum(mk), " ".join(inp), " ".join(tgt)


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r.doc_id: (r.n_tokens, r.n_masked, r.input_text, r.target_text)
        for r in span_corruption(df).collect()
    }


def test_matches_python_replay(spark):
    rows = [
        (7, "the cat sat on the mat today ok"),
        (13, "one two three four five six seven eight nine ten"),
        (99, " ".join(f"w{i}" for i in range(40))),
    ]
    got = _run(spark, rows)
    for doc_id, text in rows:
        assert got[doc_id] == py_span(doc_id, text), doc_id


def test_reconstruction_roundtrip(spark):
    # replacing each sentinel in the input with its target span restores
    # the original token stream
    rows = [(42, " ".join(f"tok{i}" for i in range(30)))]
    got = _run(spark, rows)
    n, nm, inp, tgt = got[42]
    spans = {}
    cur = None
    for piece in tgt.split():
        if piece.startswith("<extra_id_"):
            cur = piece
            spans[cur] = []
        else:
            spans[cur].append(piece)
    out = []
    for piece in inp.split():
        out.extend(spans[piece] if piece.startswith("<extra_id_") else [piece])
    assert out == [f"tok{i}" for i in range(30)]


def test_empty_docs_filtered(spark):
    got = _run(spark, [(1, ""), (2, "hello world")])
    assert set(got) == {2}
