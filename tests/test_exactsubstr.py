"""ExactSubstr repeated-span removal (trainprep.remove_repeated_spans) vs a
pure-Python replay and closed-form planted fixtures."""

import pytest


def _python_exactsubstr(texts, k=5, min_count=2):
    """Exact replay: tokens covered by any k-window occurring >= min_count
    times corpus-wide are removed."""
    toks = {i: t.split(" ") for i, t in texts}
    counts = {}
    for ws in toks.values():
        for i in range(len(ws) - k + 1):
            g = " ".join(ws[i : i + k])
            counts[g] = counts.get(g, 0) + 1
    out = {}
    for doc_id, ws in toks.items():
        covered = set()
        for i in range(len(ws) - k + 1):
            if counts[" ".join(ws[i : i + k])] >= min_count:
                covered.update(range(i, i + k))
        kept = [w for j, w in enumerate(ws) if j not in covered]
        out[doc_id] = (len(ws), len(covered), " ".join(kept))
    return out


def _run(spark, texts, k=5):
    from pagerank_spark.operators.trainprep import remove_repeated_spans

    df = spark.createDataFrame(list(texts), "doc_id long, text string")
    return {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["text_clean"])
        for r in remove_repeated_spans(df, k=k).collect()
    }


def test_planted_cross_doc_span(spark):
    shared = "alpha beta gamma delta epsilon zeta"  # 6 words -> two 5-windows
    texts = [
        (0, f"intro words {shared} tail0 unique0"),
        (1, f"other opening {shared} tail1 unique1"),
        (2, "completely distinct content with no repeats at all here"),
    ]
    got = _run(spark, texts)
    # exactly the 6 shared tokens vanish from docs 0 and 1
    assert got[0] == (10, 6, "intro words tail0 unique0")
    assert got[1] == (10, 6, "other opening tail1 unique1")
    assert got[2][1] == 0 and got[2][2] == texts[2][1]


def test_self_repeat_within_one_doc(spark):
    span = "one two three four five"
    texts = [(0, f"{span} filler x y z {span}"), (1, "nothing shared here at all")]
    got = _run(spark, texts)
    assert got[0][1] == 10  # both occurrences removed
    assert got[0][2] == "filler x y z"
    assert got[1][1] == 0


def test_short_duplicates_survive(spark):
    # a duplicated 4-gram is BELOW k=5: nothing is removed
    texts = [(0, "a b c d tail-one ending"), (1, "a b c d tail-two closing")]
    got = _run(spark, texts)
    assert got[0][1] == got[1][1] == 0


def test_matches_python_replay(spark):
    base = ["the quick brown fox jumps over the lazy dog today".split(),
            "pack my box with five dozen liquor jugs again now".split()]
    texts = []
    for i in range(12):
        ws = list(base[i % 2])
        ws[i % len(ws)] = f"tok{i}"
        if i % 3 == 0:
            ws += ["shared", "span", "of", "six", "words", "exactly"]
        texts.append((i, " ".join(ws)))
    assert _run(spark, texts) == _python_exactsubstr(texts)


def test_plan_no_python(spark):
    from pagerank_spark.operators.trainprep import remove_repeated_spans

    df = spark.createDataFrame([(0, "a b c d e f g")], "doc_id long, text string")
    plan = remove_repeated_spans(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan
