"""Weighted Jaccard between sources: closed-form multiset algebra."""

from pagerank_spark.operators.trainprep import source_weighted_jaccard


def _run(spark, corpora):
    rows = [
        (i, s, t)
        for i, (s, t) in enumerate(
            (s, t) for s, ts in corpora.items() for t in ts
        )
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    return {
        (r.source_a, r.source_b): (r.tot_a, r.tot_b, r.sum_min, r.jaccard_micro)
        for r in source_weighted_jaccard(df).collect()
    }


def test_multiset_min_max_closed_form(spark):
    # a: {x:2, y:1}; b: {x:1, z:2} -> min=1, max = 3+3-1 = 5 -> 200000
    got = _run(spark, {"a": ["x x y"], "b": ["x z z"]})
    assert got == {("a", "b"): (3, 3, 1, 200000)}


def test_identical_sources_full_similarity(spark):
    got = _run(spark, {"a": ["p q q"], "b": ["q p q"]})
    assert got[("a", "b")] == (3, 3, 3, 1000000)


def test_disjoint_sources_zero_row_present(spark):
    got = _run(spark, {"a": ["alpha"], "b": ["beta beta"]})
    assert got[("a", "b")] == (1, 2, 0, 0)


def test_three_sources_all_pairs(spark):
    got = _run(spark, {"a": ["x"], "b": ["x"], "c": ["y"]})
    assert set(got) == {("a", "b"), ("a", "c"), ("b", "c")}
    assert got[("a", "b")][3] == 1000000 and got[("a", "c")][3] == 0
