"""Shapley coverage valuation: brute-force subset-enumeration parity,
efficiency axiom, exclusivity."""

from itertools import permutations

from pagerank_spark.operators.trainprep import shapley_source_value

D = 27720  # lcm(1..12), plenty for <= 4 sources


def brute_shapley(vocab_by_source):
    """Exact Shapley by averaging marginal coverage over ALL orderings."""
    srcs = sorted(vocab_by_source)
    phi = {s: 0 for s in srcs}
    perms = list(permutations(srcs))
    for perm in perms:
        seen = set()
        for s in perm:
            gain = len(vocab_by_source[s] - seen)
            phi[s] += gain
            seen |= vocab_by_source[s]
    # scale to integers: phi * D / n! must be integral for coverage games
    n_fact = len(perms)
    return {s: v * D // n_fact for s, v in phi.items()}


def _run(spark, texts_by_source):
    rows = [
        (i, s, t)
        for i, (s, t) in enumerate(
            (s, t) for s, ts in texts_by_source.items() for t in ts
        )
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = shapley_source_value(df, denom=D).collect()
    return {r.source: (r.n_words, r.n_exclusive, r.shapley_scaled, r.max_m) for r in got}


def test_matches_bruteforce_permutation_shapley(spark):
    corpora = {
        "a": ["the cat sat", "dogs bark"],
        "b": ["the dog sat quietly"],
        "c": ["cat dog fish"],
    }
    vocab = {
        s: set(w for t in ts for w in t.lower().split())
        for s, ts in corpora.items()
    }
    expected = brute_shapley(vocab)
    got = _run(spark, corpora)
    assert {s: v[2] for s, v in got.items()} == expected


def test_efficiency_axiom_total_is_coverage(spark):
    corpora = {"a": ["x y z"], "b": ["y z w"], "c": ["z only here"]}
    got = _run(spark, corpora)
    total_vocab = len({w for ts in corpora.values() for t in ts for w in t.split()})
    assert sum(v[2] for v in got.values()) == total_vocab * D


def test_disjoint_sources_get_full_credit(spark):
    corpora = {"a": ["alpha beta"], "b": ["gamma delta epsilon"]}
    got = _run(spark, corpora)
    assert got["a"] == (2, 2, 2 * D, 1)
    assert got["b"] == (3, 3, 3 * D, 1)


def test_identical_sources_split_evenly(spark):
    corpora = {"a": ["same words here"], "b": ["same words here"]}
    got = _run(spark, corpora)
    assert got["a"] == got["b"] == (3, 0, 3 * D // 2, 2)
