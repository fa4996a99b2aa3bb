"""Association rules (operators/mining.py::association_rules)."""

from pagerank_spark.operators.mining import association_rules


def test_rules_exact_integer_algebra(spark):
    baskets = [
        (1, "a"), (1, "b"), (1, "c"),
        (2, "a"), (2, "b"),
        (3, "a"), (3, "c"),
        (4, "b"),
        (4, "b"),  # duplicate membership collapses
    ]
    df = spark.createDataFrame(baskets, ["basket_id", "item"])
    got = {(r["antecedent"], r["consequent"]): r for r in association_rules(df, minsup=2).collect()}
    # sup: a=3, b=3, c=2, nb=4; frequent pairs: (a,b)=2, (a,c)=2
    assert set(got) == {("a", "b"), ("b", "a"), ("a", "c"), ("c", "a")}
    ab = got[("a", "b")]
    assert ab["support"] == 2
    assert ab["conf_micro"] == 2 * 1_000_000 // 3
    assert ab["lift_micro"] == 4 * 2 * 1_000_000 // (3 * 3)
    ca = got[("c", "a")]
    assert ca["conf_micro"] == 1_000_000  # c always implies a
    assert ca["lift_micro"] == 4 * 2 * 1_000_000 // (2 * 3)


def test_rules_minsup_filters(spark):
    baskets = [(1, "x"), (1, "y"), (2, "x"), (2, "z")]
    df = spark.createDataFrame(baskets, ["basket_id", "item"])
    rules = association_rules(df, minsup=2).collect()
    assert rules == []  # no pair co-occurs twice
