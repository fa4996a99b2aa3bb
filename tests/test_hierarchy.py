"""tree_rollup: hand fixtures, forest + early-stop behavior."""

from pagerank_spark.operators.hierarchy import tree_rollup


def _nodes(spark, rows):
    return spark.createDataFrame(rows, "id long, parent long, value long")


def test_tree_rollup_hand_tree(spark):
    #        0(5)
    #       /    \
    #     1(1)   2(2)
    #     /  \
    #   3(7) 4(3)
    rows = [(0, None, 5), (1, 0, 1), (2, 0, 2), (3, 1, 7), (4, 1, 3)]
    got = {r.id: (r.subtree_sum, r.n_desc) for r in tree_rollup(_nodes(spark, rows)).collect()}
    assert got == {0: (18, 5), 1: (11, 3), 2: (2, 1), 3: (7, 1), 4: (3, 1)}


def test_tree_rollup_forest_and_self_parent_roots(spark):
    # two roots: one NULL-parent, one self-parent (both root conventions)
    rows = [(10, None, 4), (11, 10, 6), (20, 20, 9), (21, 20, 1)]
    got = {r.id: (r.subtree_sum, r.n_desc) for r in tree_rollup(_nodes(spark, rows)).collect()}
    assert got == {10: (10, 2), 11: (6, 1), 20: (10, 2), 21: (1, 1)}


def test_tree_rollup_deep_chain_converges(spark):
    # path graph of 12 nodes: subtree sums are suffix sums
    rows = [(i, i - 1 if i > 0 else None, 1) for i in range(12)]
    got = {r.id: (r.subtree_sum, r.n_desc) for r in tree_rollup(_nodes(spark, rows)).collect()}
    assert got == {i: (12 - i, 12 - i) for i in range(12)}


def test_tree_rollup_negative_values_exact(spark):
    rows = [(0, None, -5), (1, 0, 3), (2, 0, -4)]
    got = {r.id: r.subtree_sum for r in tree_rollup(_nodes(spark, rows)).collect()}
    assert got == {0: -6, 1: 3, 2: -4}
