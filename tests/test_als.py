"""ALS k=2 half-step: NumPy lstsq replay of the closed-form ridge solve."""

import numpy as np

from pagerank_spark.operators.recsys import als_user_halfstep


def _factors(itm: int) -> tuple[int, int]:
    h1 = (itm * 2654435761) % 4294967296
    h2 = ((h1 % 1000003 + 7919) * 2654435761) % 4294967296
    return h1 % 7 + 1, h2 % 7 + 1


def test_matches_numpy_ridge(spark):
    rows = [
        (1, 10, 3),
        (1, 11, 5),
        (1, 12, 2),
        (2, 10, 7),
        (2, 13, 1),
        (3, 14, 4),  # single-item user: still solvable thanks to the ridge
    ]
    df = spark.createDataFrame(rows, "user long, item long, rating long")
    got = {r.user: (r.n_items, r.w1, r.w2) for r in als_user_halfstep(df).collect()}
    for u in (1, 2, 3):
        items = [(i, rt) for (uu, i, rt) in rows if uu == u]
        X = np.array([_factors(i) for i, _ in items], dtype=float)
        y = np.array([rt for _, rt in items], dtype=float)
        w = np.linalg.solve(X.T @ X + np.eye(2), X.T @ y)
        assert got[u][0] == len(items)
        np.testing.assert_allclose([got[u][1], got[u][2]], w, atol=1e-6)


def test_duplicate_ratings_are_summed(spark):
    df = spark.createDataFrame(
        [(1, 10, 2), (1, 10, 3)], "user long, item long, rating long"
    )
    one = spark.createDataFrame([(1, 10, 5)], "user long, item long, rating long")
    a = als_user_halfstep(df).collect()[0]
    b = als_user_halfstep(one).collect()[0]
    assert (a.w1, a.w2, a.n_items) == (b.w1, b.w2, b.n_items)
