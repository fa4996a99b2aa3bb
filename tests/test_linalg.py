"""Distributed matmul (operators/linalg.py): cell path == block path == NumPy."""

import numpy as np
from pyspark.sql import functions as F

from pagerank_spark.operators.linalg import block_matmul, spmm_cells


def _formula_matrices(spark):
    A = (
        spark.range(60)
        .crossJoin(spark.range(40).withColumnRenamed("id", "k"))
        .filter("(id*40+k) % 3 != 0")
        .select(
            F.col("id").alias("i"), "k",
            (((F.col("id") * 7 + F.col("k") * 11) % 13) - 6).alias("v"),
        )
    )
    B = (
        spark.range(40)
        .crossJoin(spark.range(50).withColumnRenamed("id", "j"))
        .filter("(id*50+j) % 4 != 0")
        .select(
            F.col("id").alias("k"), "j",
            (((F.col("id") * 5 + F.col("j") * 3) % 11) - 5).alias("v"),
        )
    )
    return A, B


def _dense(rows, shape, ij):
    m = np.zeros(shape, dtype=np.int64)
    for r in rows:
        m[r[ij[0]], r[ij[1]]] = r["v"]
    return m


def test_cell_and_block_paths_match_numpy(spark):
    A, B = _formula_matrices(spark)
    am = _dense([r.asDict() for r in A.collect()], (60, 40), ("i", "k"))
    bm = _dense([r.asDict() for r in B.collect()], (40, 50), ("k", "j"))
    cm = am @ bm
    exp = {(i, j): int(cm[i, j]) for i, j in zip(*np.nonzero(cm))}
    got_cells = {(r.i, r.j): r.v for r in spmm_cells(A, B).collect()}
    got_block = {(r.i, r.j): r.v for r in block_matmul(A, B, block=16).collect()}
    assert got_cells == exp
    assert got_block == exp


def test_block_size_does_not_change_result(spark):
    A, B = _formula_matrices(spark)
    a = {(r.i, r.j): r.v for r in block_matmul(A, B, block=7).collect()}
    b = {(r.i, r.j): r.v for r in block_matmul(A, B, block=64).collect()}
    assert a == b


def test_duplicate_cells_accumulate(spark):
    # COO tables with repeated coordinates must sum before multiplying
    A = spark.createDataFrame([(0, 0, 2), (0, 0, 3), (0, 1, 1)], "i long, k long, v long")
    B = spark.createDataFrame([(0, 0, 4), (1, 0, 10)], "k long, j long, v long")
    assert {(r.i, r.j): r.v for r in spmm_cells(A, B).collect()} == {(0, 0): 30}
    assert {(r.i, r.j): r.v for r in block_matmul(A, B, block=4).collect()} == {(0, 0): 30}


# -- Gram matrix + PCA ------------------------------------------------------


def test_gram_matrix_matches_numpy(spark):
    rows = [(i, [((i * 3 + j * 5) % 9) - 4 for j in range(6)]) for i in range(40)]
    df = spark.createDataFrame(rows, "id long, qvec array<long>")
    x = np.array([r[1] for r in rows], dtype=np.int64)
    exp = x.T @ x
    from pagerank_spark.operators.linalg import gram_matrix

    got = {(r.i, r.j): r.s for r in gram_matrix(df, "qvec").collect()}
    for i in range(6):
        for j in range(i, 6):
            assert got[(i, j)] == int(exp[i, j])
    assert len(got) == 6 * 7 // 2


def test_power_iteration_matches_eigh(spark):
    rows = [(i, [((i * 7 + j * 11) % 13) - 6 for j in range(8)]) for i in range(60)]
    df = spark.createDataFrame(rows, "id long, qvec array<long>")
    from pagerank_spark.operators.linalg import gram_matrix, power_iteration

    cells = [(r.i, r.j, r.s) for r in gram_matrix(df, "qvec").collect()]
    lam, v = power_iteration(cells, 8, iters=200)
    x = np.array([r[1] for r in rows], dtype=np.float64)
    w, vecs = np.linalg.eigh(x.T @ x)
    assert abs(lam - w[-1]) / w[-1] < 1e-9
    top = vecs[:, -1]
    # direction match up to sign
    assert min(np.linalg.norm(v - top), np.linalg.norm(v + top)) < 1e-6


def test_effective_dim_flat_vs_collapsed(spark):
    import numpy as np

    from pagerank_spark.operators.linalg import effective_dim, gram_matrix

    # flat spectrum: orthogonal axis vectors -> PR = dim
    flat = spark.createDataFrame(
        [(0, [4, 0, 0]), (1, [0, 4, 0]), (2, [0, 0, 4])],
        "vec_id long, qvec array<long>",
    )
    got = effective_dim(gram_matrix(flat, "qvec")).collect()[0]
    assert got.dim == 3 and got.effdim_micro == 3_000_000
    # rank-1 collapse: all vectors parallel -> PR = 1
    col = spark.createDataFrame(
        [(i, [2, 4, 6]) for i in range(5)], "vec_id long, qvec array<long>"
    )
    got2 = effective_dim(gram_matrix(col, "qvec")).collect()[0]
    assert got2.effdim_micro == 1_000_000
    # numpy replay on an arbitrary integer matrix
    X = np.array([[1, 2, 0], [3, 1, 1], [0, 2, 5], [1, 1, 1]], dtype=np.int64)
    df = spark.createDataFrame(
        [(i, [int(x) for x in row]) for i, row in enumerate(X)],
        "vec_id long, qvec array<long>",
    )
    C = X.T @ X
    want = round(float(np.trace(C)) ** 2 / float((C * C).sum()) * 1e6)
    got3 = effective_dim(gram_matrix(df, "qvec")).collect()[0]
    assert got3.effdim_micro == want
