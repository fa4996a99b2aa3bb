"""Distributed matrix multiplication over sparse COO cell tables.

Two physical strategies for ``C = A @ B`` with ``A(i, k, v)`` / ``B(k, j, w)``
sparse integer cell tables:

- :func:`spmm_cells` — the relational form: equi-join on the inner index,
  multiply, ``groupBy(i, j).sum``. Shuffle volume = number of PARTIAL
  PRODUCTS (nnz-bound, not dimension-bound), map-side combined; this is the
  right plan when the matrices are sparse (adjacency-like), and it is
  exactly restatable in SQL — the ``matmul_synth`` gate runs the BLOCK path
  against this shape as the DuckDB oracle.
- :func:`block_matmul` — the dense-block form: cells are grouped into
  ``block x block`` tiles (one Arrow/pandas pass per side), tiles join on
  the inner block index, and each tile pair multiplies as a single NumPy
  int64 ``A_tile @ B_tile`` — the per-pair work becomes one BLAS-shaped
  kernel instead of ``block^3`` join rows. Partial tiles then explode back
  to nonzero cells and sum per (i, j). At 100 TB this is the standard
  SUMMA-family layout: shuffle keys are tile coordinates (``n/block`` per
  axis), each task owns dense submatrices, and the Python boundary is
  Arrow-batched tiles, never per-cell rows.

Both paths are EXACT: integer cells, int64 accumulation (NumPy int64 in the
tile kernel, BIGINT sums in the relational plan), so results are
order-independent and hash-stable across engines. Overflow contract: with
``|v| <= m`` and inner dimension K, every C entry is bounded by
``K * m^2`` — the caller keeps that under 2^63 (the gate uses |v| <= 6,
K = 40).

Reference parity: none (the reference is a single-query PageRank engine);
distributed linear algebra is LLM-pipeline breadth (embedding projections,
co-occurrence products, graph powers).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spmm_cells(a: DataFrame, b: DataFrame) -> DataFrame:
    """``C(i, j, v)`` = A @ B via inner-index join + grouped sum (exact)."""
    aa = a.select(F.col("i"), F.col("k"), F.col("v").cast("long").alias("av"))
    bb = b.select(F.col("k"), F.col("j"), F.col("v").cast("long").alias("bv"))
    return (
        aa.join(bb, "k")
        .groupBy("i", "j")
        .agg(F.sum(F.col("av") * F.col("bv")).alias("v"))
        .filter(F.col("v") != 0)
    )


def _tile(df: DataFrame, row_col: str, col_col: str, block: int) -> DataFrame:
    """Group cells into dense ``block x block`` tiles: one row per tile with
    a flattened row-major value array (local index = (r % block) * block +
    (c % block))."""
    cells = df.select(
        F.expr(f"{row_col} DIV {block}").cast("long").alias("br"),
        F.expr(f"{col_col} DIV {block}").cast("long").alias("bc"),
        (
            (F.col(row_col) % block) * block + (F.col(col_col) % block)
        ).cast("int").alias("pos"),
        F.col("v").cast("long").alias("v"),
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        dense = np.zeros(block * block, dtype="int64")
        np.add.at(dense, pdf["pos"].to_numpy(), pdf["v"].to_numpy())
        return pd.DataFrame(
            {
                "br": [int(pdf["br"].iloc[0])],
                "bc": [int(pdf["bc"].iloc[0])],
                "data": [dense.tolist()],
            }
        )

    return cells.groupBy("br", "bc").applyInPandas(
        build, "br long, bc long, data array<long>"
    )


def block_matmul(a: DataFrame, b: DataFrame, block: int = 32) -> DataFrame:
    """``C(i, j, v)`` = A @ B via dense tile pairs (exact int64).

    One tiling pass per side, tile join on the inner block index, one NumPy
    matmul per tile pair, explode nonzeros, sum per cell.
    """
    ta = _tile(a, "i", "k", block).select(
        F.col("br").alias("abr"), F.col("bc").alias("kb"), F.col("data").alias("ad")
    )
    tb = _tile(b, "k", "j", block).select(
        F.col("br").alias("kb"), F.col("bc").alias("bbc"), F.col("data").alias("bd")
    )
    joined = ta.join(tb, "kb")

    def mult(it):
        import numpy as np

        for pdf in it:
            outs = []
            for _, r in pdf.iterrows():
                am = np.asarray(r["ad"], dtype="int64").reshape(block, block)
                bm = np.asarray(r["bd"], dtype="int64").reshape(block, block)
                cm = am @ bm
                nz = np.nonzero(cm)
                if len(nz[0]) == 0:
                    continue
                outs.append(
                    pd.DataFrame(
                        {
                            "i": r["abr"] * block + nz[0],
                            "j": r["bbc"] * block + nz[1],
                            "v": cm[nz],
                        }
                    )
                )
            if outs:
                yield pd.concat(outs)

    partial = joined.mapInPandas(mult, "i long, j long, v long")
    return (
        partial.groupBy("i", "j").agg(F.sum("v").alias("v")).filter(F.col("v") != 0)
    )


def gram_matrix(emb: DataFrame, vec_col: str = "qvec") -> DataFrame:
    """Exact ``X^T X`` of an integer-vector column: upper-triangle cells
    ``(i, j, s)`` with ``s = sum over rows of v[i] * v[j]`` (BIGINT).

    The 100-TB shape for covariance/PCA/OLS-over-embeddings: each partition
    accumulates its LOCAL dense ``X^T X`` with one NumPy ``X.T @ X`` per
    Arrow batch (int64, exact), and only ``p * D*(D+1)/2`` partial cells
    ever reach the shuffle — driver and network traffic are independent of
    the row count. Quantize float embeddings first
    (operators/clustering.quantize_vectors) so the sums are
    order-independent integers; overflow bound: ``N * q_max^2 < 2^63``.
    Centering for covariance is a rank-1 correction from the (also exact)
    column sums — apply it driver-side from moment rows if needed.
    """
    d = int(emb.select(F.size(vec_col)).first()[0])

    def part(it):
        import numpy as np

        acc = np.zeros((d, d), dtype="int64")
        seen = False
        for pdf in it:
            if len(pdf) == 0:
                continue
            x = np.stack(pdf[vec_col].to_numpy()).astype("int64")
            acc += x.T @ x
            seen = True
        if seen:
            iu, ju = np.triu_indices(d)
            yield pd.DataFrame({"i": iu, "j": ju, "s": acc[iu, ju]})

    partials = emb.select(vec_col).mapInPandas(part, "i int, j int, s long")
    return partials.groupBy("i", "j").agg(F.sum("s").alias("s"))


def power_iteration(cells: list[tuple[int, int, int]], d: int, iters: int = 50):
    """Top eigenvector/eigenvalue of the symmetric matrix given as
    upper-triangle ``(i, j, s)`` cells — a driver-side micro-task (D x D),
    deterministic start (all-ones). Returns ``(eigenvalue, vector)``;
    verified against ``numpy.linalg.eigh`` in tests/test_linalg.py."""
    import numpy as np

    m = np.zeros((d, d), dtype="float64")
    for i, j, s in cells:
        m[i, j] = s
        m[j, i] = s
    v = np.ones(d) / (d ** 0.5)
    lam = 0.0
    for _ in range(iters):
        w = m @ v
        nrm = float(np.linalg.norm(w))
        if nrm == 0.0:
            return 0.0, v
        v = w / nrm
        lam = float(v @ m @ v)
    return lam, v


def randne_embedding(edges: DataFrame, d: int = 8) -> DataFrame:
    """RandNE-style graph embedding (Zhang et al. 2018, "Billion-scale
    Network Embedding via Iterative Random Projection" — public method):
    project the adjacency's neighborhood structure through a random matrix,
    ``E_k = A^k R``, instead of training — two sparse matmuls replace SGD.

    Here R is a hash-derived ±1 matrix (Knuth multiplicative over
    (vertex, dim) — no RNG), so E_1 = A R and E_2 = A^2 R are EXACT BIGINT
    via :func:`spmm_cells`: deterministic, repartition-stable, and
    SQL-replayable. Signs-only R is the standard sparse JL choice; callers
    normalize/concatenate hops downstream (kept integer here on purpose).

    Scale shape: two inner-index joins + grouped sums over (E * d) cells —
    the d-explode is the only amplification (d ~ 8-128), and each matmul
    shuffles on the inner index exactly once. Overflow: |E2| <= deg_max^2,
    fine below deg_max ~ 3e9 / sqrt(d).

    Returns ``(id, dim, e1, e2)`` — undirected adjacency, absent cells
    where both hops are zero.
    """
    und = edges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).where(F.col("a") != F.col("b")).dropDuplicates(["a", "b"])
    sym = und.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        und.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    verts = sym.select(F.col("src").alias("id")).distinct()
    sign = F.expr(
        "1 - 2 * (pmod((pmod(id * 2654435761, 4294967296) % 1000003 + j * 7919)"
        " * 2654435761, 4294967296) % 2)"
    )
    r = (
        verts.select("id", F.explode(F.expr(f"sequence(0, {int(d) - 1})")).alias("j"))
        .select(F.col("id").alias("k"), F.col("j"), sign.cast("long").alias("v"))
    )
    a_cells = sym.select(
        F.col("src").alias("i"), F.col("dst").alias("k"), F.lit(1).cast("long").alias("v")
    )
    e1 = spmm_cells(a_cells, r)
    e2 = spmm_cells(a_cells, e1.select(F.col("i").alias("k"), "j", "v"))
    j1 = e1.select(F.col("i").alias("id"), F.col("j").alias("dim"), F.col("v").alias("e1"))
    j2 = e2.select(F.col("i").alias("id"), F.col("j").alias("dim"), F.col("v").alias("e2"))
    return (
        j1.join(j2, ["id", "dim"], "full_outer")
        .select(
            "id",
            "dim",
            F.coalesce("e1", F.lit(0)).alias("e1"),
            F.coalesce("e2", F.lit(0)).alias("e2"),
        )
    )


def column_moments(emb: DataFrame, vec_col: str = "qvec") -> DataFrame:
    """Exact per-dimension column sums of an integer-vector column:
    ``(i, m)`` with ``m = sum over rows of v[i]`` (BIGINT). Same partial-
    aggregation shape as :func:`gram_matrix` — one NumPy colsum per Arrow
    batch, ``p * D`` partial rows reach the shuffle."""
    d = int(emb.select(F.size(vec_col)).first()[0])

    def part(it):
        import numpy as np

        acc = np.zeros(d, dtype="int64")
        seen = False
        for pdf in it:
            if len(pdf) == 0:
                continue
            acc += np.stack(pdf[vec_col].to_numpy()).astype("int64").sum(axis=0)
            seen = True
        if seen:
            yield pd.DataFrame({"i": range(d), "m": acc})

    partials = emb.select(vec_col).mapInPandas(part, "i int, m long")
    return partials.groupBy("i").agg(F.sum("m").alias("m"))


def pca_project(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "qvec",
    iters: int = 12,
) -> DataFrame:
    """First principal component of an integer-vector column, end to end:
    project every row onto the top eigenvector of the (scaled, exact)
    centered covariance ``C = N * X^T X - m m^T`` where ``m`` is the
    column-sum vector — the rank-1 centering correction applied in exact
    BIGINT arithmetic, never materializing centered rows.

    Physical split mirrors the 100-TB contract of :func:`gram_matrix`:
    the data-sized passes (Gram, column sums) are Arrow-batched NumPy
    partials with p * O(D^2) shuffle rows; the eigensolve is a D x D
    driver micro-task (:func:`power_iteration`, deterministic all-ones
    start, fixed ``iters`` so it is SQL-replayable); the projection is one
    codegen'd ``zip_with``/``aggregate`` scan with the eigenvector and
    ``m`` inlined as literals. Returns ``(id_col, pc1_milli)`` where
    ``pc1_milli = round(1000 * ((N x - m) . v) / N)`` — the centered
    first-PC coordinate in quantized units, milli-scaled BIGINT (milli,
    not micro: the two engines' float reorderings agree to ~1e-11, so a
    1e-3 grid leaves no boundary exposure; see the fiedler gate note).
    """
    gram = {(r["i"], r["j"]): r["s"] for r in gram_matrix(emb, vec_col).collect()}
    moms = {r["i"]: r["m"] for r in column_moments(emb, vec_col).collect()}
    n = emb.count()
    d = max(i for i, _ in gram) + 1
    cells = []
    for (i, j), s in gram.items():
        cells.append((i, j, n * s - moms[i] * moms[j]))
    _, v = power_iteration(cells, d, iters=iters)

    vlit = F.array(*[F.lit(float(x)) for x in v])
    mlit = F.array(*[F.lit(int(moms[i])) for i in range(d)])
    centered = F.zip_with(
        F.col(vec_col), mlit, lambda x, m: x * F.lit(int(n)) - m
    )
    score = F.aggregate(
        F.zip_with(centered, vlit, lambda c, w: c.cast("double") * w),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return emb.select(
        id_col,
        F.round(score / F.lit(float(n)) * 1000.0, 0).cast("long").alias("pc1_milli"),
    )


def effective_dim(gram: DataFrame) -> DataFrame:
    """Participation-ratio effective dimensionality of an (uncentered)
    second-moment matrix — ``PR = tr(C)^2 / ||C||_F^2`` (Gao et al. 2017
    neural-dimensionality literature; public methodology): bounded by the
    true rank, equal to D only when the spectrum is flat. With
    :func:`gram_matrix`'s exact upper-triangle BIGINT cells this is ONE
    aggregation: ``tr = sum of diagonal cells``, ``frob^2 = sum of
    c_ij^2`` with off-diagonal cells counted twice — squares in
    DECIMAL(38) (the bm25 rule), one double division micro-rounded.
    The spectral companion of the isotropy screen: collapse shows up as
    effdim << dim. Returns ``(dim, effdim_micro)``.
    """
    agg = gram.agg(
        F.max(F.col("i")).alias("maxi"),
        F.sum(F.when(F.col("i") == F.col("j"), F.col("s")).otherwise(0)).alias("tr"),
        F.expr(
            "SUM(CAST(s AS DECIMAL(38, 0)) * s"
            " * CASE WHEN i = j THEN 1 ELSE 2 END)"
        ).alias("f2"),
    )
    return agg.select(
        (F.col("maxi") + 1).cast("long").alias("dim"),
        F.expr(
            "CASE WHEN f2 > 0 THEN CAST(ROUND(CAST(tr AS DOUBLE) * CAST(tr AS DOUBLE)"
            " / CAST(f2 AS DOUBLE) * 1000000.0) AS BIGINT)"
            " ELSE CAST(0 AS BIGINT) END"
        ).alias("effdim_micro"),
    )
