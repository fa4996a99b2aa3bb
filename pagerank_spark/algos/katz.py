"""Katz centrality — attenuated path-count centrality, the third classic of
the gather/group-sum/apply superstep family (with :mod:`.pagerank` and
:mod:`.hits`; the reference's hard-wired pipeline, pagerank.v:1039-1095,
generalizes to any x' = f(A^T x) recurrence).

    x_{k+1}(v) = beta + alpha * sum over in-edges (u, v) of x_k(u)

(no degree normalization — unlike PageRank, a vertex's influence is not
diluted across its out-edges; alpha < 1/lambda_max(A) for convergence, the
caller's contract). The state is referenced ONCE per superstep (single
gather), so lazy-checkpoint blocks grow linearly and longer ``check_every``
chains are safe.

Shuffle discipline: edges shuffled once by src (co-partitioned SHJ gather
join per superstep, only per-edge contributions move); the L1 convergence
aggregate is the block's single materialization action.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .pagerank import _num_partitions


@dataclass
class KatzResult:
    scores: DataFrame         # (id long, katz double)
    iterations: int
    converged: bool
    l1_history: list = field(default_factory=list)


def katz(
    edges: DataFrame,
    alpha: float = 0.05,
    beta: float = 1.0,
    max_iters: int = 20,
    tol: float = 1e-9,
    num_partitions: int | None = None,
    check_every: int = 3,
) -> KatzResult:
    """Iterate Katz centrality from ``x_0 = beta`` until the L1 delta
    between consecutive materialized states falls below ``tol`` or
    ``max_iters``. ``edges`` is ``(src, dst)``; duplicate edges add
    multiplicity (matching the SQL oracle)."""
    t_start = time.monotonic()
    p = num_partitions or max(4, _num_partitions(edges))

    e = edges.select("src", "dst").repartition(p, "src").localCheckpoint()
    vertices = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .dropDuplicates()
        .repartition(p, "id")
        .localCheckpoint()
    )
    if not vertices.take(1):
        raise ValueError("katz requires a non-empty edge set")

    state = vertices.select("id", F.lit(float(beta)).alias("katz")).localCheckpoint(eager=False)
    state.count()

    result = KatzResult(scores=state, iterations=0, converged=False)
    it = 0
    while it < max_iters:
        block = min(check_every, max_iters - it)
        new_state = state
        for _ in range(block):
            gathered = (
                e.join(new_state.hint("shuffle_hash"), e.src == new_state.id, "inner")
                .groupBy("dst")
                .agg(F.sum("katz").alias("__s"))
            )
            new_state = (
                vertices.join(gathered.hint("shuffle_hash"), vertices.id == gathered.dst, "left")
                .select(
                    vertices.id,
                    (F.lit(float(beta)) + F.lit(float(alpha)) * F.coalesce(F.col("__s"), F.lit(0.0))).alias("katz"),
                )
            )
        new_state = new_state.localCheckpoint(eager=False)
        prev = state.select("id", F.col("katz").alias("__p"))
        row = (
            new_state.join(prev.hint("shuffle_hash"), "id")
            .agg(F.sum(F.abs(F.col("katz") - F.col("__p"))).alias("l1"))
            .first()
        )
        l1 = float(row["l1"])
        state = new_state
        it += block
        result.l1_history.append(l1)
        result.iterations = it
        if l1 < tol:
            result.converged = True
            break

    result.scores = state.select("id", "katz")
    result.iter_seconds = time.monotonic() - t_start  # type: ignore[attr-defined]
    return result


@dataclass
class EigenvectorResult:
    scores: DataFrame         # (id long, eig double) — L2-normalized
    iterations: int
    converged: bool
    l1_history: list = field(default_factory=list)


def eigenvector_centrality(
    edges: DataFrame,
    max_iters: int = 20,
    tol: float = 1e-9,
    num_partitions: int | None = None,
    check_every: int = 3,
) -> EigenvectorResult:
    """Eigenvector centrality by power iteration: ``x' = A^T x`` (in-edge
    gather sum), ``x_0 = 1``, converged when the L1 delta of consecutive
    L2-NORMALIZED states falls below ``tol``.

    Same superstep shape as :func:`katz` (single gather, state referenced
    once). Scale invariance means the iteration can run UNNORMALIZED inside
    a block — only the per-block materialization divides by the L2 norm,
    which both bounds double-precision growth (norm grows ~lambda_max per
    step, so blocks of ``check_every`` steps stay far from overflow for any
    real degree distribution) and makes the convergence metric well-defined.
    Vertices unreachable from any cycle decay to 0 — the standard
    eigenvector-centrality semantics on directed graphs.
    """
    t_start = time.monotonic()
    p = num_partitions or max(4, _num_partitions(edges))

    e = edges.select("src", "dst").repartition(p, "src").localCheckpoint()
    vertices = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .dropDuplicates()
        .repartition(p, "id")
        .localCheckpoint()
    )
    if not vertices.take(1):
        raise ValueError("eigenvector_centrality requires a non-empty edge set")

    state = vertices.select("id", F.lit(1.0).alias("eig")).localCheckpoint(eager=False)
    state.count()

    result = EigenvectorResult(scores=state, iterations=0, converged=False)
    it = 0
    while it < max_iters:
        block = min(check_every, max_iters - it)
        new_state = state
        for _ in range(block):
            gathered = (
                e.join(new_state.hint("shuffle_hash"), e.src == new_state.id, "inner")
                .groupBy("dst")
                .agg(F.sum("eig").alias("__s"))
            )
            new_state = (
                vertices.join(gathered.hint("shuffle_hash"), vertices.id == gathered.dst, "left")
                .select(vertices.id, F.coalesce(F.col("__s"), F.lit(0.0)).alias("eig"))
            )
        new_state = new_state.localCheckpoint(eager=False)
        n2 = float(new_state.agg(F.sqrt(F.sum(F.col("eig") * F.col("eig"))).alias("n")).first()["n"])
        if n2 == 0.0:
            # the iterate died (pure DAG k steps deep): zeros IS the limit
            result.scores = new_state.select("id", "eig")
            result.iterations = it + block
            result.converged = True
            result.l1_history.append(0.0)
            result.iter_seconds = time.monotonic() - t_start  # type: ignore[attr-defined]
            return result
        normed = new_state.select("id", (F.col("eig") / F.lit(n2)).alias("eig")).localCheckpoint(eager=False)
        prev = state.select("id", F.col("eig").alias("__p"))
        row = (
            normed.join(prev.hint("shuffle_hash"), "id")
            .agg(F.sum(F.abs(F.col("eig") - F.col("__p"))).alias("l1"))
            .first()
        )
        l1 = float(row["l1"])
        state = normed
        it += block
        result.l1_history.append(l1)
        result.iterations = it
        if l1 < tol:
            result.converged = True
            break

    result.scores = state.select("id", "eig")
    result.iter_seconds = time.monotonic() - t_start  # type: ignore[attr-defined]
    return result
