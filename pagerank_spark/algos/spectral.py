"""Fiedler vector by deflated power iteration on the normalized adjacency —
the spectral-bisection primitive (Fiedler 1973; Shi & Malik 2000 normalized
cuts). The sign pattern of the second eigenvector of the normalized
Laplacian ``L = I - D^{-1/2} A D^{-1/2}`` is the classic two-way graph
partition; its value orders vertices along the graph's slowest-mixing
direction.

Reference framing: the accelerator's kernel is one damped rank gather
(reference ``pagerank.v``: gather -> scale -> write-back). This operator is
the SAME superstep shape applied to a different matrix: power iteration on
``M = (I + N)/2`` where ``N = D^{-1/2} A D^{-1/2}`` (the half-shift maps
N's spectrum [-1, 1] onto [0, 1] so the iteration converges to the TOP of
the spectrum regardless of bipartite-ness), with the known top eigenvector
``u = sqrt(deg)`` (eigenvalue 1) deflated out each step:

    s(v)  = sum over undirected neighbors u of  x(u) / sqrt(d(u) d(v))
    y     = (x + s) / 2                      -- one gather + one projection
    c     = (u . y) / (u . u) = sum(sqrt(d_v) y_v) / sum(d_v)
    x'    = y - c * sqrt(d)                  -- deflation (keeps x ⟂ u)

Every step is LINEAR, so the iterate is normalized only once at the end
(the eigenvector-centrality scale-invariance argument,
``katz.py:eigenvector_centrality``). The deterministic hash init makes the
whole computation an exact function of (graph, iters): SQL-replayable, no
RNG. On a disconnected graph the eigenvalue-1 eigenspace has one ``sqrt(d)``
vector per component and single-vector deflation leaves the cross-component
balance in play — the iterate then converges toward the dominant remaining
direction, which is still a deterministic, replayable quantity (and the
usual "split the biggest components apart" signal).

Scale shape: the undirected edge list is shuffled ONCE by src with the
static per-edge coefficient ``1/sqrt(d(u) d(v))`` attached (same one-time
edge-layout amortization as ``pagerank.py``); each superstep is one
co-partitioned hash join + grouped sum + two 1-row aggregates that stay
IN-PLAN via cross-join (no extra actions); state is narrow ``(id, x)``;
blocks of ``check_every`` steps are lineage-truncated with eager
localCheckpoint.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .pagerank import _num_partitions

# LCG constants (Numerical Recipes); ids pre-modded to 2^20 so the Knuth
# multiply stays far below the BIGINT overflow ANSI mode hard-errors on.
_LCG_A = 1103515245
_LCG_C = 12345
_LCG_M = 2147483648  # 2^31
_ID_MOD = 1048576  # 2^20


def hash_init_expr(id_col: str = "id") -> str:
    """Deterministic balanced init in [-0.5, 0.5): identical integer
    arithmetic on Spark and DuckDB (positive operands, exact BIGINT)."""
    return (
        f"CAST((({id_col} % {_ID_MOD}) * {_LCG_A} + {_LCG_C}) % {_LCG_M} AS DOUBLE)"
        f" / {_LCG_M} - 0.5"
    )


@dataclass
class FiedlerResult:
    scores: DataFrame  # (id long, fiedler double) — L2-normalized iterate
    iterations: int
    converged: bool
    l1_history: list = field(default_factory=list)


def fiedler_vector(
    edges: DataFrame,
    max_iters: int = 12,
    tol: float = 0.0,
    num_partitions: int | None = None,
    check_every: int = 4,
) -> FiedlerResult:
    """Deflated power iteration for the Fiedler vector over a directed edge
    list treated as an undirected simple graph (canonicalized, self-loops
    dropped). ``tol=0`` runs exactly ``max_iters`` steps (the SQL-replayable
    mode the oracle gate uses); ``tol>0`` stops when the L1 delta of
    consecutive end-normalized iterates falls below it.
    """
    t_start = time.monotonic()
    p = num_partitions or max(4, _num_partitions(edges))

    und = (
        edges.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates()
    )
    adj = und.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        und.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    deg = adj.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("deg"))
    # one-time edge layout: per-edge static coefficient 1/sqrt(d(src) d(dst)),
    # shuffled once by src — every superstep reuses this partitioning
    e = (
        adj.join(deg.withColumnRenamed("id", "src"), "src")
        .withColumnRenamed("deg", "dsrc")
        .join(
            deg.select(F.col("id").alias("dst"), F.col("deg").alias("ddst")),
            "dst",
        )
        .select(
            "src",
            "dst",
            (F.lit(1.0) / F.sqrt(F.col("dsrc") * F.col("ddst"))).alias("coef"),
        )
        .repartition(p, "src")
        .localCheckpoint()
    )
    verts = deg.select("id", F.sqrt(F.col("deg")).alias("sd")).repartition(p, "id").localCheckpoint()
    # exact integer degree total (NOT sum(sd^2), which is 1-ulp off) so the
    # deflation divisor is bit-identical to a SQL SUM(deg) replay
    row = deg.agg(F.sum("deg").alias("dtot")).first()
    if row is None or row["dtot"] is None:
        raise ValueError("fiedler_vector requires a non-empty edge set")
    d_tot = float(row["dtot"])

    state = verts.select("id", "sd", F.expr(hash_init_expr("id")).alias("x")).localCheckpoint()

    result = FiedlerResult(scores=state, iterations=0, converged=False)
    prev_norm: DataFrame | None = None
    it = 0
    while it < max_iters:
        block = min(check_every, max_iters - it)
        new_state = state
        for _ in range(block):
            gathered = (
                e.join(
                    new_state.select(F.col("id").alias("src"), "x").hint("shuffle_hash"),
                    "src",
                )
                .groupBy(F.col("dst").alias("id"))
                .agg(F.sum(F.col("coef") * F.col("x")).alias("s"))
            )
            y = (
                new_state.join(gathered.hint("shuffle_hash"), "id", "left")
                .select(
                    "id",
                    "sd",
                    ((F.col("x") + F.coalesce(F.col("s"), F.lit(0.0))) / 2.0).alias("y"),
                )
            )
            # deflation coefficient stays in-plan: 1-row aggregate cross-joined
            c = y.agg((F.sum(F.col("sd") * F.col("y")) / F.lit(d_tot)).alias("c"))
            new_state = y.crossJoin(F.broadcast(c)).select(
                "id", "sd", (F.col("y") - F.col("c") * F.col("sd")).alias("x")
            )
        state = new_state.localCheckpoint()
        it += block
        if tol > 0.0:
            n2 = float(
                state.agg(F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("n")).first()["n"]
            )
            if n2 == 0.0:
                result.converged = True
                break
            norm = state.select("id", (F.col("x") / F.lit(n2)).alias("x")).localCheckpoint(
                eager=False
            )
            if prev_norm is not None:
                l1 = float(
                    norm.join(prev_norm.withColumnRenamed("x", "px"), "id")
                    .agg(F.sum(F.abs(F.col("x") - F.col("px"))).alias("l1"))
                    .first()["l1"]
                )
                result.l1_history.append(l1)
                if l1 < tol:
                    result.converged = True
                    prev_norm = norm
                    break
            prev_norm = norm

    n2 = float(state.agg(F.sqrt(F.sum(F.col("x") * F.col("x"))).alias("n")).first()["n"])
    scale = 1.0 / n2 if n2 > 0.0 else 0.0
    result.scores = state.select("id", (F.col("x") * F.lit(scale)).alias("fiedler"))
    result.iterations = it
    result.iter_seconds = time.monotonic() - t_start  # type: ignore[attr-defined]
    return result
