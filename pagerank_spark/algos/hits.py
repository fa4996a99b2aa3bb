"""HITS (hubs & authorities) — the second classic link-analysis ranking,
built on the same gather/group-sum/normalize superstep family as PageRank
(SURVEY.md §2.1: scan -> gather -> group-sum -> divide -> scatter; the
reference hard-wires that pipeline for PageRank, pagerank.v:1039-1095 —
HITS is the same dataflow with the gather direction alternating per
half-step and an L2 normalizer in place of the damping blend).

Per iteration (Kleinberg's mutual-reinforcement recurrence):

    auth_k(v) = sum over in-edges (u,v) of hub_{k-1}(u),   then / ||auth_k||_2
    hub_k(u)  = sum over out-edges (u,v) of auth_k(v),     then / ||hub_k||_2

Key plan identity: HITS is scale-invariant — the normalized iterate
``a_k ∝ (AᵀA)^{k-1} Aᵀ h_0`` does not depend on WHEN you rescale, because
scaling commutes through the linear gather maps. So the hot loop iterates
UNNORMALIZED (no per-half-step norm scalars, whose double reference of the
gather subtree is what explodes the lazy block plan — each norm is a one-row
aggregate OVER the frame it divides) and normalizes exactly once per
``check_every`` block at materialization time. Growth per unnormalized
iteration is bounded by λ(AᵀA) ≤ maxdeg², far inside double range for any
practical block length.

Shuffle discipline (the 100-TB story), mirroring :mod:`.pagerank`:

  * edges are shuffled TWICE at setup — one layout hash-partitioned by
    ``src`` (for the hub->auth gather) and one by ``dst`` (for the
    auth->hub gather) — then localCheckpointed; no per-iteration edge
    shuffle. State stays hash-partitioned by ``id``, so each gather join is
    co-partitioned (SHJ hint, no sort) and only the per-edge contributions
    move each half-step.
  * the two L2 normalizers run once per block over the about-to-materialize
    state, landing in the plan as one-row broadcasts (in-plan scalars —
    never a driver action), exactly like PageRank's dangling-mass scalar.
  * iteration state is the narrow ``(id, auth, hub)``; the state is
    referenced twice per superstep (the two gathers), so the lazy block
    plan is 2^block copies — truncated by a lazy ``localCheckpoint`` whose
    single action is the block's L1 convergence aggregate (computed between
    consecutive MATERIALIZED normalized states, both plan leaves).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class HitsResult:
    scores: DataFrame         # (id long, auth double, hub double)
    iterations: int
    converged: bool
    l1_history: list = field(default_factory=list)


def _num_partitions(df: DataFrame) -> int:
    return df.sparkSession.sparkContext.defaultParallelism


def _superstep(edges_src: DataFrame, edges_dst: DataFrame, state: DataFrame,
               vertices: DataFrame) -> DataFrame:
    """One lazy UNNORMALIZED iteration: auth gathered from the previous
    hub iterate, hub gathered from the just-computed auth (Kleinberg's
    ordering). The state is referenced exactly twice (once per gather)."""
    ra = (
        edges_src.join(state.hint("shuffle_hash"), edges_src.src == state.id, "inner")
        .groupBy("dst")
        .agg(F.sum(F.col("hub")).alias("__sa"))
    )
    auth_un = (
        vertices.join(ra.hint("shuffle_hash"), vertices.id == ra.dst, "left")
        .select(vertices.id, F.coalesce(F.col("__sa"), F.lit(0.0)).alias("auth"))
    )
    rh = (
        edges_dst.join(auth_un.hint("shuffle_hash"), edges_dst.dst == auth_un.id, "inner")
        .groupBy("src")
        .agg(F.sum(F.col("auth")).alias("__sh"))
    )
    return (
        auth_un.join(rh.hint("shuffle_hash"), auth_un.id == rh.src, "left")
        .select(
            auth_un.id,
            "auth",
            F.coalesce(F.col("__sh"), F.lit(0.0)).alias("hub"),
        )
    )


def _normalized(state: DataFrame) -> DataFrame:
    """Divide auth and hub by their L2 norms — two lazy one-row aggregates
    (in-plan broadcast scalars). greatest(eps) guards the degenerate
    all-zero direction (e.g. a graph whose every edge is a self-sink)."""
    norms = state.agg(
        F.greatest(F.sqrt(F.sum(F.col("auth") * F.col("auth"))), F.lit(1e-300)).alias("__na"),
        F.greatest(F.sqrt(F.sum(F.col("hub") * F.col("hub"))), F.lit(1e-300)).alias("__nh"),
    )
    return state.crossJoin(F.broadcast(norms)).select(
        "id",
        (F.col("auth") / F.col("__na")).alias("auth"),
        (F.col("hub") / F.col("__nh")).alias("hub"),
    )


def hits(
    edges: DataFrame,
    max_iters: int = 20,
    tol: float = 1e-9,
    num_partitions: int | None = None,
    check_every: int = 2,
) -> HitsResult:
    """Run HITS until the L1 delta between consecutive materialized
    normalized states falls below ``tol`` (with ``check_every=1`` that is
    the per-iteration L1 exactly) or ``max_iters``. ``edges`` is a
    ``(src, dst)`` DataFrame; duplicate edges add multiplicity (matching
    the SQL oracle)."""
    t_start = time.monotonic()
    p = num_partitions or max(4, _num_partitions(edges))

    e = edges.select("src", "dst")
    vertices = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .dropDuplicates()
        .repartition(p, "id")
        .localCheckpoint()
    )
    n = vertices.count()
    if n == 0:
        raise ValueError("hits requires a non-empty edge set")
    # two one-time edge layouts, one per gather direction
    edges_src = e.repartition(p, "src").localCheckpoint()
    edges_dst = e.repartition(p, "dst").localCheckpoint()

    # uniform positive hub init; any positive constant yields the same
    # normalized iterates (scale invariance), 1/V keeps magnitudes tame
    state = vertices.select(
        "id", F.lit(0.0).alias("auth"), F.lit(1.0 / n).alias("hub")
    ).localCheckpoint(eager=False)
    state.count()

    result = HitsResult(scores=state, iterations=0, converged=False)
    it = 0
    while it < max_iters:
        block = min(check_every, max_iters - it)
        new_state = state
        intermediates = []
        for i in range(block):
            new_state = _superstep(edges_src, edges_dst, new_state, vertices)
            if i < block - 1:
                # lazy persist: consumed by both of the next superstep's
                # gathers — uncached, the block's single job would recompute
                # the subtree per consumer
                new_state = new_state.persist()
                intermediates.append(new_state)
        # one normalization per block, then truncate the 2^block lazy plan
        new_state = _normalized(new_state).localCheckpoint(eager=False)
        # the block's ONE action: L1 between consecutive materialized
        # normalized states (both leaves — the join is cache-to-cache)
        prev = state.select("id", F.col("auth").alias("__pa"), F.col("hub").alias("__ph"))
        row = (
            new_state.join(prev.hint("shuffle_hash"), "id")
            .agg(
                F.sum(
                    F.abs(F.col("auth") - F.col("__pa")) + F.abs(F.col("hub") - F.col("__ph"))
                ).alias("l1")
            )
            .first()
        )
        l1 = float(row["l1"])
        for df in intermediates:
            df.unpersist()
        state = new_state
        it += block
        result.l1_history.append(l1)
        result.iterations = it
        if l1 < tol:
            result.converged = True
            break

    result.scores = state.select("id", "auth", "hub")
    result.iter_seconds = time.monotonic() - t_start  # type: ignore[attr-defined]
    return result


@dataclass
class SalsaResult:
    scores: DataFrame         # (id long, auth double, hub double)
    iterations: int
    converged: bool
    l1_history: list = field(default_factory=list)


def salsa(
    edges: DataFrame,
    max_iters: int = 20,
    tol: float = 1e-9,
    num_partitions: int | None = None,
    check_every: int = 2,
) -> SalsaResult:
    """SALSA (Lempel & Moran 2001, the Stochastic Approach for Link
    Structure Analysis — the link-analysis ranking behind
    who-to-follow-style recommenders): HITS's mutual reinforcement with
    DEGREE-NORMALIZED gathers, i.e. alternating steps of the random walk
    on the hub/authority bipartite view::

        auth_k(v) = sum over in-edges (u,v) of hub_{k-1}(u) / outdeg(u)
        hub_k(u)  = sum over out-edges (u,v) of auth_k(v) / indeg(v)

    Both half-steps apply a column-stochastic matrix, so TOTAL MASS IS
    PRESERVED exactly — unlike HITS there is no per-block normalizer
    (no one-row aggregate in the plan at all): init hub = 1/|hubs| over
    the outdeg>0 vertices and every iterate stays a probability vector.

    Shuffle discipline mirrors :func:`hits`: two one-time edge layouts
    (by src / by dst), each carrying its STATIC integer degree column so
    the per-edge contribution is the same correctly-rounded ``score / deg``
    division the SQL oracle performs (never ``score * (1/deg)`` — a
    different IEEE op); state is narrow ``(id, hub)`` over hub vertices
    only, referenced twice per superstep, truncated per block by a lazy
    localCheckpoint whose single action is the block L1.

    Every hub has an out-edge and every out-neighbor has an in-edge, so
    both gathers are inner joins with no dangling-coalesce leg.
    """
    t_start = time.monotonic()
    p = num_partitions or max(4, _num_partitions(edges))
    e = edges.select("src", "dst")
    od = e.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    idg = e.groupBy("dst").agg(F.count(F.lit(1)).alias("idg"))
    edges_src = (
        e.join(od, "src").select("src", "dst", "od").repartition(p, "src").localCheckpoint()
    )
    edges_dst = (
        e.join(idg, "dst").select("src", "dst", "idg").repartition(p, "dst").localCheckpoint()
    )
    hubs = od.select("src").repartition(p, "src").localCheckpoint()
    n_h = hubs.count()
    if n_h == 0:
        raise ValueError("salsa requires a non-empty edge set")

    state = hubs.select(F.col("src").alias("id"), F.lit(1.0 / n_h).alias("hub")).localCheckpoint(
        eager=False
    )
    state.count()

    def _superstep(st: DataFrame) -> tuple:
        a = (
            edges_src.join(st.hint("shuffle_hash"), edges_src.src == st.id, "inner")
            .groupBy("dst")
            .agg(F.sum(F.col("hub") / F.col("od")).alias("auth"))
        )
        h = (
            edges_dst.join(a.hint("shuffle_hash"), "dst", "inner")
            .groupBy("src")
            .agg(F.sum(F.col("auth") / F.col("idg")).alias("hub"))
            .select(F.col("src").alias("id"), "hub")
        )
        return a, h

    result = SalsaResult(scores=state, iterations=0, converged=False)
    it = 0
    auth = None
    prev_auth = None
    while it < max_iters:
        block = min(check_every, max_iters - it)
        new_state = state
        intermediates = []
        for i in range(block):
            auth, new_state = _superstep(new_state)
            if i == block - 1:
                # the block-final auth is part of the returned scores:
                # persist it so the block's L1 action materializes it ONCE
                # (a lazy recompute after intermediates unpersist would
                # re-run the double gather with a fresh reduction order)
                auth = auth.persist()
            else:
                new_state = new_state.persist()
                intermediates.append(new_state)
        new_state = new_state.localCheckpoint(eager=False)
        prev = state.select("id", F.col("hub").alias("__ph"))
        row = (
            new_state.join(prev.hint("shuffle_hash"), "id")
            .agg(F.sum(F.abs(F.col("hub") - F.col("__ph"))).alias("l1"))
            .first()
        )
        l1 = float(row["l1"])
        for df in intermediates:
            df.unpersist()
        if prev_auth is not None:
            prev_auth.unpersist()
        prev_auth = auth
        state = new_state
        it += block
        result.l1_history.append(l1)
        result.iterations = it
        if l1 < tol:
            result.converged = True
            break

    # final scores: the block-final auth iterate (persisted — materialized
    # by its block's L1 action) full-outer'd with the final hub vector
    scores = (
        auth.select(F.col("dst").alias("id"), "auth")
        .join(state, "id", "full_outer")
        .select(
            "id",
            F.coalesce("auth", F.lit(0.0)).alias("auth"),
            F.coalesce("hub", F.lit(0.0)).alias("hub"),
        )
    )
    result.scores = scores
    result.iter_seconds = time.monotonic() - t_start  # type: ignore[attr-defined]
    return result


def birank(
    edges: DataFrame,
    u_col: str = "u",
    p_col: str = "p",
    weight_col: str | None = None,
    alpha: float = 0.85,
    iters: int = 3,
    num_partitions: int | None = None,
) -> DataFrame:
    """BiRank (He, Gao, Kan & Wang 2017, TKDE — public methodology): joint
    ranking of the two sides of a bipartite graph (users x items,
    customers x parts, queries x docs) under the symmetrically normalized
    mutual-reinforcement recurrence

        p_k = alpha * W_n^T u_{k-1} + (1-alpha) * p_0
        u_k = alpha * W_n   p_{k-1} + (1-alpha) * u_0

    with ``W_n[u,p] = w / (sqrt(deg_w(u)) * sqrt(deg_w(p)))`` and uniform
    teleports — the bipartite sibling of damped PageRank (same kernel
    family as the reference's rank-propagation core; SQRT is a
    correctly-rounded IEEE op, so the per-edge coefficient is
    engine-stable). Updates are Jacobi (both sides from the previous
    iterate), which keeps the unrolled SQL oracle a flat CTE chain.

    Shuffle discipline mirrors :func:`salsa`: the normalized coefficient
    is STATIC per edge (computed once, two one-time layouts keyed by each
    side, localCheckpointed); per iteration only the two gather shuffles
    move, each co-partitioned with its state (SHJ hint). Every vertex has
    an edge by construction, so both gathers are inner joins.

    Returns ``(side, id, rank)`` with side 'u'/'p' and rank the raw
    double; callers round for emission.
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    beta = 1.0 - float(alpha)
    w = (
        F.col(weight_col).cast("double")
        if weight_col
        else F.lit(1.0)
    )
    par = num_partitions or max(4, _num_partitions(edges))
    e0 = edges.select(
        F.col(u_col).alias("u"), F.col(p_col).alias("p"), w.alias("w")
    )
    du = e0.groupBy("u").agg(F.sum("w").alias("du"))
    dp = e0.groupBy("p").agg(F.sum("w").alias("dp"))
    en = (
        e0.join(du, "u")
        .join(dp, "p")
        .select(
            "u",
            "p",
            (
                F.col("w")
                / (F.sqrt(F.col("du").cast("double")) * F.sqrt(F.col("dp").cast("double")))
            ).alias("wn"),
        )
    )
    en_u = en.repartition(par, "u").localCheckpoint()
    en_p = en.repartition(par, "p").localCheckpoint()
    n_u = du.count()
    n_p = dp.count()
    if n_u == 0 or n_p == 0:
        raise ValueError("birank requires a non-empty edge set")
    u0v, p0v = 1.0 / n_u, 1.0 / n_p
    su = du.select(F.col("u").alias("id"), F.lit(u0v).alias("r")).repartition(par, "id").localCheckpoint()
    sp = dp.select(F.col("p").alias("id"), F.lit(p0v).alias("r")).repartition(par, "id").localCheckpoint()
    for _ in range(int(iters)):
        sp_next = (
            en_u.join(su.hint("shuffle_hash"), en_u.u == su.id, "inner")
            .groupBy("p")
            .agg(
                (
                    F.lit(float(alpha)) * F.sum(F.col("wn") * F.col("r"))
                    + F.lit(beta) * F.lit(p0v)
                ).alias("r")
            )
            .select(F.col("p").alias("id"), "r")
        )
        su_next = (
            en_p.join(sp.hint("shuffle_hash"), en_p.p == sp.id, "inner")
            .groupBy("u")
            .agg(
                (
                    F.lit(float(alpha)) * F.sum(F.col("wn") * F.col("r"))
                    + F.lit(beta) * F.lit(u0v)
                ).alias("r")
            )
            .select(F.col("u").alias("id"), "r")
        )
        su, sp = su_next.localCheckpoint(), sp_next.localCheckpoint()
    return su.select(F.lit("u").alias("side"), "id", "r").unionByName(
        sp.select(F.lit("p").alias("side"), "id", "r")
    )
