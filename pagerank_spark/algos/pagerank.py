"""PageRank — the reference's one hard-wired query, re-expressed Spark-first.

The reference pipeline (SURVEY.md §2.1) is scan -> gather -> group-sum ->
divide -> scatter, iterated a fixed number of rounds:

  - random gather by vertex id (pagerank.v:1079-1095)  -> equi-join on src
  - grouped running sum (pagerank.v:1039-1049)         -> groupBy(dst).sum
  - divide by out-degree (pagerank.v:468-484)          -> column expression
  - double-buffer swap (pagerank.v:1121-1127)          -> DataFrame k -> k+1
  - init-round shortcut (pagerank.v:1042-1046)         -> uniform-prior lit

Two numeric modes:

- :func:`pagerank` — production: damped (d=0.85), dangling-mass
  redistribution, L1 < tol stopping rule (BASELINE.json.north_rule). Doubles.
- :func:`pagerank_fixed_point` — golden: bit-exact reference recurrence
  (SURVEY.md §2a), Q48.16 int64 floor arithmetic, fixed rounds, no damping.
  Only valid for V <= 65536 (the reference's fixed-point math degenerates to
  zero above 2^16 vertices).

Shuffle discipline (the 100-TB story):
  * ``edges`` are hash-repartitioned by ``src`` ONCE, with the static
    per-edge gather coefficient attached, then persisted; every iteration's
    gather-join reuses that layout (Catalyst sees matching hashpartitioning
    on both sides — no per-iteration edge shuffle).
  * the dangling mass is a one-row aggregate over the ``dang``-flagged
    slice of the cached state — a lazy in-plan scalar (broadcast of one
    row), never a driver action and never a scan of the E-sized edge
    layout; degree information never re-joins in the hot loop.
  * iteration state is just ``(id, rank, prev_rank[, dang])`` — degrees
    live on the edges, so the per-superstep state is as narrow as the
    reference's rank array (pagerank.v:98-99).
  * ranks come out of the previous iteration hash-partitioned by id (output
    of the groupBy/join), so only the per-edge contributions shuffle each
    superstep — the communication inherent to PageRank.
  * per-iteration partial aggregation (map-side combine) is what Spark's
    HashAggregate does automatically; the CSR kernel mode additionally
    pre-aggregates inside Arrow before the shuffle.
  * exactly ONE Spark action per materialized block: the L1 delta over the
    persisted new state.
"""

from __future__ import annotations

import threading
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.degrees import degree_table
from .csr_kernel import bucketize_edges, csr_contributions


@dataclass
class PageRankResult:
    ranks: DataFrame          # (id long, rank double|long)
    iterations: int
    converged: bool
    l1_history: list = field(default_factory=list)
    metrics: list = field(default_factory=list)  # per-iteration dict rows
    setup_seconds: float = 0.0   # degree build + edge shuffle + init state
    iter_seconds: float = 0.0    # superstep loop only (steady-state)


def _num_partitions(df: DataFrame) -> int:
    return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))


def prepare_edges(
    edges: DataFrame, deg: DataFrame, p: int, mode: str, weight_col: str | None = None,
) -> DataFrame:
    """One-time edge layout for the superstep loop (built once, persisted by
    the caller, reused every iteration — the CSR-build analogue).

    Emits ``(src, dst, coef)``: the static per-edge gather coefficient
    ``coef = w / total_out_weight(src)`` (``1.0 / out_degree`` unweighted),
    so the hot loop never joins the degree table and the per-edge
    contribution is one multiply, ``rank * coef`` — 8 bytes of edge
    attribute instead of two, which matters when E >> V and the layout is
    scanned every superstep. Dangling vertices contribute no edge rows; the
    dangling-mass scalar comes from the static ``dang`` flag carried on the
    iteration state (see :func:`_superstep`), so the layout holds real
    edges only. Weights, when given, must be strictly positive.
    """
    if weight_col is None:
        # dangling rows are filtered BEFORE the 1/out_degree projection:
        # they never match a real edge, and ANSI mode would error on 1/0
        e = edges.select("src", "dst").join(
            deg.filter(F.col("out_degree") > 0).select(
                F.col("id").alias("src"),
                (F.lit(1.0) / F.col("out_degree")).alias("coef"),
            ),
            "src",
        )
    else:
        ew = edges.select("src", "dst", F.col(weight_col).cast("double").alias("w"))
        # the documented precondition, enforced: a zero/negative/null/NaN
        # weight silently corrupts coef (wout can be <= 0). One cheap
        # column-pruned agg during setup — the layout build scans edges
        # anyway, and this runs once per pagerank() call, never in the loop.
        badrow = ew.agg(
            F.sum(
                F.when(F.col("w").isNull() | F.isnan("w") | (F.col("w") <= 0), 1).otherwise(0)
            ).alias("bad")
        ).first()
        if int(badrow["bad"] or 0) > 0:
            raise ValueError(
                f"weight column {weight_col!r} must be strictly positive and non-null; "
                f"{int(badrow['bad'])} offending edge(s)"
            )
        wdeg = ew.groupBy("src").agg(F.sum("w").alias("wout"))
        e = ew.join(wdeg, "src").select("src", "dst", (F.col("w") / F.col("wout")).alias("coef"))
    e = e.select("src", "dst", "coef")
    if mode == "csr":
        return bucketize_edges(e, p)
    return e.repartition(p, "src")


def _superstep(
    edges_p: DataFrame, state: DataFrame, mode: str, p: int,
    damping: float, base: float, n: int, has_dangling: bool,
    personalized: bool = False, float32_shuffle: bool = False,
):
    """One lazy superstep: state k -> state k+1 (no action triggered).

    Supersteps chain lazily; the driver materializes only every
    ``check_every`` iterations. Dangling-mass exactness is per-iteration
    (the dangling sum is over state k, like the reference recurrence and
    the SQL oracle), not block-stale.

    Physical strategy: ``shuffle_hash`` hints on both joins. PageRank state
    is never broadcastable at the target scale, and SHJ avoids SMJ's
    per-iteration sorts; measured 2.3x over the unhinted plan at 5M edges
    (the planner otherwise picks broadcast/SMJ by size heuristics that are
    wrong for an iterated join). The dangling-mass scalar is an aggregate
    over the ``dang``-flagged slice of the (cached, narrow) state — one
    extra pass of the V-sized state cache, never a scan of the E-sized edge
    layout — landing in the plan as a one-row broadcast.
    """
    if mode == "csr":
        contribs = csr_contributions(edges_p, state, p)
    else:
        # float32_shuffle: per-edge products and the map-side partial sums
        # are FloatType, halving the contribution shuffle's value bytes —
        # the only per-superstep shuffle whose width the engine controls.
        # The reduce-side result is widened back to double. Costs ~1e-7
        # relative noise per superstep (see pagerank() docstring).
        term = F.col("rank") * F.col("coef")
        if float32_shuffle:
            agg = F.sum(term.cast("float")).cast("double").alias("contrib")
        else:
            agg = F.sum(term).alias("contrib")
        contribs = (
            edges_p.join(state.hint("shuffle_hash"), edges_p.src == state.id, "inner")
            .groupBy("dst")
            .agg(agg)
        )
    if personalized:
        # teleport lands on the seed distribution: (1-d)*t[v] + d*dm*t[v]
        new_rank = F.lit(1.0 - damping) * state.tele + F.lit(damping) * F.coalesce(
            F.col("contrib"), F.lit(0.0)
        )
    else:
        new_rank = F.lit(base) + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))
    out = state.join(contribs.hint("shuffle_hash"), state.id == contribs.dst, "left")
    if has_dangling:
        # dangling mass = rank sum over the dang-flagged state slice. The
        # flag is static (out_degree == 0 never changes), carried on the
        # narrow state, so this subtree is one pass of the cached V-sized
        # state — no join, no scan of the E-sized edge layout — and lands
        # in the plan as a one-row broadcast, keeping the block lazy (one
        # action per block). Exactness is per-iteration: the sum is over
        # state k, like the reference recurrence and the SQL oracle.
        dm = state.filter(F.col("dang")).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("__dm")
        )
        out = out.crossJoin(dm)
        if personalized:
            new_rank = new_rank + F.lit(damping) * F.col("__dm") * state.tele
        else:
            new_rank = new_rank + F.lit(damping) * F.col("__dm") / F.lit(float(n))
    cols = [state.id, new_rank.alias("rank"), state.rank.alias("prev_rank")]
    if has_dangling:
        cols.append(state.dang)
    if personalized:
        cols.append(state.tele)
    return out.select(*cols)


def pagerank(
    edges: DataFrame,
    vertices: DataFrame | None = None,
    damping: float = 0.85,
    tol: float = 1e-9,
    max_iters: int = 100,
    mode: str = "join",
    checkpointer=None,
    check_every: int = 1,
    num_partitions: int | None = None,
    weight_col: str | None = None,
    teleport: DataFrame | None = None,
    init_ranks: DataFrame | None = None,
    float32_shuffle: bool = False,
    async_commit: bool = False,
) -> PageRankResult:
    """Damped PageRank with dangling-mass redistribution, L1 stopping rule.

    ``weight_col``: edge-weight column name — contributions become
    ``rank * w / total_out_weight(src)`` (weights must be > 0). Degenerates
    to classic PageRank when every weight is equal.

    ``teleport``: DataFrame with an ``id`` column — personalized PageRank:
    the teleport (and the dangling mass) land uniformly on the seed set
    instead of all vertices; ranks start as the seed distribution.

    ``init_ranks``: ``(id, rank)`` warm start — e.g., the previous converged
    ranks when the edge table has grown incrementally (streaming refresh).
    The damped iteration is a contraction with a unique fixed point, so any
    positive start converges to the SAME answer; a warm start near the new
    fixed point just takes far fewer supersteps. Vertices absent from
    ``init_ranks`` (newly arrived) start at the uniform prior.

    ``mode='join'`` (the scale path) runs the gather as a Catalyst
    equi-join + hash aggregate, fully inside whole-stage codegen;
    ``mode='csr'`` runs it as a cogrouped Arrow kernel (NumPy searchsorted
    gather + segment sums; see algos/csr_kernel.py). Identical semantics —
    but csr mode is a semantics-parity feature, measured 1.2-2.4x slower
    than join mode (the per-superstep O(E) Arrow transfer cannot be
    avoided; BENCH/SCALING_NOTES.md §5).

    ``check_every=k`` chains k supersteps lazily between materializations:
    one Spark action (and one convergence check — the L1 between the LAST
    two consecutive iterations, so the stopping rule is unchanged) per k
    iterations. Convergence may overshoot by up to k-1 iterations.

    Lineage discipline: every materialized state is ``localCheckpoint``-ed
    (lazily — plan truncation happens at call time, materialization folds
    into the L1 action, one job per block), truncating the logical plan to a
    LogicalRDD leaf. This is
    mandatory, not an optimization: each superstep references the previous
    state three times (gather, dangling agg, join), so an untruncated plan
    grows as 3^k and analysis/plan-stringification blows up. Durable
    cross-job state lives in the Checkpointer (parquet/Iceberg commits);
    localCheckpoint is the in-job double buffer (pagerank.v:1121-1127).

    ``checkpointer`` (plans.checkpoint.Checkpointer) makes the run resumable:
    each materialized superstep's rank vector + metrics are committed; on
    restart the loop continues from the last committed superstep.

    ``float32_shuffle``: shuffle the contribution partial sums as FloatType
    (half the value bytes in the one per-superstep shuffle). Adds ~1e-7
    relative noise per superstep, so the L1 plateaus around 1e-7-1e-8:
    ONLY for throughput runs with tol >= 1e-6 (the default tol=1e-9 run
    would spin to max_iters). Default off; every correctness gate runs
    double.

    ``async_commit``: run each Checkpointer commit in a background thread,
    overlapped with the NEXT block's plan-build/stage execution (commits
    stay ordered: each joins its predecessor; the loop joins the last one
    before returning). The write-audit-publish discipline is unchanged —
    a crash can at worst lose the in-flight commit, exactly like a crash
    just before a synchronous commit. Resume-identity is pytest-pinned.
    """
    # the LOGICAL plan tree still triplicates per chained superstep (caching
    # dedupes execution, not the tree): analysis/cache-lookup cost is
    # super-linear in chain depth (measured: blocks of 6 cost ~3x blocks of
    # 3 per superstep; ~3^8 nodes breaks plan stringification), so the block
    # length is hard-capped at the measured sweet spot
    check_every = max(1, min(check_every, 4))
    t_start = time.monotonic()

    deg0 = degree_table(edges, vertices).select("id", "out_degree").persist()
    # one action for both setup scalars
    row = deg0.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("out_degree") == 0, 1).otherwise(0)).alias("dangling"),
    ).first()
    n = int(row["n"])
    if n == 0:
        return PageRankResult(ranks=deg0.select("id", F.lit(0.0).alias("rank")), iterations=0, converged=True)
    # partition count: explicit > auto. Auto sizes by vertex count, capped at
    # spark.sql.shuffle.partitions — per-superstep fixed cost scales with
    # task count and a 10k-vertex graph doesn't need 32-way shuffles, while
    # a billion-vertex graph takes the full configured width.
    p = num_partitions or max(4, min(_num_partitions(edges), n // 25_000 + 4))
    deg = deg0.repartition(p, "id").persist()
    # computed once: if no vertex dangles, the dangling branch of the
    # superstep (and the state's dang column) disappears entirely
    has_dangling = int(row["dangling"] or 0) > 0
    # Edges shuffled ONCE (with the static gather coefficient attached);
    # reused by every iteration's gather. Join mode partitions by
    # src (matches the ranks side of the gather-join); CSR mode lays out
    # hash buckets sorted by src for the Arrow kernel. Eager localCheckpoint:
    # materializes the layout AND truncates its logical plan to a leaf —
    # the prepare plan (degree join + coef projection) would otherwise be
    # embedded in every superstep's gather subtree.
    edges_p = prepare_edges(edges, deg, p, mode, weight_col).localCheckpoint()

    # static dangling flag (out_degree never changes); carried on the state
    # when any vertex dangles so the per-superstep dangling-mass aggregate
    # is a filter of the cached V-sized state, not an edge-layout scan
    dang_cols = ["dang"] if has_dangling else []
    dang_flag = (F.col("out_degree") == 0).alias("dang")

    personalized = teleport is not None
    tele_table = None
    if personalized:
        # restrict seeds to vertices that exist in the graph BEFORE counting:
        # unknown ids would inflate n_seeds while their 1/n_seeds mass is
        # dropped by the left join below, so ranks would no longer sum to 1
        seeds = teleport.select("id").dropDuplicates().join(deg.select("id"), "id", "left_semi")
        n_seeds = seeds.count()
        if n_seeds == 0:
            raise ValueError("personalized PageRank requires a non-empty teleport set intersecting the vertex set")
        tele_table = (
            deg.select("id", dang_flag)
            .join(seeds.withColumn("__seed", F.lit(1)), "id", "left")
            .select(
                "id",
                "dang",
                F.when(F.col("__seed").isNotNull(), F.lit(1.0 / n_seeds)).otherwise(F.lit(0.0)).alias("tele"),
            )
            .repartition(p, "id")
        )

    base = (1.0 - damping) / n

    start_iter = 0
    state = None
    warm_tmp = None
    # committed checkpoint schema stays (id, rank, prev_rank[, tele]) — the
    # dang flag is derivable, so it is re-attached on resume, never stored
    state_cols = ["id", "rank", "prev_rank"] + (["tele"] if personalized else [])
    if checkpointer is not None:
        resumed = checkpointer.latest()
        if resumed is not None:
            start_iter, state, _extra = resumed
            state = state.select(*state_cols)
            if has_dangling:
                state = state.join(deg.select("id", dang_flag), "id")
            state = state.repartition(p, "id").localCheckpoint(eager=False)

    if state is None:
        if personalized:
            # ranks start as the seed distribution (mass 1 on the seed set)
            state = tele_table.select(
                "id", F.col("tele").alias("rank"), F.col("tele").alias("prev_rank"),
                *dang_cols, "tele",
            ).localCheckpoint(eager=False)
        elif init_ranks is not None:
            # warm start: previous ranks where known, uniform prior for new
            # vertices — NORMALIZED to total mass 1. Without normalization
            # the excess mass (old ranks sum to 1, new vertices add more) is
            # a uniform error mode decaying only at damping^k, which can make
            # a warm start converge SLOWER than cold (measured); normalized,
            # the start sits near the new fixed point inside the mass-1
            # simplex and convergence is fast.
            prev = init_ranks.select("id", F.col("rank").alias("__r0"))
            warm_tmp = seeded = (
                deg.select("id", dang_flag)
                .join(prev, "id", "left")
                .select("id", "dang", F.coalesce(F.col("__r0"), F.lit(1.0 / n)).alias("__r"))
                .repartition(p, "id")
                .persist()
            )
            total = float(seeded.agg(F.sum("__r")).first()[0])
            state = seeded.select(
                "id",
                (F.col("__r") / F.lit(total)).alias("rank"),
                (F.col("__r") / F.lit(total)).alias("prev_rank"),
                *dang_cols,
            ).localCheckpoint(eager=False)
        else:
            # Iteration-0 state: uniform prior 1/N (the reference's init-round
            # shortcut, pagerank.v:1042-1046 — no gather needed to seed it).
            state = deg.select(
                "id", F.lit(1.0 / n).alias("rank"), F.lit(1.0 / n).alias("prev_rank"), *(
                    [dang_flag] if has_dangling else []
                )
            ).localCheckpoint(eager=False)

    # force the initial state so the loop below measures steady-state
    # superstep cost only (edges_p is already materialized by localCheckpoint)
    state.count()
    if warm_tmp is not None:
        # the warm-start scratch frame fed state's (now materialized)
        # localCheckpoint; free its executor blocks immediately rather than
        # leaking them until GC across repeated pagerank() calls. edges_p's
        # localCheckpoint blocks are freed by the ContextCleaner when the
        # frame goes out of scope at return (documented reliance).
        warm_tmp.unpersist()
    result = PageRankResult(ranks=state, iterations=start_iter, converged=False)
    result.setup_seconds = time.monotonic() - t_start
    t_loop = time.monotonic()
    # Sequential block loop. A cross-block software-pipelined variant
    # (build block k+1's plan while block k's action runs) was built and
    # MEASURED WORSE in round 3 (eff 0.559 -> 0.365 at 40M edges): with AQE
    # enabled, ``localCheckpoint(eager=False)`` resolves the final physical
    # plan, which EXECUTES the block's shuffle map stages at build time — so
    # "plan building" is ~all of the block's real executor work (measured:
    # build 89s vs awaited-action 1.2s at local[32]), leaving nothing to
    # hide behind the action. Worse, the speculative build raced the L1 agg
    # job to materialize the same lazy-checkpoint partitions (duplicate
    # partition computation; "Block rdd_N already exists" churn) and held
    # block k's intra-block persists alive during block k+1's execution —
    # exactly where 32-way memory pressure is the binding constraint. The
    # build/action split instrumentation is kept: it attributes per-block
    # wall between stage execution at plan-resolution time and the final
    # materializing action (BENCH/SCALING_NOTES.md §9).
    it = start_iter
    pending_commit = None
    commit_err: list = []
    while it < max_iters:
        block = min(check_every, max_iters - it)
        new_state = state
        intermediates = []
        t0 = time.monotonic()
        for i in range(block):
            new_state = _superstep(
                edges_p, new_state, mode, p, damping, base, n, has_dangling,
                personalized, float32_shuffle,
            )
            if i < block - 1:
                # lazy persist: each intra-block state is consumed by up to 2
                # downstream operators; without the cache the block's single
                # job recomputes the superstep subtree per consumer
                new_state = new_state.persist()
                intermediates.append(new_state)
        # lazy localCheckpoint: truncates the 3^block logical plan to a leaf.
        # Under AQE this resolves the final physical plan, running the
        # block's shuffle map stages NOW (the bulk of the block's work)
        new_state = new_state.localCheckpoint(eager=False)
        build_s = time.monotonic() - t0

        t0 = time.monotonic()
        row = new_state.agg(F.sum(F.abs(F.col("rank") - F.col("prev_rank"))).alias("l1")).first()
        action_s = time.monotonic() - t0
        l1 = float(row["l1"])
        for df in intermediates:
            df.unpersist()
        state = new_state
        it += block
        result.l1_history.append(l1)
        result.metrics.append({
            "iteration": it,
            "l1": l1,
            # build_seconds: superstep assembly + AQE stage execution during
            # plan resolution; action_seconds: the final L1/materialize job
            "build_seconds": round(build_s, 4),
            "action_seconds": round(action_s, 4),
        })
        result.iterations = it

        if checkpointer is not None:
            if async_commit:
                # overlap the commit (parquet write + audit: driver-blocking
                # but not superstep-critical) with the next block's build.
                # Ordered: join the previous commit first, so at most one
                # commit is in flight and supersteps publish in order.
                if pending_commit is not None:
                    pending_commit.join()
                    if commit_err:
                        raise commit_err[0]
                snap_it, snap_state = it, state.select(*state_cols)

                def _bg(k=snap_it, s=snap_state, x=l1):
                    try:
                        checkpointer.commit(k, s, {"l1": x})
                    except Exception as exc:  # noqa: BLE001 — re-raised on join
                        commit_err.append(exc)

                pending_commit = threading.Thread(target=_bg, daemon=True)
                pending_commit.start()
            else:
                checkpointer.commit(it, state.select(*state_cols), {"l1": l1})
        if l1 < tol:
            result.converged = True
            break

    if pending_commit is not None:
        pending_commit.join()
        if commit_err:
            raise commit_err[0]
    result.iter_seconds = time.monotonic() - t_loop
    result.ranks = state.select("id", "rank")
    deg.unpersist()
    deg0.unpersist()
    return result


def pagerank_fixed_point(
    edges: DataFrame,
    n_rounds: int,
    vertices: DataFrame | None = None,
    prec: int = 16,
) -> DataFrame:
    """Reference-exact fixed-point PageRank (golden mode, SURVEY.md §2a).

    Recurrence (all int64, floor division; y is the stored out-contribution
    rank(v)/outdeg(v) of undamped PageRank):

        init_val = floor(2^prec / V)                   # pagerank.v:475-478
        y_1[v]   = floor(|in(v)| * init_val / outdeg)  # pagerank.v:1042-1046
        y_k[v]   = floor(sum_{u in in(v)} y_{k-1}[u] / outdeg)
                                                       # pagerank.v:1086-1088,1046,468-472

    Requires every vertex to have outdeg >= 1 (reference behavior is
    undefined otherwise — pr_div_uu.v:186-191 div0 flag is ignored). Integer
    sums are order-independent, so results are bit-exact under any
    partitioning. Fixed ``n_rounds``, no convergence test — exactly like the
    hardware (pagerank.v:732, 1151).
    """
    spark = edges.sparkSession
    p = _num_partitions(edges)
    deg = degree_table(edges, vertices)
    deg = deg.repartition(p, "id").persist()
    n = deg.count()
    bad = deg.filter(F.col("out_degree") == 0).count()
    if bad:
        raise ValueError(f"fixed-point golden mode requires outdeg >= 1 everywhere; {bad} dangling vertices")
    if n > (1 << prec):
        raise ValueError(f"fixed-point mode degenerates above 2^{prec} vertices (SURVEY.md §2a); V={n}")

    init_val = (1 << prec) // n
    edges_p = edges.select("src", "dst").repartition(p, "src").persist()

    # Round 1: uniform prior — expressible from degrees alone, no join
    # (the reference's round==2 init substitution path).
    y = deg.select(
        "id",
        "out_degree",
        F.expr(f"CAST(in_degree * {init_val} AS LONG) div out_degree").alias("y"),
    ).localCheckpoint(eager=False)

    for _ in range(max(0, n_rounds - 1)):
        sums = (
            edges_p.join(y, edges_p.src == y.id, "inner")
            .groupBy("dst")
            .agg(F.sum("y").alias("s"))
        )
        # eager localCheckpoint truncates the 2x-per-round plan growth
        y = (
            y.join(sums, y.id == sums.dst, "left")
            .select(
                y.id,
                y.out_degree,
                F.expr("coalesce(s, CAST(0 AS LONG)) div out_degree").alias("y"),
            )
            .localCheckpoint(eager=False)
        )

    out = y.select("id", F.col("y").alias("rank_fp"))
    edges_p.unpersist()
    deg.unpersist()
    return out


def pagerank_damping_sweep(
    edges: DataFrame,
    dampings: list[float],
    iters: int = 3,
    num_partitions: int | None = None,
) -> DataFrame:
    """Damped PageRank at SEVERAL damping factors in ONE superstep loop —
    the hyperparameter-sweep shape: state is keyed ``(dval, id)``, so every
    iteration runs one gather join and one grouped sum for ALL sweep
    points together, amortizing the edge table's shuffle/layout across the
    sweep instead of re-running the whole job per d (at 100 TB the edge
    scan dominates; a 4-point sweep this way costs ~1 job, not 4).

    Semantics per d match :func:`pagerank` exactly (uniform prior, static
    per-edge 1/out_degree coefficient, dangling-mass redistribution):
    ``rank' = (1-d)/n + d*contrib + d*dangling_mass/n``. The sweep
    dimension rides the shuffle key, so skew handling and partitioning
    are unchanged — per-d state is a constant-factor fan-out of the
    vertex table, visible and budgeted, not a hidden re-shuffle.

    Returns ``(dval, id, rank)`` after ``iters`` synchronous iterations
    (fixed count — the sweep is a diagnostic, convergence-driven runs use
    :func:`pagerank` per chosen d).
    """
    if not dampings:
        raise ValueError("dampings must be non-empty")
    p = num_partitions or _num_partitions(edges)
    e = edges.select("src", "dst").dropDuplicates().repartition(p, "src").localCheckpoint()
    deg = e.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )
    v = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .dropDuplicates()
    )
    vd = v.join(deg, "id", "left").select(
        "id", F.coalesce("out_degree", F.lit(0)).alias("out_degree")
    ).localCheckpoint()
    n_tbl = vd.groupBy().agg(F.count(F.lit(1)).cast("double").alias("__n"))
    dv = edges.sparkSession.createDataFrame(
        [(float(d),) for d in dampings], "dval double"
    )
    state = (
        vd.crossJoin(F.broadcast(dv))
        .crossJoin(F.broadcast(n_tbl))
        .select("dval", "id", "out_degree", (F.lit(1.0) / F.col("__n")).alias("rank"))
        .repartition(p, "id")
        .localCheckpoint()
    )
    for _ in range(iters):
        dang = (
            state.filter(F.col("out_degree") == 0)
            .groupBy("dval")
            .agg(F.sum("rank").alias("__m"))
        )
        contrib = (
            e.join(
                state.select("dval", F.col("id").alias("src"), "rank", "out_degree").hint(
                    "shuffle_hash"
                ),
                "src",
            )
            .select("dval", "dst", (F.col("rank") / F.col("out_degree")).alias("__c"))
            .groupBy("dval", F.col("dst").alias("id"))
            .agg(F.sum("__c").alias("__contrib"))
        )
        state = (
            vd.crossJoin(F.broadcast(dv))
            .crossJoin(F.broadcast(n_tbl))
            .join(F.broadcast(dang), "dval", "left")
            .join(contrib, ["dval", "id"], "left")
            .select(
                "dval",
                "id",
                "out_degree",
                (
                    (1 - F.col("dval")) / F.col("__n")
                    + F.col("dval") * F.coalesce(F.col("__contrib"), F.lit(0.0))
                    + F.col("dval") * F.coalesce(F.col("__m"), F.lit(0.0)) / F.col("__n")
                ).alias("rank"),
            )
            .repartition(p, "id")
            .localCheckpoint()
        )
    return state.select("dval", "id", "rank")
