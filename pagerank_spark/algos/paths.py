"""Multi-source shortest paths (weighted SSSP / unweighted BFS) via
frontier-limited Bellman-Ford rounds.

Reference parity: the reference accelerator's gather/sum/apply superstep
machinery (pagerank.v control loop; SURVEY.md §2b's iterative-algorithm
family) generalizes to any semiring; shortest paths is the (min, +) instance
of the same dataflow — gather = dist + w over in-edges, reduce = min,
apply = keep-if-improved. This module expresses that instance with the same
Spark plan shape as algos/pagerank.py (one hash join + one grouped agg per
superstep, eager localCheckpoint lineage truncation).

Scale design:

- **Frontier-limited relaxation**: each round joins edges against only the
  vertices whose distance improved last round, not the full vertex set. On
  high-diameter graphs (transcript chains) most rounds touch a small
  frontier, so per-round shuffle volume tracks the frontier, not V. The
  synchronized-round invariant still holds: after round k the state equals
  full Bellman-Ford's "shortest path using <= k edges" (a vertex absent
  from the frontier already propagated its final distance the round it was
  last improved), which is what makes the unrolled SQL oracle exact.
- **State holds reached vertices only** — unreached vertices cost nothing
  until a path arrives (callers left-join against the vertex set if they
  need sentinel rows).
- **Edges are shuffled once** (repartition by src + localCheckpoint); every
  round's join reuses that layout, the same one-time-shuffle contract as
  pagerank.prepare_edges.
- Integer-valued weights keep distance arithmetic exact in doubles (sums of
  small ints), so cross-engine value comparison needs no rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window
from pyspark.sql import functions as F

from .pagerank import _num_partitions


def shortest_paths(
    edges: DataFrame,
    sources: DataFrame,
    weight_col: str | None = None,
    max_iters: int = 20,
    num_partitions: int | None = None,
) -> DataFrame:
    """Return ``(id, dist)`` for every vertex reachable from ``sources``
    (directed; ``dist`` minimal over path weight sums, hop count when
    ``weight_col`` is None). Runs synchronized Bellman-Ford rounds; stops
    early when a round improves nothing (a fixed point, so stopping early
    equals running all ``max_iters`` rounds — the oracle-parity property).

    ``edges``: (src, dst [, weight_col]); negative weights are rejected
    (min-plus with a frontier assumes monotone relaxation).
    ``sources``: one column ``id``.
    """
    p = num_partitions or _num_partitions(edges)
    w = (
        F.col(weight_col).cast("double")
        if weight_col is not None
        else F.lit(1.0)
    )
    e = (
        edges.select("src", "dst", w.alias("w"))
        .repartition(p, "src")
        .localCheckpoint()
    )
    if weight_col is not None:
        row = e.agg(F.min("w").alias("m")).first()
        if row["m"] is not None and row["m"] < 0:
            raise ValueError(f"negative weight {row['m']} — min-plus SSSP requires w >= 0")

    # state == reached vertices; frontier == improved-last-round subset
    state = sources.select("id", F.lit(0.0).alias("dist")).repartition(p, "id").localCheckpoint()
    frontier = state

    for _ in range(max_iters):
        cand = (
            e.join(frontier.withColumnRenamed("id", "src"), "src")
            .select("dst", (F.col("dist") + F.col("w")).alias("dist"))
            .groupBy("dst")
            .agg(F.min("dist").alias("cand"))
            .withColumnRenamed("dst", "id")
        )
        merged = (
            state.join(cand, "id", "full_outer")
            .select(
                "id",
                # least() skips nulls: newly-reached -> cand, no-candidate -> dist
                F.least(F.col("dist"), F.col("cand")).alias("dist"),
                # improved: newly reached, or candidate strictly better
                (F.col("dist").isNull() | (F.col("cand") < F.col("dist"))).alias("__imp"),
            )
            .repartition(p, "id")
            .localCheckpoint()
        )
        n_improved = merged.filter(F.col("__imp")).count()
        state = merged.select("id", "dist").localCheckpoint(eager=False)
        if n_improved == 0:
            break
        frontier = merged.filter(F.col("__imp")).select("id", "dist")

    return state


def landmark_distances(
    edges: DataFrame,
    seeds: DataFrame,
    weight_col: str | None = None,
    max_iters: int = 20,
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-seed shortest paths: ``(seed, id, dist)`` for every (landmark,
    vertex) pair connected within ``max_iters`` synchronized rounds.

    Identical (min, +) relaxation to :func:`shortest_paths` but the state is
    keyed by the composite ``(seed, id)``, preserving per-landmark identity
    — the building block for landmark-based centrality (harmonic closeness)
    and distance-oracle sketches. Shuffle volume scales with
    ``|seeds| x reached-set`` instead of ``reached-set``, so landmark sets
    stay small (tens) at scale; each round is still one co-partitioned hash
    join (edges shuffled once by src) + one grouped min.

    ``seeds``: one column ``id``.
    """
    p = num_partitions or _num_partitions(edges)
    w = F.col(weight_col).cast("double") if weight_col is not None else F.lit(1.0)
    e = edges.select("src", "dst", w.alias("w")).repartition(p, "src").localCheckpoint()

    state = (
        seeds.select(F.col("id").alias("seed"), F.col("id").alias("id"), F.lit(0.0).alias("dist"))
        .repartition(p, "id")
        .localCheckpoint()
    )
    frontier = state

    for _ in range(max_iters):
        cand = (
            e.join(frontier.withColumnRenamed("id", "src"), "src")
            .select("seed", F.col("dst").alias("id"), (F.col("dist") + F.col("w")).alias("dist"))
            .groupBy("seed", "id")
            .agg(F.min("dist").alias("cand"))
        )
        merged = (
            state.join(cand, ["seed", "id"], "full_outer")
            .select(
                "seed",
                "id",
                F.least(F.col("dist"), F.col("cand")).alias("dist"),
                (F.col("dist").isNull() | (F.col("cand") < F.col("dist"))).alias("__imp"),
            )
            .repartition(p, "id")
            .localCheckpoint()
        )
        n_improved = merged.filter(F.col("__imp")).count()
        state = merged.select("seed", "id", "dist").localCheckpoint(eager=False)
        if n_improved == 0:
            break
        frontier = merged.filter(F.col("__imp")).select("seed", "id", "dist")

    return state


def harmonic_closeness(
    edges: DataFrame,
    seeds: DataFrame,
    weight_col: str | None = None,
    max_iters: int = 20,
    num_partitions: int | None = None,
) -> DataFrame:
    """Landmark-estimated harmonic centrality: for every vertex v of the
    graph, ``closeness(v) = sum over landmarks s != v reaching v of
    1 / d(s, v)`` (0.0 when no landmark reaches v). With ``seeds`` = all
    vertices this is exact harmonic centrality; with a small landmark set
    it is the standard scalable estimator."""
    d = landmark_distances(edges, seeds, weight_col, max_iters, num_partitions)
    verts = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .dropDuplicates()
    )
    contrib = (
        d.filter(F.col("dist") > 0)
        .groupBy("id")
        .agg(F.sum(1.0 / F.col("dist")).alias("closeness"))
    )
    return verts.join(contrib.hint("shuffle_hash"), "id", "left").select(
        "id", F.coalesce("closeness", F.lit(0.0)).alias("closeness")
    )


def temporal_reachability(
    edges: DataFrame,
    seeds: DataFrame,
    delta_us: int,
    max_rounds: int = 10,
    num_partitions: int | None = None,
) -> DataFrame:
    """Earliest-arrival TIME-RESPECTING reachability ``(id, arrival_us)``:
    an edge ``(u, v, ts_us)`` can extend a journey iff
    ``arrival(u) <= ts_us <= arrival(u) + delta_us`` — reachability with a
    maximum waiting time, the standard temporal-graph formulation (Holme &
    Saramaki 2012, public methodology). On transcript graphs this answers
    "which turns can a seed turn have influenced within delta per hop",
    which plain reachability overstates (it happily crosses month-long
    gaps).

    ``edges``: (src, dst, ts_us) with integer microsecond timestamps —
    exact arithmetic, no timestamp-format or float hazards. ``seeds``:
    (id, arrival_us) — a seed is "available" from its own timestamp.

    Same plan shape and oracle-parity argument as ``shortest_paths``:
    frontier-limited synchronized rounds; after k rounds the state equals
    full relaxation's "earliest arrival using <= k temporal hops" (a vertex
    whose arrival did not improve re-yields the same candidates, so
    skipping it loses nothing), so a k-round unrolled SQL oracle is exact.
    Arrival merging is min-monotone; stops early at the fixed point.
    """
    p = num_partitions or _num_partitions(edges)
    e = (
        edges.select("src", "dst", F.col("ts_us").cast("long").alias("ts_us"))
        .repartition(p, "src")
        .localCheckpoint()
    )
    state = (
        seeds.select("id", F.col("arrival_us").cast("long").alias("arrival_us"))
        .groupBy("id")
        .agg(F.min("arrival_us").alias("arrival_us"))
        .repartition(p, "id")
        .localCheckpoint()
    )
    frontier = state

    for _ in range(max_rounds):
        cand = (
            e.join(frontier.withColumnRenamed("id", "src"), "src")
            .filter(
                (F.col("ts_us") >= F.col("arrival_us"))
                & (F.col("ts_us") <= F.col("arrival_us") + F.lit(delta_us))
            )
            .groupBy("dst")
            .agg(F.min("ts_us").alias("cand"))
            .withColumnRenamed("dst", "id")
        )
        merged = (
            state.join(cand, "id", "full_outer")
            .select(
                "id",
                F.least(F.col("arrival_us"), F.col("cand")).alias("arrival_us"),
                (F.col("arrival_us").isNull() | (F.col("cand") < F.col("arrival_us"))).alias("__imp"),
            )
            .repartition(p, "id")
            .localCheckpoint()
        )
        n_improved = merged.filter(F.col("__imp")).count()
        state = merged.select("id", "arrival_us").localCheckpoint(eager=False)
        if n_improved == 0:
            break
        frontier = merged.filter(F.col("__imp")).select("id", "arrival_us")

    return state


def eccentricity(
    edges: DataFrame,
    max_iters: int = 20,
    num_partitions: int | None = None,
) -> DataFrame:
    """Per-vertex DIRECTED eccentricity over the reachable set: ``ecc(u) =
    max_v dist(u, v)`` plus ``n_reached`` (diameter = max ecc, radius =
    min ecc over vertices reaching everything — consumers aggregate).

    Built as all-sources BFS on :func:`landmark_distances` (seeds = every
    vertex), which makes the state the full APSP table — QUADRATIC in V by
    definition. That is the honest contract: run it on bounded-V graphs
    (condensed/contracted supergraphs, planted gate graphs) or pass a
    sampled seed set to ``landmark_distances`` directly for the
    estimate-at-scale path (the iFUB-style exact-diameter refinement is a
    seed-scheduling layer over the same primitive, not a different plan).

    Returns ``(id, ecc, n_reached)`` — ecc in exact unit hops (BIGINT).
    """
    verts = (
        edges.select(F.col("src").alias("id"))
        .union(edges.select(F.col("dst").alias("id")))
        .dropDuplicates()
    )
    d = landmark_distances(edges, verts, None, max_iters, num_partitions)
    return d.groupBy("seed").agg(
        F.max(F.col("dist")).cast("long").alias("ecc"),
        F.count(F.lit(1)).alias("n_reached"),
    ).select(F.col("seed").alias("id"), "ecc", "n_reached")


def distance_distribution(
    edges: DataFrame,
    max_iters: int = 20,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact histogram ``(dist, n_pairs)`` of FINITE directed pairwise
    distances (s != t) — the hop plot. All-sources BFS via
    :func:`landmark_distances` (state keyed (seed, id), cost
    O(sum of reached sets)); exact mode for gate-scale graphs, the ANF/HLL
    estimator in algos/neighborhood.py is the 100-TB path for the same
    curve. Distances cast to BIGINT (unit hops) for hash-stable output.
    """
    verts = (
        edges.select(F.col("src").cast("long").alias("id"))
        .unionByName(edges.select(F.col("dst").cast("long").alias("id")))
        .dropDuplicates()
    )
    ld = landmark_distances(edges, verts, max_iters=max_iters, num_partitions=num_partitions)
    return (
        ld.filter(F.col("seed") != F.col("id"))
        .groupBy(F.col("dist").cast("long").alias("dist"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


def effective_diameter(
    edges: DataFrame,
    q_pct: int = 90,
    max_iters: int = 20,
    num_partitions: int | None = None,
) -> DataFrame:
    """One row ``(eff_diameter, diameter, n_pairs)``: the smallest hop count
    d with ``100 * #(pairs at dist <= d) >= q_pct * #finite pairs`` (the
    standard 90th-percentile effective diameter), the exact diameter, and
    the finite-pair count. Integer comparison — no float quantile — so the
    SQL oracle replays it exactly. Derived from one
    :func:`distance_distribution` histogram (tiny: one row per distinct
    distance), aggregated with a running-sum window over that histogram —
    single-partition by construction of the histogram, never of the data.
    """
    h = distance_distribution(edges, max_iters=max_iters, num_partitions=num_partitions)
    w = Window.orderBy("dist").rowsBetween(Window.unboundedPreceding, 0)
    tot = Window.partitionBy()
    cum = h.select(
        "dist",
        F.sum("n_pairs").over(w).alias("cum"),
        F.sum("n_pairs").over(tot).alias("total"),
    )
    return (
        cum.filter(F.lit(100) * F.col("cum") >= F.lit(q_pct) * F.col("total"))
        .groupBy()
        .agg(
            F.min("dist").alias("eff_diameter"),
            F.max("dist").alias("diameter"),
            F.max("total").alias("n_pairs"),
        )
    )


def directed_girth(
    edges: DataFrame, max_k: int = 12, num_partitions: int | None = None
) -> DataFrame:
    """Exact directed girth probe: the smallest cycle length ``k <= max_k``,
    found as the first boolean adjacency power with a non-empty diagonal.

    A minimal closed walk is a simple cycle (any vertex repeat inside it
    would yield a shorter closed walk), so girth = min k with
    ``trace(A^k) > 0`` over the 0/1 adjacency. Each round multiplies the
    reachable-pair relation by A in the BOOLEAN semiring — one hash join +
    dropDuplicates, the (or, and) instance of the same superstep dataflow
    as pagerank/SSSP (reference pagerank.v's gather loop; values never grow,
    so there is nothing to overflow and nothing float to drift).

    Scale notes: pair relation B_k can densify toward V^2 on
    small-diameter graphs — the probe is meant for small ``max_k`` (girth
    probes in practice ask "is there a short cycle?"); each round is one
    co-partitioned join on the walk head + a pair-key dedup, edges are
    shuffled once and reused, lineage truncated per round. Early-stops at
    the first non-empty diagonal (one count action per round, the
    iteration-driver contract).

    Returns one row ``(girth, n_on_min_cycles)`` — ``(-1, 0)`` if no cycle
    within ``max_k``. ``n_on_min_cycles`` = number of distinct vertices
    with a closed k-walk at the girth (exact integers, hash-stable).
    """
    p = num_partitions or _num_partitions(edges)
    e = (
        edges.select("src", "dst")
        .dropDuplicates()
        .repartition(p, "src")
        .localCheckpoint()
    )
    b = e.select(F.col("src").alias("i"), F.col("dst").alias("j")).localCheckpoint()
    girth, n_on = -1, 0
    for k in range(1, max_k + 1):
        diag = b.filter(F.col("i") == F.col("j")).count()
        if diag > 0:
            girth, n_on = k, diag
            break
        if k == max_k:
            break
        b = (
            b.join(e.hint("shuffle_hash"), b["j"] == e["src"])
            .select("i", F.col("dst").alias("j"))
            .dropDuplicates()
            .localCheckpoint()
        )
    spark = edges.sparkSession
    return spark.createDataFrame(
        [(girth, n_on)], "girth long, n_on_min_cycles long"
    )


def widest_paths(
    edges: DataFrame,
    source: int,
    weight_col: str = "weight",
    max_iters: int = 30,
    num_partitions: int | None = None,
) -> DataFrame:
    """Widest-path / bottleneck SSSP (the max-min semiring — Pollack 1960,
    public methodology): ``cap(v)`` = the maximum over source->v paths of
    the minimum edge weight along the path — max bandwidth, max shippable
    quantity, best worst-case link. The third semiring instance of the
    synchronized relaxation kernel (+/min = :func:`shortest_paths`,
    bool/or = BFS closure, min/max = here), demonstrating the gather/
    group-sum superstep core (reference pagerank.v dataflow) is
    semiring-generic.

    Weights must be positive BIGINTs. Caps are monotone non-decreasing and
    drawn from the finite weight set, so the fixpoint is exact and the
    in-state no-change stop is sound. One co-partitioned edge layout up
    front; per round one gather join + max-group. Unreached vertices are
    absent from the output (the shortest_paths convention); the source
    reports the ``2^62`` infinity sentinel (no incoming constraint).
    """
    par = num_partitions or max(4, _num_partitions(edges))
    inf = 1 << 62
    e = (
        edges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
            F.col(weight_col).cast("long").alias("w"),
        )
        .repartition(par, "src")
        .localCheckpoint()
    )
    bad = e.filter(F.col("w") <= 0).count()
    if bad:
        raise ValueError("widest_paths requires positive integer weights")
    state = (
        e.sparkSession.createDataFrame([(int(source), inf)], "id long, cap long")
        .repartition(par, "id")
        .localCheckpoint()
    )
    for _ in range(int(max_iters)):
        gathered = (
            e.join(state.hint("shuffle_hash"), e.src == state.id, "inner")
            .select(F.col("dst").alias("id"), F.least(F.col("cap"), F.col("w")).alias("cap"))
        )
        nxt = (
            state.select("id", "cap")
            .unionByName(gathered)
            .groupBy("id")
            .agg(F.max("cap").alias("cap"))
            .repartition(par, "id")
            .localCheckpoint()
        )
        same = (
            nxt.join(state.select("id", F.col("cap").alias("pc")), "id", "left")
            .filter(F.col("pc").isNull() | (F.col("cap") != F.col("pc")))
            .count()
        )
        state = nxt
        if same == 0:
            break
    else:
        # budget-exceeded contract (matches bridges()'s hard-error rule,
        # commit f8fdfc6): never hand back silently non-converged caps
        raise RuntimeError(
            f"widest_paths did not reach its fixpoint within {max_iters}"
            " supersteps — raise max_iters to at least the relaxation depth"
            " (bounded by the graph diameter)"
        )
    return state
