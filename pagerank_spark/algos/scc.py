"""Strongly connected components via trim + forward-max coloring + backward
reachability (the distributed FW-BW/coloring scheme of Orzan and
McLendon et al., standard in Pregel-family systems).

Directed reachability has no pointer-jumping contraction like undirected CC
(components.py) — a label can only move along edge direction — so the
algorithm peels SCCs in outer rounds:

1. **trim** — a vertex with no in-edge or no out-edge in the remaining
   subgraph is its own SCC; peel repeatedly. This removes DAG tails/chains
   cheaply (two projections + two semi-joins per pass) before the expensive
   phases run, and in transcript-derived reply graphs — which are almost
   acyclic — trim alone resolves the vast majority of vertices.
2. **color** — propagate ``color(v) = max{id(u) : u reaches v}`` to a
   fixpoint with one neighbor-max gather join per superstep (color flows
   src -> dst); O(reach-diameter) supersteps. Deliberately NO pointer jump —
   see ``_max_fixpoint`` for why (no worst-case gain for directed
   propagation + a measured Catalyst stats-squaring pathology on iterated
   state self-joins, SCALING_NOTES §10).
3. **collect** — every nonempty color class contains its root r (color(r)=r)
   and r is the class **max** (any v with id(v) > color(v) contradicts
   v reaching itself), and SCC(r) = {v : color(v)=r and v reaches r}. Any
   v->...->r path from a vertex of color r stays inside color class r (each
   w on the path has r reaching w through v, and anything above r reaching w
   would also reach r, contradicting color(r)=r), so "v reaches r" ==
   "the max id forward-reachable from v over REVERSED same-color edges is
   r" — the same max-propagation as phase 2, every color class resolving
   one SCC **in parallel**.
4. assign ``scc = color`` (the max member id) to collected vertices, remove
   them, and repeat on the shrinking remainder.

Outer rounds are bounded by the longest root-chain in the condensation; each
round's cost is bounded by the *remaining* subgraph (edges are re-filtered
and checkpointed per round, exactly like k-core peeling). All moves are
exact integer min/max joins — deterministic, no floating point.

Scale shape: every join is a shuffle-hash join keyed on vertex id over a
monotonically shrinking edge set; eager localCheckpoints per update truncate
lineage (states are referenced multiple times per superstep). No per-row
Python anywhere.

Reference parity note: the reference accelerator (estherlyoon/pagerank) has
no SCC kernel; this extends the engine's §2b component family
(components.py) to directed semantics.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .pagerank import _num_partitions


def _max_fixpoint(
    e: DataFrame, verts: DataFrame, from_col: str, to_col: str, max_inner: int, label: str
) -> DataFrame:
    """Exact fixpoint of ``color(v) = max id with a directed path to v``
    along ``from_col -> to_col`` edges, as ``(id, color)``.

    Each superstep is ONE neighbor-max gather join — deliberately WITHOUT
    the CC-style pointer jump (``color <- color[color]``). The jump would be
    sound here (reachability composes), but it buys nothing in the worst
    case for directed propagation (with vertex ids monotone along a cycle,
    every intermediate vertex keeps its own id until the max arrives, so the
    wavefront still moves one hop per superstep) and its state self-join
    triggers a measured driver pathology: Catalyst's size-in-bytes estimate
    of a join is the PRODUCT of its children's, ``localCheckpoint`` carries
    the estimate across supersteps via ``originStats``, so a self-join
    SQUARES the BigInteger statistic every superstep — after ~15 supersteps
    the driver spends its time in BigInteger.multiply on a number with
    millions of digits (walls of 0.4s -> 40s/superstep measured at 37 rows;
    BENCH/SCALING_NOTES.md §10). A single-reference loop's estimate grows
    geometrically (digits linear in supersteps) — harmless.

    Convergence: O(reach-diameter) supersteps — the accepted bound for
    distributed SCC coloring; trim removes the long acyclic chains first,
    so the diameter that matters is that of the cyclic remainder.
    """
    state = verts.select("id", F.col("id").alias("color")).localCheckpoint()
    for _ in range(max_inner):
        nbr = (
            e.join(state.hint("shuffle_hash"), e[from_col] == state.id, "inner")
            .groupBy(to_col)
            .agg(F.max("color").alias("__nbr"))
        )
        stepped = state.join(nbr.hint("shuffle_hash"), state.id == nbr[to_col], "left").select(
            state.id,
            F.greatest(state.color, F.coalesce(F.col("__nbr"), state.color)).alias("color"),
            state.color.alias("prev"),
        )
        state = stepped.localCheckpoint()
        changed = state.filter(F.col("color") != F.col("prev")).count()
        if changed == 0:
            return state.select("id", "color")
    raise RuntimeError(f"scc: {label} did not converge in {max_inner} supersteps")


@dataclass
class SCCResult:
    labels: DataFrame  # (id, scc) resolved so far (all vertices iff converged)
    rounds: int
    converged: bool


def strongly_connected_components(
    edges: DataFrame,
    max_rounds: int = 40,
    max_inner: int = 200,
    num_partitions: int | None = None,
    checkpointer=None,
) -> SCCResult:
    """Peel SCCs into ``SCCResult.labels = (id, scc)`` where ``scc`` is the
    **max** vertex id of v's strongly connected component (max because the
    coloring phase propagates maxima; the root of every color class is its
    largest member). Deterministic and exact.

    ``max_rounds`` bounds outer peel rounds; ``max_inner`` bounds the
    supersteps of each inner fixpoint (which raise ``RuntimeError`` if
    exhausted — they are bounded by the remaining subgraph's reach-diameter,
    so raise ``max_inner`` for graphs with huge cycles, while outer-round
    exhaustion is a legitimate budget cut reported as ``converged=False``).

    ``checkpointer`` (plans.checkpoint.Checkpointer) commits the resolved
    label table + remaining-vertex count once per outer round; a rerun with
    the same checkpointer resumes from the last committed round, re-deriving
    the remaining subgraph by anti-joining the committed labels
    (north-rule resumability, same contract as k-truss/MIS).
    """
    p = num_partitions or _num_partitions(edges)
    e = (
        edges.select(F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
        .repartition(p, "src")
    ).localCheckpoint()
    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .dropDuplicates()
        .repartition(p, "id")
    ).localCheckpoint()
    # self-loop-only vertices never enter `verts`; recover them at the end.
    # Barriered: the caller's edge plan may contain a Union (e.g. reply ∪
    # tool edges from transcripts_to_graph), and joining over a Union trips
    # the Catalyst constraint-rewrite bug described at the return site.
    loops = (
        edges.select(F.col("src").cast("long").alias("id"))
        .filter(F.col("src").cast("long") == F.col("dst").cast("long"))
        .dropDuplicates()
        .localCheckpoint(eager=False)
    )

    def _refilter(cur_e: DataFrame, cur_v: DataFrame) -> DataFrame:
        return (
            cur_e.join(cur_v.withColumnRenamed("id", "src"), "src", "left_semi")
            .join(cur_v.withColumnRenamed("id", "dst"), "dst", "left_semi")
            .select("src", "dst")
        ).localCheckpoint()

    done: list[DataFrame] = []
    n_verts = verts.count()
    start_round = 0
    converged = n_verts == 0
    if checkpointer is not None:
        resumed = checkpointer.latest()
        if resumed is not None:
            start_round, state, extra = resumed
            prior = state.select("id", "scc").repartition(p, "id").localCheckpoint()
            done.append(prior)
            if extra.get("remaining") == 0:
                converged = True
            else:
                verts = verts.join(prior, "id", "left_anti").localCheckpoint()
                n_verts = verts.count()
                e = _refilter(e, verts)

    def _all_done() -> DataFrame:
        if not done:
            return verts.select("id", F.col("id").alias("scc"))  # empty
        out = done[0]
        for d in done[1:]:
            out = out.unionByName(d)
        return out

    rnd = start_round
    while not converged and rnd < max_rounds:
        # --- trim: in-degree-0 / out-degree-0 vertices are singleton SCCs
        for _ in range(max_inner):
            has_out = e.select(F.col("src").alias("id")).dropDuplicates()
            has_in = e.select(F.col("dst").alias("id")).dropDuplicates()
            core = (
                verts.join(has_out, "id", "left_semi").join(has_in, "id", "left_semi")
            ).localCheckpoint()
            n_core = core.count()
            n_trimmed = n_verts - n_core
            n_verts = n_core
            if n_trimmed == 0:
                break
            done.append(
                verts.join(core, "id", "left_anti")
                .select("id", F.col("id").alias("scc"))
                .localCheckpoint()
            )
            verts = core
            e = _refilter(e, verts)
        if n_verts == 0:
            rnd += 1
            converged = True
            if checkpointer is not None:
                checkpointer.commit(rnd, _all_done(), {"remaining": 0})
            break

        # --- color: forward max-propagation to the fixpoint
        colors = _max_fixpoint(e, verts, "src", "dst", max_inner, "coloring")

        # --- collect: v belongs to SCC(root) iff v reaches its color root
        # within its color class; the root is the class MAX, so "reaches
        # root" == "max id forward-reachable over REVERSED same-color edges
        # equals own color" — the same max-propagation as coloring, every
        # color class resolving in parallel
        csrc = colors.select(F.col("id").alias("src"), F.col("color").alias("__c1"))
        cdst = colors.select(F.col("id").alias("dst"), F.col("color").alias("__c2"))
        ecc = (
            e.join(csrc.hint("shuffle_hash"), "src")
            .join(cdst.hint("shuffle_hash"), "dst")
            .filter(F.col("__c1") == F.col("__c2"))
            .select("src", "dst")
        ).localCheckpoint()
        back = _max_fixpoint(ecc, verts, "dst", "src", max_inner, "collect")
        mark = (
            colors.join(back.withColumnRenamed("color", "__bc"), "id")
            .filter(F.col("color") == F.col("__bc"))
            .select("id", F.col("color").alias("scc"))
        ).localCheckpoint()

        done.append(mark)
        verts = verts.join(mark, "id", "left_anti").localCheckpoint()
        n_verts = verts.count()
        rnd += 1
        converged = n_verts == 0
        if checkpointer is not None:
            checkpointer.commit(rnd, _all_done(), {"remaining": n_verts})
        if not converged:
            e = _refilter(e, verts)

    out = _all_done()
    # vertices that only ever appeared as self-loops: singleton SCCs
    loop_only = (
        loops.join(out, "id", "left_anti")
        .select("id", F.col("id").alias("scc"))
        .localCheckpoint(eager=False)
    )
    out = out.unionByName(loop_only)
    # Final plan barrier, resolved with constraint propagation OFF:
    # Dataset.localCheckpoint preserves `originConstraints`, and the trim/
    # collect legs' constraints reference attributes of their PRE-checkpoint
    # lineage (not in their own output), so Union's rewriteConstraints —
    # whose AttributeMap is keyed on child outputs only — dies with
    # `NoSuchElementException: key not found <attr>` when any join's
    # constraints meet this Union (e.g. jobs/run_components.py's id
    # re-join). Resolving the union once behind a barrier, constraints
    # disabled, sidesteps the rewrite; callers then only ever see a single
    # LogicalRDD, where constraint propagation works normally again.
    spark = out.sparkSession
    prev = spark.conf.get("spark.sql.constraintPropagation.enabled", "true")
    try:
        spark.conf.set("spark.sql.constraintPropagation.enabled", "false")
        out = out.localCheckpoint(eager=False)
    finally:
        spark.conf.set("spark.sql.constraintPropagation.enabled", prev)
    return SCCResult(labels=out, rounds=rnd, converged=converged)


def bowtie_decomposition(
    edges: DataFrame,
    max_rounds: int = 40,
    max_inner: int = 200,
    bfs_iters: int = 100,
    num_partitions: int | None = None,
) -> DataFrame:
    """Broder bow-tie decomposition of a directed graph: ``(id, region)``
    with region in {'SCC', 'IN', 'OUT', 'OTHER'} relative to the LARGEST
    strongly connected component (ties broken by smallest scc label).

    - 'SCC'   — the core (largest SCC);
    - 'IN'    — reaches the core but is not in it;
    - 'OUT'   — reachable from the core but not in it;
    - 'OTHER' — tendrils, tubes, and disconnected pieces.

    IN and OUT are provably disjoint: a vertex both reaching and reached by
    the core is mutually reachable with it and hence inside it. Composition
    of existing primitives, each scale-audited: SCC labels
    (:func:`strongly_connected_components`), then TWO multi-source BFS
    reachability fixpoints (forward on the edge set, backward on the
    reversed edge set) seeded with the whole core at once — frontier cost
    is O(reached), never |core| x reached. Driver traffic: one 1-row
    collect for the core label. Classification is two left joins over the
    label table — no extra shuffles beyond the BFS fixpoints.

    Reference scope: the accelerator computes plain PageRank
    (reference/src/pagerank.sv); bow-tie is the classic link-graph
    structural summary (Broder et al., "Graph structure in the Web") a
    production engine over the same tables is expected to serve.
    """
    from pagerank_spark.algos.paths import shortest_paths

    labels = strongly_connected_components(
        edges, max_rounds=max_rounds, max_inner=max_inner, num_partitions=num_partitions
    ).labels.localCheckpoint()
    core_row = (
        labels.groupBy("scc")
        .count()
        .orderBy(F.col("count").desc(), F.col("scc").asc())
        .limit(1)
        .collect()
    )
    if not core_row:
        return labels.select("id", F.lit("OTHER").alias("region"))
    core_id = core_row[0]["scc"]
    core = labels.filter(F.col("scc") == F.lit(core_id)).select("id").localCheckpoint()

    e = edges.select(
        F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst")
    )
    fwd = shortest_paths(e, core, max_iters=bfs_iters).select(
        "id", F.lit(1).alias("__fwd")
    )
    bwd = shortest_paths(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst")), core, max_iters=bfs_iters
    ).select("id", F.lit(1).alias("__bwd"))

    return (
        labels.join(fwd, "id", "left")
        .join(bwd, "id", "left")
        .select(
            "id",
            F.when(F.col("scc") == F.lit(core_id), F.lit("SCC"))
            .when(F.col("__bwd").isNotNull(), F.lit("IN"))
            .when(F.col("__fwd").isNotNull(), F.lit("OUT"))
            .otherwise(F.lit("OTHER"))
            .alias("region"),
        )
    )


def condensation_edges(
    edges: DataFrame,
    labels: DataFrame | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Edge list ``(src_scc, dst_scc)`` of the condensation DAG: vertices =
    SCC labels, one edge per ordered pair of distinct SCCs connected by at
    least one original edge. Always acyclic (the defining property of the
    condensation). ``labels`` lets callers reuse an already-computed
    ``(id, scc)`` table; otherwise SCC runs here.

    Scale shape: two hash joins of the edge table against the (small) label
    table on src then dst, a distinct on the contracted pairs — the same
    contract-graph pattern as graphstats.contract_graph, reused for the
    SCC quotient.
    """
    if labels is None:
        labels = strongly_connected_components(edges, num_partitions=num_partitions).labels
    lab = labels.select("id", "scc").localCheckpoint(eager=False)
    e = edges.select(
        F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst")
    )
    return (
        e.join(lab.select(F.col("id").alias("src"), F.col("scc").alias("src_scc")), "src")
        .join(lab.select(F.col("id").alias("dst"), F.col("scc").alias("dst_scc")), "dst")
        .filter(F.col("src_scc") != F.col("dst_scc"))
        .select("src_scc", "dst_scc")
        .dropDuplicates()
    )
