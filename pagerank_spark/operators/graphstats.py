"""One-pass structural summary of a directed edge table — the profiling
step that precedes any partitioning decision at 100 TB (skew bounds, salting
thresholds, broadcast eligibility all read off these numbers).

Everything is built-in Catalyst aggregates; each sub-count is a one-row
aggregate broadcast-joined into the final projection (in-plan scalars, no
driver actions), so the whole summary is ONE lazy plan over the
materialized deduplicated edge leaf. No collect, no UDFs, output is a
single row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def graph_summary(edges: DataFrame) -> DataFrame:
    """Single-row structural profile of a directed ``(src, dst)`` graph.

    Columns: ``n_vertices``, ``n_edges`` (distinct directed, loops
    included), ``n_self_loops``, ``n_undirected`` (simple-graph edges),
    ``n_reciprocal`` (distinct non-loop directed edges whose reverse also
    exists), ``reciprocity`` (n_reciprocal / non-loop directed edges),
    ``max_out_deg``, ``max_in_deg``, ``n_out_vertices`` (vertices with
    out-degree >= 1), ``avg_out_deg`` (over those vertices, 6 dp).
    """
    # the dedup leaf is referenced by every sub-aggregate below — one eager
    # materialization, then each branch reads the RDD leaf
    e = edges.select("src", "dst").dropDuplicates().localCheckpoint()

    nv = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .dropDuplicates()
        .agg(F.count(F.lit(1)).alias("n_vertices"))
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = (
        e.filter(F.col("src") != F.col("dst"))
        .join(rev.hint("shuffle_hash"), ["src", "dst"], "left_semi")
        .agg(F.count(F.lit(1)).alias("n_reciprocal"))
    )
    und = (
        e.filter(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .dropDuplicates()
        .agg(F.count(F.lit(1)).alias("n_undirected"))
    )
    out_stats = (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).alias("d"))
        .agg(
            F.max("d").alias("max_out_deg"),
            F.avg("d").alias("__avg_out"),
            F.count(F.lit(1)).alias("n_out_vertices"),
        )
    )
    in_stats = (
        e.groupBy("dst").agg(F.count(F.lit(1)).alias("d")).agg(F.max("d").alias("max_in_deg"))
    )
    base = e.agg(
        F.count(F.lit(1)).alias("n_edges"),
        F.sum(F.when(F.col("src") == F.col("dst"), 1).otherwise(0)).alias("n_self_loops"),
    )
    return (
        base.crossJoin(F.broadcast(nv))
        .crossJoin(F.broadcast(und))
        .crossJoin(F.broadcast(recip))
        .crossJoin(F.broadcast(out_stats))
        .crossJoin(F.broadcast(in_stats))
        .select(
            "n_vertices",
            "n_edges",
            "n_self_loops",
            "n_undirected",
            "n_reciprocal",
            F.round(
                F.col("n_reciprocal")
                / F.greatest((F.col("n_edges") - F.col("n_self_loops")).cast("double"), F.lit(1.0)),
                6,
            ).alias("reciprocity"),
            "max_out_deg",
            "max_in_deg",
            "n_out_vertices",
            F.round(F.col("__avg_out"), 6).alias("avg_out_deg"),
        )
    )


def bipartite_project(
    memberships: DataFrame,
    group_col: str,
    item_col: str,
    min_weight: int = 1,
    max_group_size: int | None = None,
) -> DataFrame:
    """Weighted one-mode projection of a bipartite membership table:
    ``(a, b, weight)`` with ``a < b`` and ``weight`` = number of groups
    containing both items — the recommender/co-occurrence preprocessing
    step (the copurchase gate graph is this projection with weight
    discarded, sources/graphs.py:109).

    Scale shape: one self-join co-partitioned on the group key + one
    grouped count on the pair key. The quadratic hazard is a hub GROUP
    (size g contributes g^2/2 pairs); ``max_group_size`` drops groups
    above the cap BEFORE the self-join (one pre-aggregated semi-join) —
    the standard mitigation, since a group with thousands of members
    contributes near-zero signal per pair while dominating the shuffle.
    ``min_weight`` prunes the long tail AFTER the count (predicate on the
    aggregate, map-side partially applied).
    """
    m = memberships.select(
        F.col(group_col).alias("g"), F.col(item_col).alias("i")
    ).dropDuplicates()
    if max_group_size is not None:
        ok = (
            m.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") <= max_group_size)
            .select("g")
        )
        m = m.join(ok, "g", "left_semi")
    a = m.select(F.col("g"), F.col("i").alias("a"))
    b = m.select(F.col("g"), F.col("i").alias("b"))
    return (
        a.join(b, "g")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("weight"))
        .filter(F.col("weight") >= min_weight)
    )


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """One-row degree-assortativity coefficient of the undirected simple
    graph: the Pearson correlation between the degrees at either end of
    every edge, each undirected edge counted once per direction (the
    standard symmetric estimator). Positive = hubs attach to hubs;
    negative = hub-leaf (star-like) mixing. Plan: one degree aggregate,
    two V-sized joins onto the symmetrized edge list, one corr() aggregate
    — no driver math."""
    und = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates()
        .localCheckpoint()
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .unionByName(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    sym = und.unionByName(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("__da"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("__db"))
    return (
        sym.join(da.hint("shuffle_hash"), "a")
        .join(db.hint("shuffle_hash"), "b")
        .agg(F.round(F.corr(F.col("__da").cast("double"), F.col("__db").cast("double")), 6).alias("assortativity"))
    )


def reciprocity(edges: DataFrame) -> DataFrame:
    """One-row ``(n_directed, n_reciprocal, reciprocity)``: the fraction of
    distinct directed edges whose reverse edge also exists (self-loops
    excluded) — the standard directed-graph symmetry statistic. One
    self-join co-partitioned on the reversed key."""
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    n = e.count()
    r = e.join(rev, ["src", "dst"], "left_semi").count()
    return e.sparkSession.createDataFrame(
        [(n, r, round(r / n, 6) if n else 0.0)],
        "n_directed long, n_reciprocal long, reciprocity double",
    )


def dyad_census(edges: DataFrame) -> DataFrame:
    """Holland-Leinhardt dyad census (mutual / asymmetric / null) of the
    directed simple graph — one row ``(n_vertices, mutual, asym,
    null_dyads)``, all exact BIGINTs.

    One grouped count over the undirected key (the direction multiplicity
    per unordered pair is 1 or 2), no self-join: ``mutual`` = pairs seen in
    both directions, ``asym`` = pairs seen in one, ``null`` =
    ``C(n, 2) - mutual - asym`` by arithmetic. Scale: a single shuffle on
    the unordered pair key plus a distinct-vertex count."""
    e = (
        edges.select("src", "dst")
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )
    und = e.groupBy(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).agg(F.count(F.lit(1)).alias("dirs"))
    counts = und.agg(
        F.sum(F.when(F.col("dirs") == 2, 1).otherwise(0)).alias("mutual"),
        F.sum(F.when(F.col("dirs") == 1, 1).otherwise(0)).alias("asym"),
    )
    verts = (
        e.select(F.col("src").alias("id"))
        .unionByName(e.select(F.col("dst").alias("id")))
        .agg(F.countDistinct("id").alias("n_vertices"))
    )
    return verts.crossJoin(counts).select(
        "n_vertices",
        F.coalesce("mutual", F.lit(0)).alias("mutual"),
        F.coalesce("asym", F.lit(0)).alias("asym"),
        (
            F.expr("n_vertices * (n_vertices - 1) div 2")
            - F.coalesce("mutual", F.lit(0))
            - F.coalesce("asym", F.lit(0))
        ).cast("long").alias("null_dyads"),
    )


def rich_club(edges: DataFrame, ks: list[int]) -> DataFrame:
    """Rich-club curve of the undirected simple graph: for each degree
    threshold ``k``, the subgraph induced on vertices of degree > k —
    ``(k, n_k, e_k, phi_micro)`` with ``phi = 2 e_k / (n_k (n_k - 1))``
    emitted as exact integer micro-units (``2 e_k * 1e6 div n_k (n_k-1)``).

    Zhou & Mondragón 2004 (public methodology): a rising phi(k) means
    hubs preferentially interconnect. All thresholds are evaluated in ONE
    pass each over the degree and edge tables: the k list is exploded from
    a literal array and broadcast-joined, so the plan is two grouped
    aggregates regardless of how many thresholds are requested — no
    per-k driver loop.
    """
    und = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .unionByName(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    kdf = und.sparkSession.createDataFrame([(int(k),) for k in ks], "k int")
    nk = (
        deg.crossJoin(F.broadcast(kdf))
        .filter(F.col("deg") > F.col("k"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n_k"))
    )
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("db"))
    ek = (
        und.join(da, "a")
        .join(db, "b")
        .crossJoin(F.broadcast(kdf))
        .filter((F.col("da") > F.col("k")) & (F.col("db") > F.col("k")))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("e_k"))
    )
    return (
        nk.join(ek, "k", "left")
        .select(
            "k",
            "n_k",
            F.coalesce("e_k", F.lit(0)).alias("e_k"),
            F.expr(
                "IF(n_k < 2, 0L, 2 * coalesce(e_k, 0L) * 1000000 div (n_k * (n_k - 1)))"
            ).alias("phi_micro"),
        )
    )


def contract_graph(
    edges: DataFrame,
    mapping: DataFrame,
    drop_self_loops: bool = True,
) -> DataFrame:
    """Quotient (contracted) graph: collapse vertices into groups and return
    the weighted supergraph ``(src, dst, w)`` where ``w`` counts the original
    edges mapped onto each group pair — the page-graph → host-graph rollup
    of web link analysis (WebGraph's host quotient; Louvain's contraction
    phase is the community-keyed instance of the same operator, see
    algos/louvain.py).

    ``mapping``: ``(id, group)`` — must cover every endpoint (inner joins;
    unmapped endpoints drop their edges, so callers own completeness).
    ``drop_self_loops``: intra-group edges are usually noise for inter-host
    analysis; keep them for volume accounting with ``False``.

    Scale shape: two hash joins (one per endpoint — each shuffles the edge
    table on a key it already needs) + ONE map-side-combined count. The
    supergraph is |groups|-sized, typically orders of magnitude smaller, so
    downstream iterative algorithms (hostrank) run on the contracted table.
    The mapping side is groupBy-free and broadcastable when hosts << pages —
    Catalyst/AQE picks that automatically from its size.
    """
    m_src = mapping.select(F.col("id").alias("src"), F.col("group").alias("__gs"))
    m_dst = mapping.select(F.col("id").alias("dst"), F.col("group").alias("__gd"))
    g = (
        edges.select("src", "dst")
        .join(m_src, "src")
        .join(m_dst, "dst")
        .select(F.col("__gs").alias("src"), F.col("__gd").alias("dst"))
    )
    if drop_self_loops:
        g = g.filter(F.col("src") != F.col("dst"))
    return g.groupBy("src", "dst").agg(F.count(F.lit(1)).alias("w"))


def hill_alpha(edges: DataFrame, d_min: int = 2) -> DataFrame:
    """Hill (MLE) estimate of the degree-distribution power-law exponent:

        alpha = 1 + n / sum over deg >= d_min of ln(deg / d_min)

    over the undirected simple graph's degree sequence — the one-pass
    closed-form tail estimator (Clauset-Shalizi-Newman family) a graph
    profile reports next to the moments in :func:`graph_summary`. Returns
    ``(n_tail, alpha)``; degrees below ``d_min`` are outside the modeled
    tail. Plan: the degree aggregate then ONE global agg — no sort, no
    quantile pass."""
    und = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates(["a", "b"])
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .unionByName(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
        .filter(F.col("deg") >= d_min)
    )
    return deg.agg(
        F.count(F.lit(1)).alias("n_tail"),
        F.round(
            1.0 + F.count(F.lit(1)) / F.sum(F.log(F.col("deg") / F.lit(float(d_min)))),
            6,
        ).alias("alpha"),
    )


def sample_subgraph(edges: DataFrame, pct: int, salt: int = 0) -> DataFrame:
    """Deterministic vertex-induced subgraph: keep vertices whose Knuth
    hash bucket is < ``pct`` (of 100) and the edges BETWEEN kept vertices —
    the debugging/estimation subsample that preserves within-sample
    structure (unlike edge sampling, which destroys triangles and degree
    correlations). Pure arithmetic on ids: stable under repartitioning and
    replayable in SQL, like packing.hash_split."""
    from .packing import KNUTH

    def keep(col):
        return F.pmod(F.pmod((F.col(col) + F.lit(salt)) * F.lit(KNUTH), F.lit(1 << 32)), F.lit(100)) < pct

    return edges.filter(keep("src") & keep("dst"))


def _triad_class(c12: int, c13: int, c23: int) -> str:
    """Name the triad on vertices (0,1,2) given dyad codes (1 = low->high
    only, 2 = high->low only, 3 = mutual, 0 = null). Naming follows the
    igraph/Holland–Leinhardt convention (003..300 with D/U/C/T suffixes)."""
    arcs = set()
    for (x, y), c in (((0, 1), c12), ((0, 2), c13), ((1, 2), c23)):
        if c & 1:
            arcs.add((x, y))
        if c & 2:
            arcs.add((y, x))
    pairs = [(0, 1), (0, 2), (1, 2)]
    mut = [(x, y) for x, y in pairs if (x, y) in arcs and (y, x) in arcs]
    asym = [
        (s, t)
        for s, t in [(x, y) for x, y in pairs] + [(y, x) for x, y in pairs]
        if (s, t) in arcs and (t, s) not in arcs
    ]
    m, a = len(mut), len(asym)
    null = 3 - m - a
    base = f"{m}{a}{null}"
    if base in {"003", "012", "102", "201", "210", "300"}:
        return base
    if base == "021":
        (s1, t1), (s2, t2) = asym
        if s1 == s2:
            return "021D"
        if t1 == t2:
            return "021U"
        return "021C"
    if base == "111":
        (s, t) = asym[0]
        return "111U" if s in set(mut[0]) else "111D"
    if base == "030":
        outdeg = {v: sum(1 for s, _ in asym if s == v) for v in (0, 1, 2)}
        return "030C" if all(outdeg[v] == 1 for v in (0, 1, 2)) else "030T"
    if base == "120":
        w = next(v for v in (0, 1, 2) if v not in set(mut[0]))
        if all(s == w for s, _ in asym):
            return "120D"
        if all(t == w for _, t in asym):
            return "120U"
        return "120C"
    raise AssertionError(f"unclassifiable dyad codes {c12},{c13},{c23}")


TRIAD_TYPES = [
    "003", "012", "102", "021D", "021U", "021C", "111D", "111U",
    "030T", "030C", "201", "120D", "120U", "120C", "210", "300",
]

# base-4 triple code (c12*16 + c13*4 + c23) -> class name, for all 64 codes
TRIAD_CODE_NAMES: dict[int, str] = {
    c12 * 16 + c13 * 4 + c23: _triad_class(c12, c13, c23)
    for c12 in range(4)
    for c13 in range(4)
    for c23 in range(4)
}


def triad_census(edges: DataFrame) -> DataFrame:
    """Exact Holland–Leinhardt 16-type triad census of a simple digraph.

    Returns ``(triad, cnt)`` — one row per type, zeros included. Strategy
    (the classic wedge-bounded decomposition; Batagelj & Mrvar 2001):

    - triads with >= 2 non-null dyads are exactly the triples that appear
      as a wedge of the undirected support graph — enumerate DISTINCT
      sorted triples from the per-center neighbor self-join (cost bounded
      by sum(deg^2), the triangle-counting bound, NOT n^3), then decode
      each triple's three dyad codes with three broadcast-friendly joins
      and classify via the precomputed 64-entry code map;
    - triads with exactly ONE non-null dyad never appear in a wedge; their
      count per dyad (a, b) is closed-form: ``n - ud(a) - ud(b) + cn(a,b)``
      (third vertices adjacent to neither endpoint), with ``cn`` the
      common-neighbor count — one aggregation over the same wedge join.
      Asymmetric dyads feed 012, mutual dyads feed 102;
    - 003 (empty) = C(n, 3) minus everything else.

    All arithmetic is exact BIGINT, so the ``triad_census_synth`` gate
    hash-matches its DuckDB restatement with no normalization.
    """
    spark = edges.sparkSession
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst")).dropDuplicates()
    dy = (
        e.groupBy(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .agg(
            F.max(F.when(F.col("src") < F.col("dst"), 1).otherwise(0)).alias("f"),
            F.max(F.when(F.col("src") > F.col("dst"), 1).otherwise(0)).alias("g"),
        )
        .select("a", "b", (F.col("f") + 2 * F.col("g")).alias("code"))
    ).localCheckpoint()  # plan barrier: dy feeds 6+ downstream legs and 3
    # driver actions; without it an expensive upstream edge plan (e.g. the
    # 28-way planted-union synth graph) re-executes per action (25s -> 3s)
    adj = dy.select(F.col("a").alias("u"), F.col("b").alias("w")).unionByName(
        dy.select(F.col("b").alias("u"), F.col("a").alias("w"))
    )
    n = adj.select("u").distinct().count()

    x, y = adj.alias("x"), adj.alias("y")
    wedges = x.join(y, (F.col("x.u") == F.col("y.u")) & (F.col("x.w") < F.col("y.w"))).select(
        F.col("x.w").alias("p"), F.col("y.w").alias("q"), F.col("x.u").alias("c")
    )
    tri = (
        wedges.select(
            F.least("p", "q", "c").alias("t1"),
            (F.col("p") + F.col("q") + F.col("c")
             - F.least("p", "q", "c") - F.greatest("p", "q", "c")).alias("t2"),
            F.greatest("p", "q", "c").alias("t3"),
        )
        .dropDuplicates()
    )
    d12 = dy.select(F.col("a").alias("t1"), F.col("b").alias("t2"), F.col("code").alias("c12"))
    d13 = dy.select(F.col("a").alias("t1"), F.col("b").alias("t3"), F.col("code").alias("c13"))
    d23 = dy.select(F.col("a").alias("t2"), F.col("b").alias("t3"), F.col("code").alias("c23"))
    coded = (
        tri.join(d12, ["t1", "t2"], "left")
        .join(d13, ["t1", "t3"], "left")
        .join(d23, ["t2", "t3"], "left")
        .select(
            (
                F.coalesce("c12", F.lit(0)) * 16
                + F.coalesce("c13", F.lit(0)) * 4
                + F.coalesce("c23", F.lit(0))
            ).alias("code64")
        )
    )
    name_map = F.create_map(
        *[F.lit(v) for kv in TRIAD_CODE_NAMES.items() for v in kv]
    )
    conn = coded.select(name_map[F.col("code64")].alias("triad")).groupBy("triad").agg(
        F.count(F.lit(1)).alias("cnt")
    )

    ud = adj.groupBy("u").agg(F.count(F.lit(1)).alias("c"))
    cn = wedges.groupBy(F.col("p").alias("a"), F.col("q").alias("b")).agg(
        F.count(F.lit(1)).alias("c")
    )
    singles = (
        dy.join(ud.select(F.col("u").alias("a"), F.col("c").alias("ca")), "a")
        .join(ud.select(F.col("u").alias("b"), F.col("c").alias("cb")), "b")
        .join(cn, ["a", "b"], "left")
        .select(
            F.when(F.col("code") == 3, F.lit("102")).otherwise(F.lit("012")).alias("triad"),
            (F.lit(n) - F.col("ca") - F.col("cb") + F.coalesce(F.col("c"), F.lit(0))).alias("k"),
        )
        .groupBy("triad")
        .agg(F.sum("k").alias("cnt"))
    )

    counted = conn.unionByName(singles).groupBy("triad").agg(F.sum("cnt").alias("cnt"))
    total_nonempty = counted.agg(F.coalesce(F.sum("cnt"), F.lit(0))).first()[0] or 0
    empty = n * (n - 1) * (n - 2) // 6 - int(total_nonempty)
    names = spark.createDataFrame([(t,) for t in TRIAD_TYPES], "triad string")
    return (
        names.join(counted, "triad", "left")
        .select(
            "triad",
            F.coalesce(
                F.col("cnt"),
                F.when(F.col("triad") == "003", F.lit(int(empty))).otherwise(F.lit(0)),
            ).cast("long").alias("cnt"),
        )
    )


def wl_refinement(edges: DataFrame, rounds: int = 3, num_partitions: int = 32) -> DataFrame:
    """Weisfeiler-Leman color refinement over the UNDIRECTED simple graph:
    ``(id, color)`` after ``rounds`` iterations, ``color_0 = degree`` and
    ``color_{t+1} = fold(h*1000003 + x mod 2147483647)`` over
    ``[color_t(v)] ++ sorted(colors of neighbors)``.

    The color histogram is the classic 1-WL graph fingerprint (graph-dedup /
    isomorphism screening); stable color classes are structural roles.

    Exact-integer and order-independent (neighbor colors are array_sort-ed
    before the fold), so a SQL oracle replays it bit-for-bit with
    list_reduce. Scale shape per round: one hash join of colors onto the
    symmetrized edge list (shuffled once on dst up front), one groupBy(src)
    collect_list — the same message-aggregate pattern as every superstep in
    algos/, with state truncated per round via localCheckpoint. The fold
    itself is a codegen'd higher-order aggregate, no UDFs.
    """
    sym = (
        edges.select(F.col("src").cast("long").alias("src"), F.col("dst").cast("long").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .unionByName(
            edges.select(
                F.col("dst").cast("long").alias("src"), F.col("src").cast("long").alias("dst")
            ).filter(F.col("src") != F.col("dst"))
        )
        .dropDuplicates(["src", "dst"])
        .repartition(num_partitions, "dst")
        .localCheckpoint()
    )
    colors = (
        sym.groupBy("src").agg(F.count(F.lit(1)).alias("c")).withColumnRenamed("src", "id")
    ).localCheckpoint()
    fold = "(h, x) -> (h * 1000003 + x) % 2147483647"
    for _ in range(rounds):
        nb = (
            sym.join(colors.select(F.col("id").alias("dst"), F.col("c").alias("nc")), "dst")
            .groupBy("src")
            .agg(F.array_sort(F.collect_list("nc")).alias("ncs"))
            .withColumnRenamed("src", "id")
        )
        colors = (
            colors.join(nb, "id")
            .select(
                "id",
                F.expr(
                    f"aggregate(concat(array(c), ncs), CAST(0 AS BIGINT), {fold})"
                ).alias("c"),
            )
        ).localCheckpoint()
    return colors.select("id", F.col("c").alias("color"))


def cocitation(
    edges: DataFrame,
    mode: str = "cocitation",
    min_weight: int = 1,
    max_hub_degree: int | None = None,
) -> DataFrame:
    """Co-citation (Small 1973) / bibliographic-coupling (Kessler 1963)
    strengths of a directed citation/link graph — the classic link-analysis
    similarity the reference's rank kernel sits on top of (related-page
    discovery over the same edge table the accelerator streams,
    /root/reference/src/pagerank.v's CSR edges).

    ``mode="cocitation"``: weight(a, b) = number of distinct sources that
    cite BOTH a and b (pairs over shared ``src``). ``mode="coupling"``:
    weight(a, b) = number of distinct targets cited by both (pairs over
    shared ``dst``). Either is exactly :func:`bipartite_project` with the
    shared endpoint as the group key, so the hub cap (a source citing
    thousands of pages, a page cited by everything) reuses the same
    pre-join group filter — the quadratic hazard and its mitigation are
    identical.

    Output adds the endpoint "citation degrees" (distinct group count per
    item — in-degree for cocitation, out-degree for coupling) and the
    exact-integer micro-scaled SQUARED cosine similarity
    ``cos2_micro = (w^2 * 1e6) div (deg_a * deg_b)`` — monotone in the
    usual cosine normalization ``w / sqrt(deg_a * deg_b)`` but free of
    sqrt, so the gate hash is pure BIGINT arithmetic on both engines.
    """
    if mode not in ("cocitation", "coupling"):
        raise ValueError(f"mode must be cocitation|coupling, got {mode!r}")
    group, item = ("src", "dst") if mode == "cocitation" else ("dst", "src")
    e = edges.select(group, item).filter(F.col("src") != F.col("dst"))
    pairs = bipartite_project(
        e, group, item, min_weight=min_weight, max_group_size=max_hub_degree
    )
    deg = (
        e.dropDuplicates()
        .groupBy(F.col(item).alias("id"))
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    return (
        pairs.join(deg.select(F.col("id").alias("a"), F.col("deg").alias("deg_a")), "a")
        .join(deg.select(F.col("id").alias("b"), F.col("deg").alias("deg_b")), "b")
        .select(
            "a",
            "b",
            "weight",
            "deg_a",
            "deg_b",
            F.expr("(weight * weight * 1000000) div (deg_a * deg_b)").alias(
                "cos2_micro"
            ),
        )
    )


def avg_neighbor_degree(edges: DataFrame) -> DataFrame:
    """Degree-correlation curve knn(d) (Pastor-Satorras et al. 2001): for
    each undirected degree class d, the mean degree of the neighbors of
    degree-d vertices — THE summary that says whether hubs attach to hubs
    (assortative, knn rising) or to leaves (disassortative, falling);
    the curve form of :func:`degree_assortativity`'s single coefficient.

    Exact integers end to end: one undirected-degree aggregate, two
    V-sized joins onto the symmetrized edge list, one grouped sum; the
    mean is emitted micro-scaled by integer division. Returns
    ``(deg, n_edge_ends, sum_nbr_deg, knn_micro)``.
    """
    und = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates()
        .localCheckpoint()
    )
    deg = (
        und.select(F.col("a").alias("id"))
        .unionByName(und.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    sym = und.unionByName(und.select(F.col("b").alias("a"), F.col("a").alias("b")))
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("__da"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("__db"))
    return (
        sym.join(da.hint("shuffle_hash"), "a")
        .join(db.hint("shuffle_hash"), "b")
        .groupBy(F.col("__da").alias("deg"))
        .agg(
            F.count(F.lit(1)).alias("n_edge_ends"),
            F.sum("__db").alias("sum_nbr_deg"),
        )
        .select(
            "deg",
            "n_edge_ends",
            "sum_nbr_deg",
            F.expr("(sum_nbr_deg * 1000000) div n_edge_ends").alias("knn_micro"),
        )
    )


def burt_constraint(edges: DataFrame) -> DataFrame:
    """Burt's network constraint (Burt 1992, "Structural Holes") per
    vertex over the undirected simple graph — the brokerage metric: low
    constraint = the vertex bridges otherwise-disconnected neighbors
    (spans structural holes), high = its contacts are redundant.

    ``c_i = sum_{j in N(i)} (p_ij + sum_{q in N(i) cap N(j)} p_iq p_qj)^2``
    with uniform proportional weights ``p_ij = 1/d_i``. Computed in
    deterministic fixed point: per-vertex reciprocal ``r = 1e9 DIV d``
    (nano), the indirect mass ``S_ij = sum_q r_q`` an exact integer sum,
    the dyadic term ``u_ij = (1e9 + S_ij) DIV d_i`` (nano), and
    ``c_i = sum_j (u_ij^2 DIV 1e6)`` (micro-of-squared-nano = pico);
    every step is BIGINT with one fixed truncation point, so the output
    is bit-stable across engines (same contract as the repo's other
    micro-unit gates; u <= ~2e9 keeps u^2 under 2^62).

    Plan shape: the indirect term is the wedge enumeration triangles use
    (two co-partitioned joins on the middle vertex q, then a semi filter
    to adjacent (i, j) pairs) — cost tracks closed wedges, the same
    skew profile as triangle counting, so the same degree-ordering /
    hub-cap mitigations apply upstream. Direct terms come from the edge
    list itself; vertices with no triangles still pay ``d * (1/d)^2``.
    Returns ``(id, deg, constraint_pico)``.
    """
    und = (
        edges.select(F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .dropDuplicates()
        .localCheckpoint()
    )
    nbr = und.unionByName(
        und.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint()
    deg = nbr.groupBy(F.col("a").alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    r = deg.select(F.col("id"), F.expr("1000000000 DIV deg").alias("rq"))
    # wedges i-q-j (i != j), keep only adjacent (i, j): S_ij = sum_q rq
    iq = nbr.select(F.col("a").alias("i"), F.col("b").alias("q"))
    qj = nbr.select(F.col("a").alias("q"), F.col("b").alias("j"))
    wedges = (
        iq.join(qj.hint("shuffle_hash"), "q")
        .filter(F.col("i") != F.col("j"))
        .join(r.select(F.col("id").alias("q"), "rq"), "q")
        .join(
            nbr.select(F.col("a").alias("i"), F.col("b").alias("j")),
            ["i", "j"],
            "left_semi",
        )
        .groupBy("i", "j")
        .agg(F.sum("rq").alias("s_ij"))
    )
    dyads = (
        nbr.select(F.col("a").alias("i"), F.col("b").alias("j"))
        .join(wedges, ["i", "j"], "left")
        .join(deg.select(F.col("id").alias("i"), "deg"), "i")
        .select(
            "i",
            "deg",
            F.expr(
                "((1000000000 + coalesce(s_ij, 0L)) DIV deg)"
            ).alias("u"),
        )
    )
    return (
        dyads.groupBy(F.col("i").alias("id"), "deg")
        .agg(F.sum(F.expr("(u * u) DIV 1000000")).alias("constraint_pico"))
        .select("id", F.col("deg").cast("long").alias("deg"), "constraint_pico")
    )


def partition_quality(
    edges: DataFrame, p: int = 32, salt: int = 0
) -> DataFrame:
    """Edge-cut / balance / communication-volume report for a hash vertex
    partitioning ``part(v) = (v * KNUTH + salt) mod p`` — the diagnostic a
    100-TB graph job runs BEFORE committing to a layout (the reference
    pins this decision in hardware: pagerank.v streams a fixed CSR block
    split; here placement is a knob and this operator scores it).

    Three exact-integer aggregates over one derived edge projection:

    - ``edge_cut``: edges whose endpoints land in different parts — each
      is one remote message per PageRank superstep;
    - ``balance_micro``: max part vertex-count over mean (x1e6) — the
      straggler bound;
    - ``comm_volume``: sum over vertices of (distinct remote parts its
      edges touch) — the vertex-cut replication cost (Gonzalez et al.
      2012's metric), what a broadcast/mirror scheme would ship.

    Returns one row ``(p, n_vertices, n_edges, edge_cut, cut_micro,
    max_part, balance_micro, comm_volume)``.
    """
    knuth = 2654435761
    e = edges.select("src", "dst").dropDuplicates().localCheckpoint()
    # pre-mod to 31 bits before the Knuth multiply: keeps the product under
    # 2^62 for u64 vertex ids (ANSI mode makes BIGINT overflow an error)
    part = lambda c: F.pmod(  # noqa: E731
        F.pmod(F.col(c), F.lit(1 << 31)) * knuth + salt, F.lit(p)
    )
    ep = e.select(
        "src", "dst", part("src").alias("ps"), part("dst").alias("pd")
    ).localCheckpoint()
    v = (
        ep.select(F.col("src").alias("id"), F.col("ps").alias("part"))
        .unionByName(ep.select(F.col("dst").alias("id"), F.col("pd").alias("part")))
        .dropDuplicates()
    )
    parts = v.groupBy("part").agg(F.count(F.lit(1)).alias("n"))
    bal = parts.groupBy().agg(
        F.max("n").alias("__mx"), F.sum("n").alias("__nv"), F.count(F.lit(1)).alias("__np")
    )
    cut = ep.groupBy().agg(
        F.count(F.lit(1)).alias("__ne"),
        F.sum(F.when(F.col("ps") != F.col("pd"), 1).otherwise(0)).alias("__cut"),
    )
    # vertex-cut comm volume: distinct remote parts each vertex's edges touch
    remote = (
        ep.filter(F.col("ps") != F.col("pd"))
        .select(F.col("src").alias("id"), F.col("pd").alias("rp"))
        .unionByName(
            ep.filter(F.col("ps") != F.col("pd")).select(
                F.col("dst").alias("id"), F.col("ps").alias("rp")
            )
        )
        .dropDuplicates()
        .groupBy()
        .agg(F.count(F.lit(1)).alias("__cv"))
    )
    return (
        cut.crossJoin(F.broadcast(bal))
        .crossJoin(F.broadcast(remote))
        .select(
            F.lit(p).cast("long").alias("p"),
            F.col("__nv").cast("long").alias("n_vertices"),
            F.col("__ne").cast("long").alias("n_edges"),
            F.col("__cut").cast("long").alias("edge_cut"),
            F.expr("(__cut * 1000000) div __ne").alias("cut_micro"),
            F.col("__mx").cast("long").alias("max_part"),
            F.expr("(__mx * __np * 1000000) div __nv").alias("balance_micro"),
            F.col("__cv").cast("long").alias("comm_volume"),
        )
    )


def graph_growth(tedges: DataFrame, t_col: str = "t") -> DataFrame:
    """Graph evolution profile over a timestamped edge stream: per period
    ``t``, how many never-seen-before edges and vertices appear, and the
    cumulative totals — the densification/"forest fire" tracking curve
    (Leskovec et al. 2005: E(t) vs V(t) slopes reveal superlinear edge
    growth), and operationally the capacity forecast for an incrementally
    refreshed link graph (plans/checkpoint.py's warm-start path).

    Exact integers: first-seen period per distinct edge = one min-agg,
    per vertex = min over both endpoints; per-period news are grouped
    counts; cumulatives are a window over the PERIOD table — a
    single-partition window by construction, bounded by the number of
    periods (days/weeks), not the data, so it is scale-safe where a
    row-level global window would not be.

    Returns ``(t, new_edges, new_vertices, cum_edges, cum_vertices)``.
    """
    t = F.col(t_col).cast("long")
    e_first = (
        tedges.select("src", "dst", t.alias("__t"))
        .filter(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.min("__t").alias("__ft"))
    ).localCheckpoint()
    v_first = (
        e_first.select(F.col("src").alias("id"), "__ft")
        .unionByName(e_first.select(F.col("dst").alias("id"), "__ft"))
        .groupBy("id")
        .agg(F.min("__ft").alias("__ft"))
    )
    per_e = e_first.groupBy(F.col("__ft").alias("t")).agg(
        F.count(F.lit(1)).alias("new_edges")
    )
    per_v = v_first.groupBy(F.col("__ft").alias("t")).agg(
        F.count(F.lit(1)).alias("new_vertices")
    )
    days = per_e.join(per_v, "t", "full").select(
        "t",
        F.coalesce("new_edges", F.lit(0)).cast("long").alias("new_edges"),
        F.coalesce("new_vertices", F.lit(0)).cast("long").alias("new_vertices"),
    )
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    return days.select(
        "t",
        "new_edges",
        "new_vertices",
        F.sum("new_edges").over(w).cast("long").alias("cum_edges"),
        F.sum("new_vertices").over(w).cast("long").alias("cum_vertices"),
    )


def compress_chains(edges: DataFrame, rounds: int = 8) -> DataFrame:
    """Chain (unary-path) compression of a directed simple graph: every
    maximal run of degree-(1,1) vertices collapses to a single edge from
    the run's entry vertex to its terminal — the structure-preserving
    shrink step web-graph and transcript-graph pipelines run before
    expensive algorithms (a reply chain IS a unary path; compressing it
    leaves the branching skeleton).

    Synchronous pointer doubling (the Wyllie list-ranking jump): chain
    vertices start pointing at their unique successor; each round jumps
    ``t(v) <- t(t(v))`` while the target is still a chain vertex, so a
    chain of length L resolves in ceil(log2 L) rounds — ``rounds=8``
    covers length 256; longer chains stop early and keep a partial hop
    (documented, not silent: callers size ``rounds`` to their diameter).
    Each round is one self-join on the pointer key + localCheckpoint —
    the same superstep contract as the engine's other fixpoints.

    Semantics: non-chain vertices keep their edges, with targets rewritten
    to the chain terminal; intra-chain edges disappear; a pure 2-regular
    ring (every vertex degree-(1,1), no external entry) has no entry edge
    and is dropped whole — it carries no connection to the rest of the
    graph. Returns the compressed ``(src, dst)`` edge list. A cycle that
    runs through one branching vertex ``a`` collapses to the self-loop
    ``(a, a)`` — cycle existence is preserved, by design. Input self-loops
    are dropped before degree counting (they would corrupt chain status).
    """
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst")).dropDuplicates().localCheckpoint()
    outd = e.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("o"), F.max("dst").alias("succ")
    )
    ind = e.groupBy(F.col("dst").alias("id")).agg(F.count(F.lit(1)).alias("i"))
    chain = (
        outd.join(ind, "id")
        .filter((F.col("o") == 1) & (F.col("i") == 1))
        .select("id", "succ")
        .localCheckpoint()
    )
    # t(v): current resolved target for chain vertices; non-chain absent
    t = chain.select("id", F.col("succ").alias("t"))
    cset = chain.select(F.col("id").alias("__c"))
    for _ in range(rounds):
        nxt = t.select(F.col("id").alias("__tid"), F.col("t").alias("__tt"))
        t = (
            t.join(nxt, t["t"] == nxt["__tid"], "left")
            .select("id", F.coalesce("__tt", "t").alias("t"))
            .localCheckpoint()
        )
    entry = e.join(cset, e["src"] == cset["__c"], "left_anti")
    rewritten = (
        entry.join(t.select(F.col("id").alias("dst"), "t"), "dst", "left")
        .select("src", F.coalesce("t", F.col("dst")).alias("dst"))
        .dropDuplicates()
    )
    return rewritten


def collective_influence(edges: DataFrame, cap_degree: int | None = None) -> DataFrame:
    """Collective influence at radius 2 (Morone & Makse 2015, Nature —
    public methodology): ``CI(v) = (k_v - 1) * sum over the EXACT
    distance-2 frontier of (k_w - 1)`` — the optimal-percolation
    influencer score; greedily removing top-CI vertices fragments a
    network far faster than degree or PageRank order. Undirected input
    ``(src, dst)``.

    Shape: symmetrize; one neighbor-of-neighbor self-join (shuffled on
    the middle vertex — at 100-TB scale this is the one quadratic-in-hub
    step, so ``cap_degree`` optionally drops hubs above the cap from the
    MIDDLE position, the bipartite_project guard, logged not silent);
    frontier = NN pairs minus direct neighbors (anti-join) minus self;
    one degree join + grouped sum. All exact BIGINTs. Returns
    ``(id, degree, ci)`` — leaves score 0 (k-1 = 0), isolated frontier
    likewise.
    """
    sym = edges.select(F.col("src").alias("a"), F.col("dst").alias("b")).unionByName(
        edges.select(F.col("dst").alias("a"), F.col("src").alias("b"))
    ).distinct()
    deg = sym.groupBy(F.col("a").alias("id")).agg(F.count(F.lit(1)).alias("k"))
    mid = sym
    if cap_degree is not None:
        hot = deg.filter(F.col("k") > int(cap_degree))
        n_hot = hot.count()
        if n_hot:
            print(f"collective_influence: dropping {n_hot} hub middles above degree {cap_degree}")
        mid = sym.join(
            hot.select(F.col("id").alias("a")), "a", "left_anti"
        )
    x = mid.select(F.col("a").alias("v"), F.col("b").alias("m"))
    y = sym.select(F.col("a").alias("m"), F.col("b").alias("w"))
    n2 = (
        x.join(y, "m")
        .filter(F.col("w") != F.col("v"))
        .select("v", "w")
        .distinct()
    )
    frontier = n2.join(
        sym.select(F.col("a").alias("v"), F.col("b").alias("w")), ["v", "w"], "left_anti"
    )
    s = (
        frontier.join(deg.select(F.col("id").alias("w"), F.col("k").alias("kw")), "w")
        .groupBy(F.col("v").alias("id"))
        .agg(F.sum(F.col("kw") - 1).alias("s"))
    )
    return deg.join(s, "id", "left").select(
        "id",
        F.col("k").cast("long").alias("degree"),
        ((F.col("k") - 1) * F.coalesce(F.col("s"), F.lit(0))).cast("long").alias("ci"),
    )


def oddball_egonet(edges: DataFrame) -> DataFrame:
    """OddBall egonet anomaly scores (Akoglu, McGlohon & Faloutsos 2010,
    PAKDD — public methodology): for each vertex the radius-1 egonet has
    ``n = deg + 1`` nodes and ``e = deg + triangles(v)`` edges; across a
    real graph ``e ~ a * n^b`` (the Egonet Density Power Law), and a
    vertex's anomaly score is its |log-residual| from that fit — near-star
    egonets (e ≈ n-1, telemarketers/bots) and near-clique egonets
    (e ≈ n^2, spam farms) stand out in opposite directions.

    Exactness: per-vertex ``ln n`` / ``ln e`` are MILLI-rounded once
    (3-decimal precision is ample for an anomaly score and keeps every
    OLS moment an exact overflow-safe BIGINT: |ln|<=45 -> milli<=4.5e4;
    squared-products sum within 2^63 up to ~4e12 vertices); the fit is
    the closed-form d=2 OLS double tree over those integers, and each
    residual is one fixed double expression micro-rounded once. Per-vertex
    triangles come from the engine's oriented-intersection kernel; degrees
    from one grouped count. Returns
    ``(id, n_ego, e_ego, score_micro)``.
    """
    from ..algos.triangles import triangles_per_vertex

    sym = edges.select(F.col("src").alias("a"), F.col("dst").alias("b")).unionByName(
        edges.select(F.col("dst").alias("a"), F.col("src").alias("b"))
    ).distinct()
    deg = sym.groupBy(F.col("a").alias("id")).agg(F.count(F.lit(1)).alias("deg"))
    tri = triangles_per_vertex(edges).select("id", F.col("triangles").alias("t"))
    ego = deg.join(tri, "id", "left").select(
        "id",
        (F.col("deg") + 1).cast("long").alias("n_ego"),
        (F.col("deg") + F.coalesce(F.col("t"), F.lit(0))).cast("long").alias("e_ego"),
    )
    pts = ego.select(
        "id",
        "n_ego",
        "e_ego",
        F.expr("CAST(ROUND(LN(CAST(n_ego AS DOUBLE)) * 1000.0) AS BIGINT)").alias("lx"),
        F.expr("CAST(ROUND(LN(CAST(e_ego AS DOUBLE)) * 1000.0) AS BIGINT)").alias("ly"),
    )
    m = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
    )
    b = (
        "((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
        " / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))"
    )
    a = f"((CAST(sy AS DOUBLE) - {b} * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE))"
    ok = "(n >= 2 AND n * sxx - sx * sx <> 0)"
    # slope is scale-free; the intercept from milli moments is 1000x the
    # ln-space intercept, so it re-scales alongside the coordinates
    score = (
        f"CASE WHEN {ok} THEN CAST(ROUND(ABS(CAST(ly AS DOUBLE) / 1000.0"
        f" - ({a} / 1000.0 + {b} * (CAST(lx AS DOUBLE) / 1000.0))) * 1000000.0) AS BIGINT)"
        " ELSE CAST(0 AS BIGINT) END"
    )
    return pts.crossJoin(F.broadcast(m)).select(
        "id", "n_ego", "e_ego", F.expr(score).alias("score_micro")
    )


def triangle_significance(edges: DataFrame) -> DataFrame:
    """Observed triangles vs the configuration-model expectation
    (Newman 2003 "The structure and function of complex networks" —
    public methodology): ``E[T] ~ (S2 / S1)^3 / 6`` with ``S1 = sum d``
    and ``S2 = sum d(d-1)`` over the undirected degree sequence, and the
    Poisson-approximate ``z = (T - E) / sqrt(E)`` — "is this graph's
    clustering real or just its hubs?". The null-model companion of the
    exact triangle gates.

    Degrees from one grouped count; T from the engine's oriented
    triangle kernel (one driver scalar); E and z are one fixed double
    tree over exact BIGINT moments, micro-rounded once each. Returns ONE
    row ``(n_vertices, n_triangles, s1, s2, e_micro, z_micro)``.
    """
    from ..algos.triangles import triangle_count

    sym = edges.select(F.col("src").alias("a"), F.col("dst").alias("b")).unionByName(
        edges.select(F.col("dst").alias("a"), F.col("src").alias("b"))
    ).distinct()
    deg = sym.groupBy("a").agg(F.count(F.lit(1)).alias("d"))
    t_obs = int(triangle_count(edges))
    m = deg.agg(
        F.count(F.lit(1)).alias("nv"),
        F.sum("d").alias("s1"),
        F.sum(F.col("d") * (F.col("d") - 1)).alias("s2"),
    )
    e = (
        "((CAST(s2 AS DOUBLE) / CAST(s1 AS DOUBLE))"
        " * (CAST(s2 AS DOUBLE) / CAST(s1 AS DOUBLE))"
        " * (CAST(s2 AS DOUBLE) / CAST(s1 AS DOUBLE)) / 6.0)"
    )
    return m.select(
        F.col("nv").cast("long").alias("n_vertices"),
        F.lit(t_obs).cast("long").alias("n_triangles"),
        F.col("s1").cast("long").alias("s1"),
        F.col("s2").cast("long").alias("s2"),
        F.expr(
            f"CASE WHEN s1 > 0 THEN CAST(ROUND({e} * 1000000.0) AS BIGINT)"
            " ELSE CAST(0 AS BIGINT) END"
        ).alias("e_micro"),
        F.expr(
            f"CASE WHEN s1 > 0 AND {e} > 0.0 THEN"
            f" CAST(ROUND((CAST({t_obs} AS DOUBLE) - {e}) / SQRT({e})"
            " * 1000000.0) AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        ).alias("z_micro"),
    )
