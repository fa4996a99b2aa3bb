"""Graph generators and testdata-derived graphs.

``er_graph`` is the engine equivalent of the reference's synthetic generator
(graphgen.cpp:27-39: uniform src/dst draws, self-loops and duplicate (src,dst)
rejected — a simple digraph). Ours takes an explicit seed (the reference uses
unseeded glibc ``rand()``, SURVEY.md §8) and is generated in NumPy so pytest
oracles can consume the identical edge list.

``hub_skew_graph`` is columnar-in-Spark and adds what the reference lacks:
a hub-skewed degree distribution to exercise salting/range partitioning
(SURVEY.md §2b). ``events_graph``/``lineitem_copurchase_graph`` derive graphs
from the driver's testdata tables for oracle-checked queries and bench volume.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def er_edges_numpy(v: int, e: int, seed: int = 42) -> np.ndarray:
    """Seeded ER-style simple digraph as an (E, 2) int64 array.

    Mirrors graphgen.cpp:27-39 semantics: draw uniform (src, dst), reject
    self-loops and duplicate pairs, until exactly ``e`` edges exist.
    """
    rng = np.random.default_rng(seed)
    seen: set[tuple[int, int]] = set()
    out = []
    while len(out) < e:
        src = int(rng.integers(0, v))
        dst = int(rng.integers(0, v))
        if src == dst or (src, dst) in seen:
            continue
        seen.add((src, dst))
        out.append((src, dst))
    return np.asarray(out, dtype=np.int64)


def ensure_min_outdeg(edges: np.ndarray, v: int) -> np.ndarray:
    """Add ``u -> (u+1) % v`` for every dangling u (FIXTURES.md §5).

    Required for fixed-point golden mode: the reference divides by out-degree
    unconditionally and its behavior is undefined at outdeg 0
    (pagerank.v:468-469, pr_div_uu.v:186-191).
    """
    have = set(edges[:, 0].tolist())
    seen = {(int(s), int(d)) for s, d in edges}
    extra = []
    for u in range(v):
        if u not in have:
            t = (u + 1) % v
            if (u, t) not in seen:
                extra.append((u, t))
    if not extra:
        return edges
    return np.vstack([edges, np.asarray(extra, dtype=np.int64)])


def er_graph(spark: SparkSession, v: int, e: int, seed: int = 42, min_outdeg1: bool = False) -> DataFrame:
    """Seeded ER simple digraph as an ``edges(src long, dst long)`` DataFrame."""
    arr = er_edges_numpy(v, e, seed)
    if min_outdeg1:
        arr = ensure_min_outdeg(arr, v)
    return spark.createDataFrame(
        [(int(s), int(d)) for s, d in arr], "src long, dst long"
    )


def hub_skew_graph(spark: SparkSession, v: int, e: int, n_hubs: int | None = None, seed: int = 13) -> DataFrame:
    """Hub-skewed digraph, generated columnar in Spark (scales to any E).

    Half the edges land on ``n_hubs`` hub destinations (hash-Zipf-ish pick),
    half are uniform ER. Exercises the skew/salting path (operators/skew.py).
    """
    if n_hubs is None:
        n_hubs = max(1, v // 10_000)
    ids = spark.range(e).select(F.col("id"))
    h = lambda *cols: F.abs(F.xxhash64(*cols, F.lit(seed)))
    is_hub = F.pmod(h(F.col("id"), F.lit("side")), F.lit(2)) == 0
    hub_dst = F.pmod(h(F.col("id"), F.lit("hub")), F.lit(n_hubs))
    uni_dst = F.pmod(h(F.col("id"), F.lit("dst")), F.lit(v))
    src = F.pmod(h(F.col("id"), F.lit("src")), F.lit(v))
    df = ids.select(
        src.alias("src"),
        F.when(is_hub, hub_dst).otherwise(uni_dst).cast("long").alias("dst"),
    )
    return df.filter(F.col("src") != F.col("dst")).dropDuplicates(["src", "dst"])


def events_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-succession graph from testdata ``events``.

    Vertices are event_ids; each event points at the previous event of the
    same user (ordered by ts, event_id) — same shape as the transcript reply
    graph (a later turn cites the turn it replies to).
    """
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select("user_id", "event_id", "ts")
        .withColumn("prev", F.lag("event_id").over(w))
        .filter(F.col("prev").isNotNull())
        .select(F.col("event_id").alias("src"), F.col("prev").alias("dst"))
    )


def lineitem_copurchase_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Undirected part co-purchase graph (edges a<b) from ``lineitem``.

    Two parts are linked when they appear in the same order. Triangle-rich —
    used for triangle-count and richer-topology PageRank queries. The
    self-join shuffles on l_orderkey (both sides co-partitioned, one
    exchange per side); dropDuplicates reduces map-side first.
    """
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey", "l_partkey").dropDuplicates()
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(b, on="l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst"))
        .dropDuplicates(["src", "dst"])
    )


def synth_cyclic(spark: SparkSession, n: int = 300, block: int = 10) -> DataFrame:
    """Deterministic directed graph with a rich planted SCC structure —
    the gate graphs are DAGs by construction (events is per-user succession,
    copurchase is canonically ordered), so SCC needs its own cyclic input.

    Vertices 0..n-1 fall into blocks of ``block``; block g = id // block:

    - blocks with g % 3 in {0, 1} are **rings** (intra-block successor
      edges close the cycle; extra chords where (id * 2654435761) % 7 == 0)
      — each ring is one SCC of size ``block``;
    - blocks with g % 3 == 2 are **chains** (no closing edge) — every
      vertex is a singleton SCC, exercising the trim phase;
    - every block head has a guaranteed forward edge head -> head + block,
      plus extra forward edges where (id * 40503 + 7) % 5 == 0 — the
      condensation stays a DAG;
    - block heads with g % 5 == 3 add one **backward** edge to the previous
      block head, merging adjacent SCCs into larger ones (sizes 11/17/20 at
      the default n=300).

    All edge rules are closed-form integer arithmetic over ``range(n)`` so a
    DuckDB oracle reproduces the table exactly, and the ground-truth SCCs
    come from a recursive-CTE transitive closure (exact at gate scale).
    Columnar generation (spark.range + projections) — scales to any n.
    """
    b = block
    r = spark.range(n).select(F.col("id"))
    g = F.col("id") - F.col("id") % b  # block base
    off = F.col("id") % b
    blk = F.expr(f"id DIV {b}")
    succ = r.filter(~((blk % 3 == 2) & (off == b - 1))).select(
        F.col("id").alias("src"), (g + (off + 1) % b).alias("dst")
    )
    chord = r.filter((blk % 3 != 2) & ((F.col("id") * 2654435761) % 7 == 0)).select(
        F.col("id").alias("src"), (g + (off + 3) % b).alias("dst")
    )
    fwd_head = r.filter((off == 0) & (F.col("id") + b < n)).select(
        F.col("id").alias("src"), (F.col("id") + b).alias("dst")
    )
    fwd_extra = r.filter(((F.col("id") * 40503 + 7) % 5 == 0) & (F.col("id") + b < n)).select(
        F.col("id").alias("src"), (F.col("id") + b).alias("dst")
    )
    back = r.filter((off == 0) & (blk % 5 == 3)).select(
        F.col("id").alias("src"), (F.col("id") - b).alias("dst")
    )
    return (
        succ.unionByName(chord)
        .unionByName(fwd_head)
        .unionByName(fwd_extra)
        .unionByName(back)
        .dropDuplicates(["src", "dst"])
    )


def clique_ring(spark: SparkSession, n_cliques: int = 8, size: int = 6) -> DataFrame:
    """Planted community structure with a closed-form optimum: ``n_cliques``
    complete cliques of ``size`` vertices (clique c owns ids
    [c*size, (c+1)*size)) joined into a ring by single bridge edges (each
    clique's last vertex -> the next clique's first, wrapping). For
    size >= 4 the modularity-optimal partition is exactly the cliques
    (Fortunato & Barthélemy's resolution limit kicks in only when the
    clique count grows past ~m; at the gate scale the cliques win), so the
    expected Louvain output is ``community = size * (id DIV size)`` — pure
    integer arithmetic a DuckDB oracle can state directly. Columnar
    generation: clique x offset x offset ranges (n_cliques * size^2 rows
    enumerated, linear in the clique count), no driver loops."""
    cliques = spark.range(n_cliques).select(F.col("id").alias("c"))
    i = spark.range(size).select(F.col("id").alias("i"))
    j = spark.range(size).select(F.col("id").alias("j"))
    intra = (
        cliques.crossJoin(i)
        .crossJoin(j)
        .filter(F.col("i") < F.col("j"))
        .select(
            (F.col("c") * size + F.col("i")).alias("src"),
            (F.col("c") * size + F.col("j")).alias("dst"),
        )
    )
    bridges = spark.range(n_cliques).select(
        (F.col("id") * size + (size - 1)).alias("src"),
        (((F.col("id") + 1) % n_cliques) * size).alias("dst"),
    )
    return intra.unionByName(bridges)


# (k_start, k_end, arcs) — triple k occupies ids (3k, 3k+1, 3k+2); arcs are
# (src_offset, dst_offset) within the triple. Each block plants one triad
# class so every Holland–Leinhardt type is guaranteed nonzero in
# triad_synth_graph; the background layers then overlay extra arcs, which
# only moves a handful of planted triples to richer classes.
TRIAD_SPEC: list[tuple[int, int, list[tuple[int, int]]]] = [
    (0, 20, [(0, 1), (1, 2), (0, 2)]),                                  # 030T
    (20, 40, [(0, 1), (1, 2), (2, 0)]),                                 # 030C
    (40, 60, [(0, 1), (1, 0), (0, 2), (2, 0), (1, 2), (2, 1)]),         # 300
    (60, 80, [(0, 1), (1, 0), (1, 2), (2, 1)]),                         # 201
    (80, 100, [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2)]),                # 210
    (100, 106, [(0, 2), (2, 0), (1, 0), (1, 2)]),                       # 120D
    (106, 112, [(0, 2), (2, 0), (0, 1), (2, 1)]),                       # 120U
    (112, 118, [(0, 2), (2, 0), (0, 1), (1, 2)]),                       # 120C
    (118, 124, [(0, 1), (1, 0), (2, 0)]),                               # 111D
    (124, 130, [(0, 1), (1, 0), (1, 2)]),                               # 111U
    (130, 133, [(1, 0), (1, 2)]),                                       # 021D
    (133, 136, [(0, 1), (2, 1)]),                                       # 021U
    (136, 139, [(0, 1), (1, 2)]),                                       # 021C
]

TRIAD_SYNTH_N = 500


def triad_synth_graph(spark: SparkSession) -> DataFrame:
    """Deterministic digraph covering all 16 triad classes (gate graph for
    ``triad_census_synth``).

    Planted triples per :data:`TRIAD_SPEC` plus two background permutation
    layers ``i -> (7i+1) mod n`` and ``i -> (3i+2) mod n`` (self-loops
    filtered) that supply the sparse 012/021/paths mass and cross-block
    arcs. Everything is closed-form integer arithmetic over ``range(n)`` —
    columnar in Spark, restatable verbatim in DuckDB. Deduplicated simple
    digraph.
    """
    n = TRIAD_SYNTH_N
    r = spark.range(n)
    parts = [
        r.select(F.col("id").alias("src"), ((F.col("id") * 7 + 1) % n).alias("dst")),
        r.select(F.col("id").alias("src"), ((F.col("id") * 3 + 2) % n).alias("dst")),
    ]
    for k0, k1, arcs in TRIAD_SPEC:
        blk = spark.range(k0, k1).select((F.col("id") * 3).alias("base"))
        for so, do in arcs:
            parts.append(
                blk.select((F.col("base") + so).alias("src"), (F.col("base") + do).alias("dst"))
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.filter(F.col("src") != F.col("dst")).dropDuplicates(["src", "dst"])


def triad_synth_sql_cte() -> str:
    """The identical edge table as a DuckDB CTE fragment (defines ``e``)."""
    n = TRIAD_SYNTH_N
    selects = [
        f"SELECT i AS src, (i * 7 + 1) % {n} AS dst FROM ids",
        f"SELECT i AS src, (i * 3 + 2) % {n} AS dst FROM ids",
    ]
    for k0, k1, arcs in TRIAD_SPEC:
        for so, do in arcs:
            selects.append(
                f"SELECT k * 3 + {so} AS src, k * 3 + {do} AS dst FROM ks "
                f"WHERE k >= {k0} AND k < {k1}"
            )
    union = " UNION ALL ".join(selects)
    return (
        f"ids AS (SELECT CAST(range AS BIGINT) AS i FROM range({n})),\n"
        f"ks AS (SELECT CAST(range AS BIGINT) AS k FROM range({max(k1 for _, k1, _ in TRIAD_SPEC)})),\n"
        f"e AS MATERIALIZED (SELECT DISTINCT src, dst FROM ({union}) WHERE src <> dst)"
    )


DENSEST_K = 20  # planted clique size
DENSEST_RING = 200  # sparse periphery ring length


def densest_synth_graph(spark: SparkSession) -> DataFrame:
    """Planted densest-subgraph instance with a closed-form optimum: a
    complete K_20 (ids 0..19, density 9.5), a 200-vertex ring (ids
    20..219, density ~1), and 20 spokes (ring vertex 20+10t -> clique
    vertex t) tying the periphery to the core so the graph is connected.
    The densest subgraph is exactly the clique; with eps = 1/2 the peel
    isolates it in round 1 and empties in round 2. Columnar generation
    (range cross joins), no driver loops; edges canonical src < dst."""
    k, rng = DENSEST_K, DENSEST_RING
    i = spark.range(k).select(F.col("id").alias("i"))
    j = spark.range(k).select(F.col("id").alias("j"))
    clique = (
        i.crossJoin(j)
        .filter(F.col("i") < F.col("j"))
        .select(F.col("i").alias("src"), F.col("j").alias("dst"))
    )
    ring = spark.range(rng).select(
        (F.col("id") + k).alias("src"),
        (((F.col("id") + 1) % rng) + k).alias("dst"),
    )
    spokes = spark.range(k).select(
        F.col("id").alias("dst"), (F.col("id") * 10 + k).alias("src")
    ).select(F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst"))
    # ring edges wrap (219 -> 20): canonicalize to src < dst
    ring = ring.select(
        F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
    )
    return clique.unionByName(ring).unionByName(spokes)


def densest_synth_sql_cte() -> str:
    """The identical edge table as a DuckDB CTE fragment (defines ``e``)."""
    k, rng = DENSEST_K, DENSEST_RING
    return (
        f"ki AS (SELECT CAST(range AS BIGINT) AS i FROM range({k})),\n"
        f"ri AS (SELECT CAST(range AS BIGINT) AS r FROM range({rng})),\n"
        "e AS MATERIALIZED (\n"
        "  SELECT a.i AS src, b.i AS dst FROM ki a JOIN ki b ON a.i < b.i\n"
        "  UNION ALL\n"
        f"  SELECT LEAST(r + {k}, ((r + 1) % {rng}) + {k}),\n"
        f"         GREATEST(r + {k}, ((r + 1) % {rng}) + {k}) FROM ri\n"
        "  UNION ALL\n"
        f"  SELECT i, i * 10 + {k} FROM ki)"
    )


def layered_dag(
    spark: SparkSession, width: int, layers: int, weighted: bool = True
) -> DataFrame:
    """Deterministic layered DAG for critical-path/topo benchmarks — the
    same closed-form family as the ``critpath_synth`` gate (layer hop
    ``v -> (l+1)*W + 7v mod W``, skip hop ``v -> (l+2)*W + 3v mod W``,
    weight ``(v % 5) + 1``), scaled to ``width x layers`` vertices.
    Identical on any cluster size (pure ``spark.range`` arithmetic);
    depth = ``layers - 1`` regardless of width, so the superstep count of
    the fixpoint is constant while the per-superstep work scales with W.
    """
    v = spark.range(width * layers).selectExpr("CAST(id AS BIGINT) AS v")
    mk = (
        "v AS src, ((v DIV {W}) + {s}) * {W} + (v * {m}) % {W} AS dst,"
        " (v % 5) + 1 AS w"
    )
    e1 = v.filter(f"(v DIV {width}) + 1 < {layers}").selectExpr(
        *mk.format(W=width, s=1, m=7).split(", ")
    )
    e2 = v.filter(f"(v DIV {width}) + 2 < {layers}").selectExpr(
        *mk.format(W=width, s=2, m=3).split(", ")
    )
    out = e1.unionByName(e2)
    return out if weighted else out.drop("w")


def temporal_stream(spark: SparkSession, n_events: int = 5000, n_vertices: int = 60) -> DataFrame:
    """Deterministic temporal edge stream ``(src, dst, t)`` — one timestamped
    directed interaction per tick, endpoints from the repo-standard Knuth
    double-hash (products stay < 2^63), self-loops dropped. The synthetic
    input for temporal-motif gates: hash endpoints revisit vertex pairs
    often enough that delta-windowed 2-paths, return paths, and triangles
    all occur."""
    h1 = (F.col("id") * F.lit(2654435761)) % F.lit(4294967296)
    h2 = ((h1 % F.lit(1000003) + F.lit(7919)) * F.lit(2654435761)) % F.lit(4294967296)
    return (
        spark.range(n_events)
        .select(
            (h1 % n_vertices).alias("src"),
            (h2 % n_vertices).alias("dst"),
            F.col("id").alias("t"),
        )
        .where(F.col("src") != F.col("dst"))
    )


def synth_strips(spark: SparkSession, chains: int = 60) -> DataFrame:
    """Deterministic undirected triangle-strip graph — the planted input for
    clique-percolation gates (the gate graphs are either triangle-free
    (events succession is a path forest) or percolation-dense (copurchase
    collapses to one giant community), so k-clique community structure
    needs its own planted input, same policy as :func:`synth_cyclic`).

    Chain ``c`` (0..chains-1) lives at base ``c * 1000`` and is a strip of
    ``T = 8 + (c % 3) * 4`` triangles over vertices ``base..base+T+1``:
    edges ``(v_i, v_{i+1})`` and ``(v_i, v_{i+2})``. Consecutive strip
    triangles share an edge, so each chain is exactly ONE k=3 percolation
    community. Decoys that must NOT merge communities:

    - every chain gets a pendant edge ``(base, base+500)`` (member of no
      triangle — exercises triangle-free edge handling);
    - chains with ``c % 4 == 0`` get a detached triangle
      ``(base, base+600, base+601)`` sharing only the VERTEX ``base`` with
      triangle 0 — vertex-sharing without edge-sharing keeps communities
      separate under k=3 percolation (the semantics decoys test).

    All rules are closed-form integer arithmetic over ``range`` so a DuckDB
    oracle reproduces the table exactly. Columnar generation.
    """
    ch = spark.range(chains).select(
        (F.col("id") * 1000).alias("base"),
        (F.lit(8) + (F.col("id") % 3) * 4).alias("t"),
        F.col("id").alias("c"),
    )
    pos = ch.select(
        "base", "c", F.explode(F.expr("sequence(0, t + 1)")).alias("i"), "t"
    )
    succ = pos.filter(F.col("i") <= F.col("t")).select(
        (F.col("base") + F.col("i")).alias("src"),
        (F.col("base") + F.col("i") + 1).alias("dst"),
    )
    skip = pos.filter(F.col("i") <= F.col("t") - 1).select(
        (F.col("base") + F.col("i")).alias("src"),
        (F.col("base") + F.col("i") + 2).alias("dst"),
    )
    pendant = ch.select(
        F.col("base").alias("src"), (F.col("base") + 500).alias("dst")
    )
    extra = ch.filter(F.col("c") % 4 == 0)
    detached = (
        extra.select(F.col("base").alias("src"), (F.col("base") + 600).alias("dst"))
        .unionByName(
            extra.select(F.col("base").alias("src"), (F.col("base") + 601).alias("dst"))
        )
        .unionByName(
            extra.select(
                (F.col("base") + 600).alias("src"), (F.col("base") + 601).alias("dst")
            )
        )
    )
    return (
        succ.unionByName(skip)
        .unionByName(pendant)
        .unionByName(detached)
        .dropDuplicates(["src", "dst"])
    )


def synth_layered_flow(spark: SparkSession) -> DataFrame:
    """Deterministic layered flow network — the planted input for the
    max-flow gate (same policy as :func:`synth_cyclic`: the gate tables
    carry no capacities, so the flow family gets its own closed-form
    input).

    Vertices: source 0; layer A = 1..4; layer B = 5..8; sink 9. Edges
    (src, dst, cap), all rules closed-form integer arithmetic:

    - ``0 -> a``  with cap ``10 + (a*7) % 5``          (sum 50)
    - ``a -> b``  complete bipartite, cap ``2 + ((a+b)*3) % 4``  (sum 56)
    - ``b -> 9``  with cap ``6 + (b*5) % 7``           (sum 35)

    Because every A->B boundary is COMPLETE bipartite, flow can be
    rerouted freely inside a layer, so max-flow = min over the three
    layer-boundary capacity sums = **35** — the closed-form identity the
    DuckDB oracle evaluates from the same formulas (a layered graph with
    sparse middles would not satisfy it; completeness is what makes the
    planted answer exact).
    """
    a = spark.range(1, 5).select(F.col("id").alias("a"))
    b = spark.range(5, 9).select(F.col("id").alias("b"))
    sa = a.select(
        F.lit(0).cast("long").alias("src"),
        F.col("a").alias("dst"),
        (F.lit(10) + (F.col("a") * 7) % 5).cast("long").alias("cap"),
    )
    ab = a.crossJoin(b).select(
        F.col("a").alias("src"),
        F.col("b").alias("dst"),
        (F.lit(2) + ((F.col("a") + F.col("b")) * 3) % 4).cast("long").alias("cap"),
    )
    bt = b.select(
        F.col("b").alias("src"),
        F.lit(9).cast("long").alias("dst"),
        (F.lit(6) + (F.col("b") * 5) % 7).cast("long").alias("cap"),
    )
    return sa.unionByName(ab).unionByName(bt)
