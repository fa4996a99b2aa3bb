"""Neighborhood function, ball sizes, effective diameter (ANF / HyperBall).

The reference accelerator iterates one gather kernel over a CSR image
(`/root/reference/src/pagerank.v`: rank gather-sum per superstep); the same
superstep shape computes distance *sketches*: the t-hop ball of a vertex is
the merge of its out-neighbors' (t-1)-hop balls plus itself (Palmer et al.
"ANF" KDD'02; Boldi/Rosa/Vigna "HyperANF" WWW'11). Two modes:

- ``mode="exact"`` — frontier expansion over distinct ``(root, reached)``
  pairs. State is O(sum of ball sizes): the verification path. Fully
  SQL-replayable (unrolled joins), so it carries the DuckDB oracle gates.
- ``mode="hll"`` — per-vertex HyperLogLog registers (2**p bytes each) merged
  along edges: state is O(V * 2**p) regardless of ball size — the 100-TB
  path, where exact pair state is quadratic on dense graphs. Register
  hashing is engine-neutral 32-bit multiplicative arithmetic (no xxhash64),
  so a pure-Python replay is bit-identical (tests/test_neighborhood.py).

Scale notes (100x lens): the exact mode's per-superstep join keys the static
edge table against the growing pair state on ``reached`` — a plain shuffle
join whose width is the frontier, and the loop references the state once per
superstep, so Catalyst size estimates grow linearly, not exponentially (see
BENCH/SCALING_NOTES.md §10 on why self-joined state must be avoided). The
HLL mode's merge is 2**p codegen'd ``max`` aggregates — map-side combined,
no explode, no Python.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KNUTH = 2654435761  # 2^32 / phi — same multiplier as operators/packing.py
MIX = 2246822519  # xxhash PRIME32_2, used as an independent odd multiplier
M31 = 1 << 31  # all hash arithmetic is mod 2^31 so every product fits an int64


def _vertices(edges: DataFrame) -> DataFrame:
    return (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .dropDuplicates(["id"])
    )


# ---------------------------------------------------------------------------
# exact mode
# ---------------------------------------------------------------------------


def _expand(pairs: DataFrame, edges: DataFrame) -> DataFrame:
    """One superstep: add every vertex one directed hop beyond the ball.

    The edge side is re-aliased per superstep so repeated references to the
    same static edge DataFrame don't trip Spark's ambiguous-self-join check.
    """
    e = edges.select(F.col("src").alias("_es"), F.col("dst").alias("_ed"))
    step = pairs.join(e, pairs["reached"] == e["_es"]).select(
        "root", F.col("_ed").alias("reached")
    )
    return pairs.unionByName(step).dropDuplicates(["root", "reached"])


def ball_sizes(
    edges: DataFrame,
    k: int,
    mode: str = "exact",
    p: int = 6,
    checkpoint_every: int = 3,
) -> DataFrame:
    """Per-vertex ``|{u : dist(v, u) <= k}|`` (directed, self included).

    Returns ``(id, ball_size)`` in exact mode, ``(id, ball_est)`` (double)
    in hll mode. ``checkpoint_every`` bounds plan depth on long horizons
    (k supersteps unroll lazily otherwise).
    """
    if k < 0:
        raise ValueError("k must be >= 0")
    if mode == "hll":
        regs = _hll_iterate(edges, k, p)
        return regs.select("id", _hll_estimate_col(p).alias("ball_est"))
    if mode != "exact":
        raise ValueError(f"unknown mode {mode!r}")
    v = _vertices(edges)
    pairs = v.select(F.col("id").alias("root"), F.col("id").alias("reached"))
    for t in range(1, k + 1):
        pairs = _expand(pairs, edges)
        if t % checkpoint_every == 0 and t < k:
            pairs = pairs.localCheckpoint()
    return (
        pairs.groupBy("root")
        .agg(F.count(F.lit(1)).alias("ball_size"))
        .withColumnRenamed("root", "id")
    )


def neighborhood_function(
    edges: DataFrame, k: int, mode: str = "exact", p: int = 6
) -> DataFrame:
    """``(t, nf)`` for t = 0..k: the number of (ordered) vertex pairs within
    directed distance t — ANF's N(t). Exact mode counts distinct pairs; hll
    mode sums per-vertex register estimates (``nf`` is then a rounded
    double-derived BIGINT estimate).

    Each horizon's count shares the previous horizon's frontier via
    ``localCheckpoint`` (one pass over the expansion, not k re-expansions).
    """
    if k < 0:
        raise ValueError("k must be >= 0")
    if mode == "hll":
        return _hll_nf(edges, k, p)
    v = _vertices(edges)
    pairs = v.select(F.col("id").alias("root"), F.col("id").alias("reached"))
    counts = []
    for t in range(k + 1):
        if t > 0:
            pairs = _expand(pairs, edges)
        if t < k:
            pairs = pairs.localCheckpoint()
        counts.append(
            pairs.groupBy().agg(F.count(F.lit(1)).alias("nf")).select(
                F.lit(t).cast("long").alias("t"), "nf"
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


def effective_diameter(
    edges: DataFrame, k: int, q: float = 0.9, mode: str = "exact", p: int = 6
) -> DataFrame:
    """Smallest t <= k with N(t) >= q * N(k) (the q-effective diameter at
    horizon k, no interpolation — integer-valued, hash-stable). Returns one
    row ``(eff_diameter, nf_horizon)``. The driver traffic is k+1 rows.
    """
    nf = neighborhood_function(edges, k, mode=mode, p=p).collect()
    by_t = {r["t"]: r["nf"] for r in nf}
    horizon = by_t[k]
    eff = next(t for t in range(k + 1) if by_t[t] >= q * horizon)
    spark = SparkSession.getActiveSession()
    return spark.createDataFrame(
        [(eff, int(horizon))], "eff_diameter long, nf_horizon long"
    )


# ---------------------------------------------------------------------------
# hll mode
# ---------------------------------------------------------------------------


def _h31(col, salt: int):
    """Engine-neutral 31-bit hash: two odd-multiplier rounds with xor-shift
    finalizers (multiplicative hashing alone leaves low bits unmixed and the
    register index reads them), all mod 2^31 so every intermediate product
    stays below 2^62 (no ANSI BIGINT overflow). Inputs must be < 2^31 (same
    contract as packing.hash_split); rehash wider ids first.
    """
    h1 = F.pmod(col * F.lit(KNUTH) + F.lit(salt), F.lit(M31))
    h1 = h1.bitwiseXOR(F.shiftright(h1, 15))
    h2 = F.pmod(h1 * F.lit(MIX) + F.lit(1), F.lit(M31))
    return h2.bitwiseXOR(F.shiftright(h2, 13))


def _rank_col(w, width: int):
    """Leading-zero rank of ``w`` within ``width`` bits: width - floor(log2 w)
    when w > 0 else width + 1. log2 is exact here (w < 2^26 fits a double)."""
    return F.when(w > 0, F.lit(width) - F.floor(F.log2(w.cast("double")))).otherwise(
        F.lit(width + 1)
    ).cast("int")


def _hll_init(v: DataFrame, p: int) -> DataFrame:
    """Each vertex's initial registers: only its own hashed id inserted."""
    m = 1 << p
    h = _h31(F.col("id"), 7)
    j = F.pmod(h, F.lit(m))
    w = F.floor(h / F.lit(m))
    rank = _rank_col(w, 31 - p)
    regs = F.array(*[F.when(j == i, rank).otherwise(F.lit(0)) for i in range(m)])
    return v.select("id", regs.alias("regs"))


def _hll_iterate(edges: DataFrame, k: int, p: int) -> DataFrame:
    """k supersteps of register merge along out-edges.

    The gather is ``edges JOIN state ON state.id = dst`` then 2**p
    ``max(regs[i])`` aggregates per src — all codegen'd, map-side combined;
    the merge with the vertex's own registers is one ``zip_with greatest``
    projection. No explode (that would be a 2**p row amplification), no
    Python.
    """
    state = _hll_init(_vertices(edges), p)
    for t in range(k):
        state = _hll_iterate_once(edges, state, p)
        if t < k - 1:
            state = state.localCheckpoint()
    return state


def hll_alpha(m: int) -> float:
    """Standard HLL bias constant (Flajolet et al. 2007)."""
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def _hll_estimate_col(p: int):
    """Raw HLL estimate + linear-counting small-range correction, as a
    column over ``regs``. Pure built-in expressions (aggregate/filter)."""
    m = 1 << p
    inv_sum = F.aggregate(
        "regs", F.lit(0.0), lambda acc, r: acc + F.pow(F.lit(2.0), -r.cast("double"))
    )
    raw = F.lit(hll_alpha(m) * m * m) / inv_sum
    zeros = F.size(F.filter("regs", lambda r: r == 0))
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double"))
    return F.when((raw <= 2.5 * m) & (zeros > 0), linear).otherwise(raw)


def _hll_nf(edges: DataFrame, k: int, p: int) -> DataFrame:
    v = _vertices(edges)
    state = _hll_init(v, p)
    est = _hll_estimate_col(p)
    counts = []
    for t in range(k + 1):
        if t > 0:
            state = _hll_iterate_once(edges, state, p)
        if t < k:
            state = state.localCheckpoint()
        counts.append(
            state.agg(F.round(F.sum(est)).cast("long").alias("nf")).select(
                F.lit(t).cast("long").alias("t"), "nf"
            )
        )
    out = counts[0]
    for c in counts[1:]:
        out = out.unionByName(c)
    return out


def _hll_iterate_once(edges: DataFrame, state: DataFrame, p: int) -> DataFrame:
    m = 1 << p
    e = edges.select(F.col("src").alias("_es"), F.col("dst").alias("_ed"))
    gathered = (
        e.join(state, e["_ed"] == state["id"])
        .groupBy(F.col("_es").alias("gid"))
        .agg(*[F.max(F.element_at("regs", i + 1)).alias(f"r{i}") for i in range(m)])
        .select(
            F.col("gid").alias("id"),
            F.array(*[F.col(f"r{i}") for i in range(m)]).alias("nregs"),
        )
    )
    return state.join(gathered, on="id", how="left").select(
        "id",
        F.when(F.col("nregs").isNull(), F.col("regs"))
        .otherwise(F.zip_with("regs", "nregs", lambda a, b: F.greatest(a, b)))
        .alias("regs"),
    )


# ---------------------------------------------------------------------------
# pure-Python replay (test oracle for the hll mode's determinism)
# ---------------------------------------------------------------------------


def py_hll_registers(edge_list, vertices, k: int, p: int) -> dict[int, list[int]]:
    """Bit-identical replay of the hll mode's register arithmetic."""
    m = 1 << p
    width = 31 - p

    def h31(x: int, salt: int) -> int:
        h1 = (x * KNUTH + salt) % M31
        h1 ^= h1 >> 15
        h2 = (h1 * MIX + 1) % M31
        return h2 ^ (h2 >> 13)

    regs: dict[int, list[int]] = {}
    for vid in vertices:
        h = h31(vid, 7)
        j, w = h % m, h // m
        rank = (width - int(math.floor(math.log2(w)))) if w > 0 else width + 1
        r = [0] * m
        r[j] = rank
        regs[vid] = r
    out_nbrs: dict[int, list[int]] = {}
    for s, d in edge_list:
        out_nbrs.setdefault(s, []).append(d)
    for _ in range(k):
        nxt = {}
        for vid, r in regs.items():
            merged = list(r)
            for nb in out_nbrs.get(vid, []):
                merged = [max(a, b) for a, b in zip(merged, regs[nb])]
            nxt[vid] = merged
        regs = nxt
    return regs


def py_hll_estimate(r: list[int], p: int) -> float:
    m = 1 << p
    raw = hll_alpha(m) * m * m / sum(2.0 ** -x for x in r)
    zeros = r.count(0)
    if raw <= 2.5 * m and zeros > 0:
        return m * math.log(m / zeros)
    return raw
