"""Full k-core (coreness) decomposition via the iterative H-index fixpoint.

``k_core(k)`` (algos/kcore.py) answers one membership question; this module
computes the whole decomposition — every vertex's core number — in one run,
using the H-operator iteration of Lu, Zhou, Zhang & Stanley, "The H-index of
a network node and its relation to degree and coreness" (Nature
Communications 7:10168, 2016): initialize ``h_0(v) = degree(v)`` and iterate

    h_{t+1}(v) = H-index of { h_t(u) : u in N(v) }

(the largest ``h`` such that at least ``h`` neighbors currently hold a value
``>= h``). The sequence is monotonically non-increasing and converges exactly
to the coreness. Synchronized rounds make the run deterministic and
SQL-unrollable, so the ``coreness_copurchase`` gate replays it verbatim in
DuckDB (fixed-round form; extra rounds at the fixpoint are no-ops).

Scale shape — the H-index is computed from a per-vertex VALUE HISTOGRAM, not
from the raw neighbor list:

- gather: ONE equi-join of the symmetrized edge list against the current
  ``(id, h)`` state (same shuffle shape as a PageRank superstep). Exactly
  one multiplicative state reference per round, deliberately: a variant
  that also joined the gatherer's own previous value (to cap histogram
  width) was measured at 866s for the sf0.01 gate vs ~30s for this plan —
  with TWO state joins per round, Catalyst's sizeInBytes estimate for the
  new state is proportional to size(state)^2, so the BigInteger stat
  doubles its bit length every round and planning time explodes (the same
  pathology that shaped algos/scc.py's single-gather supersteps). The cap
  is mathematically a no-op anyway: H(values capped at C) = min(C, H(raw))
  and the H-operator sequence is monotonically non-increasing (Lu et al.
  Thm. 1), so H_raw(v) <= h_prev(v) already;
- histogram: ``groupBy(id, value).count()`` — a map-side-combined
  aggregation producing one row per (vertex, distinct neighbor value), at
  most min(degree, #distinct live values) rows per vertex;
- H from the histogram: within each vertex, a running count over values in
  descending order gives ``cnt_ge(v)``, and ``H = max over observed values v
  of min(v, cnt_ge(v))`` (exact: cnt_ge only steps at observed values, so
  the max over observed values equals the max over all integers).

The per-vertex window runs over the histogram cells, not the neighbor list;
values concentrate fast (they are squeezed into [coreness, prev] bands), so
hub cell counts collapse after the first rounds. No single-partition window
exists anywhere in the plan. State and edges are localCheckpointed per
round (the lineage-truncation rule every iterative kernel in this package
follows).

Reference parity: the reference accelerator is a single-query PageRank
engine (no decomposition operators); this is §2b extended-surface breadth
next to k_core/k_truss, citing /root/reference/src/pagerank.v:732 only for
the fixed-round iteration convention the gate form mirrors.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .pagerank import _num_partitions


@dataclass
class CorenessResult:
    vertices: DataFrame  # (id, coreness)
    rounds_run: int
    converged: bool


def _h_from_histogram(hist: DataFrame) -> DataFrame:
    """(id, hv, cnt) histogram -> (id, h) H-index per id.

    ``cnt_ge`` = running sum of cnt over hv DESC within id; the window spans
    at most h_prev(id)+1 distinct values — bounded by the graph's degeneracy,
    never by a hub's degree.
    """
    w = Window.partitionBy("id").orderBy(F.desc("hv"))
    return (
        hist.withColumn("cge", F.sum("cnt").over(w))
        .groupBy("id")
        .agg(F.max(F.least(F.col("hv"), F.col("cge"))).alias("h"))
    )


def coreness(
    edges: DataFrame,
    rounds: int | None = None,
    max_iters: int = 100,
) -> CorenessResult:
    """Per-vertex core numbers ``(id, coreness)`` of the undirected support
    graph of ``edges(src, dst)``.

    ``rounds`` fixed: exactly that many synchronized H-operator rounds (the
    oracle-gate form). ``rounds=None``: iterate to the exact fixpoint (at
    most ``max_iters``, one changed-count action per round).
    """
    p = _num_partitions(edges)
    sym = (
        edges.select("src", "dst")
        .unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .dropDuplicates(["src", "dst"])
        .repartition(p, "dst")
    ).localCheckpoint()

    # h_0 = degree (sym is symmetrized+deduped, so src covers every vertex)
    h = (
        sym.groupBy("src")
        .count()
        .select(F.col("src").alias("id"), F.col("count").cast("long").alias("h"))
    ).localCheckpoint()

    total = rounds if rounds is not None else max_iters
    rounds_run = 0
    converged = False
    for _ in range(max(1, total)):
        # gather neighbor values: state joined on the NEIGHBOR end (dst)
        # only — see the module docstring for why exactly once
        nb = sym.join(
            h.select(F.col("id").alias("dst"), F.col("h").alias("hv")), "dst"
        ).select(F.col("src").alias("id"), "hv")
        hist = nb.groupBy("id", "hv").agg(F.count(F.lit(1)).alias("cnt"))
        new_h = _h_from_histogram(hist).localCheckpoint()
        rounds_run += 1
        if rounds is None:
            changed = (
                new_h.join(h.select("id", F.col("h").alias("ph")), "id")
                .filter(F.col("h") != F.col("ph"))
                .count()
            )
            h = new_h
            if changed == 0:
                converged = True
                break
        else:
            h = new_h

    return CorenessResult(
        vertices=h.select("id", F.col("h").alias("coreness")), rounds_run=rounds_run, converged=converged
    )


def py_coreness(edge_list: list[tuple[int, int]]) -> dict[int, int]:
    """Exact coreness by sequential min-degree peeling (test oracle)."""
    adj: dict[int, set[int]] = {}
    for a, b in edge_list:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {v: len(ns) for v, ns in adj.items()}
    core: dict[int, int] = {}
    alive = set(adj)
    k = 0
    while alive:
        v = min(alive, key=lambda x: (deg[x], x))
        k = max(k, deg[v])
        core[v] = k
        alive.remove(v)
        for u in adj[v]:
            if u in alive:
                deg[u] -= 1
    return core
