"""Skyline (Pareto frontier) queries — grid-pruned exact dominance.

A row is on the skyline iff no other row is at-least-as-good on every
criterion and strictly better on at least one (Borzsony, Kossmann &
Stocker, ICDE 2001 — the classic SKYLINE OF operator). The naive plan is
an all-pairs dominance anti-join — quadratic and unshippable at 100 TB.

Distributed shape (the textbook grid/BNL hybrid, all JVM, no UDFs):

1. normalize every criterion to "minimize" (exact sign flip for max),
2. ONE tiny aggregate collects per-dimension min/max -> bucket widths,
3. every row gets a grid cell (codegen'd projection); the NONEMPTY cell
   set is one map-side-combined groupBy whose size is bounded by
   ``grid**k`` (default 8**k), not by the data,
4. cell-level pruning: if cell ``c`` is strictly below cell ``b`` on
   EVERY dimension, then every row of ``c`` dominates every row of ``b``
   (bucket boundaries are monotone), so ``b``'s rows can be discarded
   wholesale. The cell-vs-cell check is a broadcast nested-loop over the
   tiny cell set; surviving cells broadcast back as a semi-join filter.
   This is EXACT pruning — no skyline row is ever in a strictly-dominated
   cell — so the grid resolution affects cost only, never the answer.
5. the exact finish: candidates anti-join a broadcast copy of themselves
   on the dominance predicate (non-equi -> BroadcastNestedLoopJoin). The
   candidate count is guarded by ``max_candidates`` (hard error, never a
   silent truncation): the quadratic stage must stay broadcast-sized.
   Anti-correlated criteria (where the true skyline itself is huge) are
   the documented worst case of every skyline algorithm — the guard makes
   the caller choose coarser criteria rather than letting the NLJ crawl.

Duplicates: two identical criterion vectors don't strictly dominate each
other, so all copies surface — match SQL ``NOT EXISTS`` semantics.

Reference parity: none (single-query reference); multi-objective
"cheapest/freshest/biggest" selection is standard corpus-curation tooling
(pick the Pareto-optimal documents per quality-vs-length-vs-recency).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["skyline"]


def skyline(
    df: DataFrame,
    criteria: list[tuple[str, str]],
    grid: int = 8,
    max_candidates: int = 200_000,
) -> DataFrame:
    """Rows of ``df`` not dominated under ``criteria`` ([(col, 'min'|'max')]).

    Returns the original columns. Exact (grid resolution never changes the
    result); raises if the grid-pruned candidate set exceeds
    ``max_candidates`` (the broadcast bound of the final exact stage).
    """
    if not criteria:
        raise ValueError("need at least one criterion")
    if grid < 2:
        raise ValueError("grid must be >= 2")
    norm = []
    for i, (col, direction) in enumerate(criteria):
        if direction not in ("min", "max"):
            raise ValueError(f"direction must be min|max, got {direction!r}")
        e = F.col(col).cast("double")
        norm.append((-e if direction == "max" else e).alias(f"__k{i}"))
    ks = [f"__k{i}" for i in range(len(criteria))]
    t = df.select("*", *norm)

    bounds = t.agg(
        *[F.min(k).alias(f"lo{i}") for i, k in enumerate(ks)],
        *[F.max(k).alias(f"hi{i}") for i, k in enumerate(ks)],
    ).collect()[0]
    cells = []
    for i, k in enumerate(ks):
        lo, hi = bounds[f"lo{i}"], bounds[f"hi{i}"]
        w = (hi - lo) / grid if hi > lo else 1.0
        b = F.least(F.floor((F.col(k) - F.lit(lo)) / F.lit(w)), F.lit(grid - 1))
        cells.append(b.cast("int").alias(f"__b{i}"))
    bs = [f"__b{i}" for i in range(len(ks))]
    t = t.select("*", *cells)

    occupied = t.groupBy(*bs).count().drop("count")
    strictly_below = [F.col(f"c.{b}") < F.col(f"o.{b}") for b in bs]
    dominated = (
        occupied.alias("o")
        .join(
            F.broadcast(occupied.alias("c")),
            on=strictly_below[0] if len(bs) == 1 else F.expr(" AND ".join(
                f"c.{b} < o.{b}" for b in bs)),
            how="leftsemi",
        )
    )
    alive = occupied.exceptAll(dominated)
    cand = t.join(F.broadcast(alive), on=bs, how="leftsemi")

    n = cand.count()
    if n > max_candidates:
        raise ValueError(
            f"skyline candidate set {n} exceeds max_candidates="
            f"{max_candidates}; raise the bound or coarsen the criteria"
        )

    dom = " AND ".join(f"r.{k} <= s.{k}" for k in ks)
    strict = " OR ".join(f"r.{k} < s.{k}" for k in ks)
    out = cand.alias("s").join(
        F.broadcast(cand.alias("r")),
        on=F.expr(f"({dom}) AND ({strict})"),
        how="leftanti",
    )
    return out.drop(*ks, *bs)
