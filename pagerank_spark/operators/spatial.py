"""Spatial radius self-join via grid-cell bucketing.

Finds all point pairs within Euclidean distance ``r`` — the spatial
analogue of the LSH candidate joins in :mod:`.dedup`: bucket so that every
qualifying pair shares a bucket probe, then verify exactly. A naive
``a JOIN b ON dist(a,b) <= r`` plans as a broadcast-nested-loop cross
product (the same trap :func:`~.temporal.range_join` sidesteps for 1-D
intervals); gridding restores an equi-join shuffle key.

Plan shape:

* cell = ``(floor(x/r), floor(y/r))`` — any pair within ``r`` differs by at
  most 1 in each cell coordinate, so probing the 3x3 neighborhood is a
  complete candidate set (2-D pigeonhole, exact — no recall loss).
* the LEFT side keeps its own cell; the RIGHT side replicates to its 9
  neighbor cells (one ``explode`` over the (dx,dy) literal array — 9x row
  amplification on one side only, the standard grid-join trade).
* join on the cell key (ONE equi-shuffle), then the exact predicate
  ``dist2 <= r*r`` in integer arithmetic. Each qualifying pair meets in
  exactly one (cell, dx, dy) combination per orientation and ``a < b``
  keeps one orientation, so no post-join dedup shuffle is needed.
* hot cells (all points piled into one grid square) are the skew hazard at
  scale; ``max_cell_size`` drops them EAGERLY with a logged count (the same
  no-silent-truncation contract as dedup's hot-bucket cap). Without a cap,
  AQE skew-join splitting handles moderate skew.

Integer coordinates in, exact integer squared distances out — hash-stable
across engines; the oracle is a brute-force cross-join filter at test scale.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)

__all__ = ["radius_join"]


def radius_join(
    points: DataFrame,
    radius: int,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    max_cell_size: int | None = None,
) -> DataFrame:
    """Return ``(a, b, dist2)`` for every pair of points at squared
    Euclidean distance ``dist2 <= radius**2``, ``a < b`` canonical.

    ``points``: (id_col, x_col, y_col) with integer coordinates (exact
    arithmetic end-to-end). ``radius`` must be a positive integer.
    """
    if radius < 1:
        raise ValueError(f"radius must be a positive integer, got {radius}")
    p = points.select(
        F.col(id_col).alias("pid"),
        F.col(x_col).cast("long").alias("px"),
        F.col(y_col).cast("long").alias("py"),
        F.floor(F.col(x_col) / F.lit(radius)).alias("cx"),
        F.floor(F.col(y_col) / F.lit(radius)).alias("cy"),
    )

    if max_cell_size is not None:
        sizes = p.groupBy("cx", "cy").agg(F.count(F.lit(1)).alias("__n"))
        hot = sizes.filter(F.col("__n") > max_cell_size)
        stats = hot.agg(
            F.count(F.lit(1)).alias("cells"), F.sum("__n").alias("pts")
        ).first()
        if stats["cells"]:
            log.warning(
                "dropping %d hot grid cells (> %d points, %d point-slots) "
                "from the radius join",
                stats["cells"], max_cell_size, stats["pts"],
            )
            p = p.join(hot.select("cx", "cy"), ["cx", "cy"], "left_anti")

    left = p.select(
        F.col("pid").alias("a"), F.col("px").alias("ax"), F.col("py").alias("ay"),
        "cx", "cy",
    )
    # right side replicated to its 3x3 neighborhood; a qualifying pair's
    # cells differ by <= 1 per axis, so the probe meets the left row's own
    # cell exactly once per orientation
    cells = ", ".join(
        f"struct({dx} AS dx, {dy} AS dy)" for dx in (-1, 0, 1) for dy in (-1, 0, 1)
    )
    offs = F.expr(f"explode(array({cells}))")
    right = p.select(
        F.col("pid").alias("b"), F.col("px").alias("bx"), F.col("py").alias("by"),
        "cx", "cy", offs.alias("o"),
    ).select(
        "b", "bx", "by",
        (F.col("cx") + F.col("o.dx")).alias("cx"),
        (F.col("cy") + F.col("o.dy")).alias("cy"),
    )
    d2 = (F.col("ax") - F.col("bx")) * (F.col("ax") - F.col("bx")) + (
        F.col("ay") - F.col("by")
    ) * (F.col("ay") - F.col("by"))
    return (
        left.join(right, ["cx", "cy"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", d2.alias("dist2"))
        .filter(F.col("dist2") <= radius * radius)
    )


def dbscan(
    points: DataFrame,
    eps: int,
    min_pts: int,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
    max_cell_size: int | None = None,
) -> DataFrame:
    """Density-based clustering (DBSCAN, Ester et al. 1996 — public
    methodology) composed entirely from engine primitives:

    1. eps-neighbor pairs via :func:`radius_join` (3x3 grid probe — ONE
       equi-shuffle, never a cross product; ``max_cell_size`` passes
       through as the hot-cell guard),
    2. neighborhood sizes (the point itself counts, per the paper),
    3. core points = ``|N_eps| >= min_pts``,
    4. clusters = connected components over CORE-CORE eps-edges
       (:func:`~pagerank_spark.algos.components.connected_components` —
       the engine's min-label fixpoint; cluster id = min core id),
    5. border points = non-core within eps of >= 1 core, assigned the
       MINIMUM neighboring core's cluster (the deterministic tiebreak for
       the paper's "first come" ambiguity),
    6. everything else = noise, cluster -1.

    Returns ``(id_col, cluster, is_core)`` with exact integer coordinates
    end-to-end — every stage is oracle-replayable. Scale shape: the grid
    join bounds candidate pairs; CC shuffles only core-core edges; border
    assignment is one aggregation over the pair table.
    """
    from ..algos.components import connected_components

    pairs = radius_join(
        points, eps, id_col=id_col, x_col=x_col, y_col=y_col,
        max_cell_size=max_cell_size,
    ).localCheckpoint()
    sym = pairs.selectExpr("a AS p", "b AS q").unionByName(
        pairs.selectExpr("b AS p", "a AS q")
    )
    ncount = sym.groupBy("p").agg((F.count(F.lit(1)) + 1).alias("n_eps"))
    ids = points.select(F.col(id_col).alias("p"))
    core = (
        ids.join(ncount, "p", "left")
        .fillna(1, ["n_eps"])
        .filter(F.col("n_eps") >= min_pts)
        .select("p")
        .localCheckpoint()
    )
    core_edges = (
        sym.join(core.withColumnRenamed("p", "q"), "q")
        .join(core, "p")
        .selectExpr("p AS src", "q AS dst")
    )
    cc = connected_components(core_edges, vertices=core.selectExpr("p AS id"))
    core_out = core.join(
        cc.selectExpr("id AS p", "component AS cluster"), "p"
    ).withColumn("is_core", F.lit(1))
    border = (
        sym.join(core_out.select("p", "cluster").withColumnRenamed("p", "q"), "q")
        .join(core, "p", "left_anti")
        .groupBy("p")
        .agg(F.min("cluster").alias("cluster"))
        .withColumn("is_core", F.lit(0))
    )
    assigned = core_out.select("p", "cluster", "is_core").unionByName(border)
    noise = (
        ids.join(assigned.select("p"), "p", "left_anti")
        .select("p", F.lit(-1).alias("cluster"), F.lit(0).alias("is_core"))
    )
    return (
        assigned.unionByName(noise)
        .withColumnRenamed("p", id_col)
        .select(id_col, "cluster", "is_core")
    )


def morans_i(
    points: DataFrame,
    x_col: str,
    y_col: str,
    value_col: str,
    cell_size: int,
) -> DataFrame:
    """Global Moran's I spatial autocorrelation (Moran 1950, public
    methodology — the standard hot-spot screen: do nearby cells carry
    similar values?) over a floor-grid aggregation with rook (4-neighbor)
    binary weights between OCCUPIED cells::

        I = (n / W) * sum_adj(d_i * d_j) / sum(d_i^2)

    Exactness: cell values are integer sums; deviations are the exact
    BIGINTs ``d_c = n * v_c - S`` (mean cleared by n-scaling — the n^2
    factors cancel in the ratio); the adjacency sum is one equi-join of
    the cell table against its 4 offset images (ordered pairs — W counts
    both directions, the symmetric-weight convention); the final I is one
    fixed-sequence double expression, micro-scaled via floor(x+0.5).

    Scale shape: points aggregate once to cells (map-side combine);
    everything after is cell-table-sized. Overflow contract (caller's):
    ``n_cells * max|cell sum|`` under ~3e9 — quantize values upstream.

    Returns ``(n_cells, w_pairs, num, den, i_micro)``; i_micro is NULL
    when W = 0 (no adjacent occupied cells) or den = 0 (constant field).
    """
    cells = points.groupBy(
        F.floor(F.col(x_col) / cell_size).alias("cx"),
        F.floor(F.col(y_col) / cell_size).alias("cy"),
    ).agg(F.sum(F.col(value_col).cast("long")).alias("__v"))
    m = cells.groupBy().agg(F.count(F.lit(1)).alias("__n"), F.sum("__v").alias("__s"))
    dev = (
        cells.crossJoin(F.broadcast(m))
        .select("cx", "cy", (F.col("__n") * F.col("__v") - F.col("__s")).alias("__d"), "__n")
        .localCheckpoint()  # feeds the self-join twice + both sums
    )
    offs = F.expr(
        "array(struct(1 AS ox, 0 AS oy), struct(-1 AS ox, 0 AS oy),"
        " struct(0 AS ox, 1 AS oy), struct(0 AS ox, -1 AS oy))"
    )
    probe = dev.select(
        "cx", "cy", F.col("__d").alias("__da"), F.explode(offs).alias("__o")
    ).select(
        (F.col("cx") + F.col("__o.ox")).alias("cx"),
        (F.col("cy") + F.col("__o.oy")).alias("cy"),
        "__da",
    )
    adj = probe.join(dev.select("cx", "cy", F.col("__d").alias("__db")), ["cx", "cy"])
    num_w = adj.groupBy().agg(
        F.count(F.lit(1)).alias("w_pairs"),
        F.sum(F.col("__da") * F.col("__db")).alias("num"),
    )
    den = dev.groupBy().agg(
        F.max("__n").alias("n_cells"), F.sum(F.col("__d") * F.col("__d")).alias("den")
    )
    return den.crossJoin(F.broadcast(num_w)).select(
        "n_cells",
        F.col("w_pairs").cast("long").alias("w_pairs"),
        F.coalesce(F.col("num"), F.lit(0)).cast("long").alias("num"),
        F.col("den").cast("long").alias("den"),
        F.when(
            (F.col("w_pairs") > 0) & (F.col("den") > 0),
            F.floor(
                F.expr(
                    "CAST(n_cells AS DOUBLE) * num / (CAST(w_pairs AS DOUBLE) * den)"
                )
                * F.lit(1_000_000)
                + F.lit(0.5)
            ),
        )
        .cast("long")
        .alias("i_micro"),
    )
