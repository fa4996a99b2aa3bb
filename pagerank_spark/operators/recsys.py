"""Item-item collaborative filtering over baskets — co-occurrence cosine
similarity and per-item top-k recommendations.

The classic "customers who bought X also bought Y" recommender (Linden et
al. 2003, "Amazon.com Recommendations: Item-to-Item Collaborative
Filtering" — public methodology): similarity between items i, j is the
cosine of their basket-membership vectors,
``n_ij / sqrt(n_i * n_j)`` with ``n_i`` = baskets containing i and
``n_ij`` = baskets containing both. Per-item top-k by similarity is the
recommendation list.

Hash-stable scoring: cosine² is emitted as the exact integer
``cos2_micro = n_ij² * 10^6 div (n_i * n_j)`` — monotone in cosine, so the
top-k ORDER is the cosine order, and every output value is a BIGINT (the
repo-wide no-floats-in-gates discipline). Ties break on the neighbor id.

Scale shape (the 100-TB lens):

* Pair enumeration goes through :func:`~pagerank_spark.operators.skew.
  chunked_self_pairs` on the basket key — bounded join keys, distributed
  enumeration (the measured fix for near-serial bucket self-joins), never
  an all-pairs product. Hot baskets can additionally be capped upstream
  (drop baskets above a size bound) exactly as dedup's LSH kernel does —
  a mega-basket contributes quadratic pairs and no signal.
* Item counts are one map-side-combined aggregate, broadcast back onto
  the pair counts (items ≪ baskets).
* Top-k is a per-item window over the SIMILARITY table (items × avg
  co-neighbors rows, far smaller than the basket table), partitioned on
  the item key — no global sort, no single-partition window.

Reference parity: none (single-query reference); recommendation /
similarity mandate breadth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .skew import chunked_self_pairs

__all__ = ["item_cooccurrence", "item_topk_similar", "hitrate_loo"]

_SCALE = 1_000_000


def item_cooccurrence(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    max_basket_size: int | None = None,
) -> DataFrame:
    """``(item_a, item_b, n_ab, n_a, n_b, cos2_micro)`` for every item pair
    sharing >= 1 basket (``item_a < item_b``, each unordered pair once).

    ``baskets`` rows are (basket, item) memberships; duplicates are
    de-duplicated first so counts are set semantics. ``max_basket_size``
    drops larger baskets BEFORE pair enumeration (logged count), bounding
    the quadratic term exactly like the LSH hot-bucket cap.
    """
    m = baskets.select(
        F.col(basket_col).alias("b"), F.col(item_col).alias("i")
    ).distinct()
    if max_basket_size is not None:
        sizes = m.groupBy("b").agg(F.count(F.lit(1)).alias("__sz"))
        m = (
            m.join(sizes.filter(F.col("__sz") <= max_basket_size), "b")
            .drop("__sz")
        )
    item_n = m.groupBy("i").agg(F.count(F.lit(1)).alias("n"))
    pairs = (
        chunked_self_pairs(m, "b", "i")
        .groupBy(F.col("a_id").alias("item_a"), F.col("b_id").alias("item_b"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
    )
    return (
        pairs.join(
            F.broadcast(item_n.select(F.col("i").alias("item_a"), F.col("n").alias("n_a"))),
            "item_a",
        )
        .join(
            F.broadcast(item_n.select(F.col("i").alias("item_b"), F.col("n").alias("n_b"))),
            "item_b",
        )
        .select(
            "item_a",
            "item_b",
            "n_ab",
            "n_a",
            "n_b",
            F.expr(f"n_ab * n_ab * {_SCALE} DIV (n_a * n_b)").alias("cos2_micro"),
        )
    )


def item_topk_similar(cooc: DataFrame, k: int = 3) -> DataFrame:
    """``(item, rec, n_ab, cos2_micro, rk)`` — each item's top-k neighbors
    by cosine (exact integer order key), both orientations of the
    symmetric pair table, ties on (cos2 desc, rec asc)."""
    sym = cooc.select(
        F.col("item_a").alias("item"), F.col("item_b").alias("rec"), "n_ab", "cos2_micro"
    ).unionByName(
        cooc.select(
            F.col("item_b").alias("item"), F.col("item_a").alias("rec"), "n_ab", "cos2_micro"
        )
    )
    w = Window.partitionBy("item").orderBy(F.col("cos2_micro").desc(), F.col("rec").asc())
    return (
        sym.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("item", "rec", "n_ab", "cos2_micro", "rk")
    )


def als_user_halfstep(
    ratings: DataFrame,
    user_col: str = "user",
    item_col: str = "item",
    rating_col: str = "rating",
    lam: int = 1,
) -> DataFrame:
    """One exact ALS half-step with k=2 latent factors: fix item factors,
    solve every user's ridge normal equations in closed form.

    Item factors are training-free deterministic hashes (f ∈ 1..7 via the
    repo-standard Knuth multiplicative scheme), so this is the *system
    shape* of ALS — the per-user independent least-squares solve that makes
    ALS embarrassingly parallel — with a bit-replayable answer. With k=2
    the 2x2 system ``(A + λI) w = b`` inverts symbolically:

        det = (a11+λ)(a22+λ) - a12²          (all exact BIGINT)
        w1  = ((a22+λ)·b1 - a12·b2) / det
        w2  = ((a11+λ)·b2 - a12·b1) / det

    Numerators/denominator stay < 2^53, so the single double division is
    correctly rounded and ROUND(.,6) is engine-stable. One shuffle per
    groupBy: (user,item) dedup-sum, then the per-user moment aggregation —
    no per-user driver loop, scales with users × avg-degree. General k
    uses the Fraction Gauss–Jordan in operators/regress.py instead.
    """
    r = (
        ratings.groupBy(
            F.col(user_col).alias("u"), F.col(item_col).alias("itm")
        )
        .agg(F.sum(F.col(rating_col).cast("long")).alias("rt"))
    )
    h1 = (F.col("itm") * F.lit(2654435761)) % F.lit(4294967296)
    h2 = ((h1 % F.lit(1000003) + F.lit(7919)) * F.lit(2654435761)) % F.lit(4294967296)
    withf = r.select(
        "u", "rt", (h1 % 7 + 1).alias("f1"), (h2 % 7 + 1).alias("f2")
    )
    ag = withf.groupBy("u").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("f1") * F.col("f1")).alias("a11"),
        F.sum(F.col("f1") * F.col("f2")).alias("a12"),
        F.sum(F.col("f2") * F.col("f2")).alias("a22"),
        F.sum(F.col("f1") * F.col("rt")).alias("b1"),
        F.sum(F.col("f2") * F.col("rt")).alias("b2"),
    )
    det = (F.col("a11") + lam) * (F.col("a22") + lam) - F.col("a12") * F.col("a12")
    w1n = (F.col("a22") + lam) * F.col("b1") - F.col("a12") * F.col("b2")
    w2n = (F.col("a11") + lam) * F.col("b2") - F.col("a12") * F.col("b1")
    return ag.select(
        F.col("u").alias("user"),
        "n_items",
        F.round(w1n.cast("double") / det.cast("double"), 6).alias("w1"),
        F.round(w2n.cast("double") / det.cast("double"), 6).alias("w2"),
    )


def hitrate_loo(
    baskets: DataFrame,
    topk: DataFrame,
    basket_col: str = "basket",
    item_col: str = "item",
) -> DataFrame:
    """Leave-one-out hit-rate@k of an item-similarity recommender (the
    standard offline recsys eval — public methodology): for every basket
    with >= 2 distinct items, hold out the MAX item id (deterministic),
    recommend the union of the remaining items' top-k similar items
    (seeds excluded), and score a hit when the held-out item appears.

    ``topk`` is an :func:`item_topk_similar` table ``(item, rec, ...)``.
    Pure set algebra on exact integers: one distinct-membership shuffle,
    one max-per-basket aggregate, one seed->rec join, one semi-join —
    no windows, no floats until the single hitrate division. Returns ONE
    row: ``(n_baskets, n_eval, n_hits, hitrate_micro)``.
    """
    m = baskets.select(
        F.col(basket_col).alias("b"), F.col(item_col).alias("i")
    ).distinct()
    sizes = m.groupBy("b").agg(
        F.count(F.lit(1)).alias("sz"), F.max("i").alias("held")
    )
    n_baskets = sizes.count()
    ev = sizes.filter(F.col("sz") >= 2).select("b", "held")
    seeds = m.join(ev, "b").filter(F.col("i") != F.col("held"))
    recs = (
        seeds.join(
            topk.select(F.col("item").alias("i"), F.col("rec")), "i"
        )
        .select("b", "held", "rec")
        .distinct()
        # a seed item recommending another seed is not a hit candidate we
        # need to remove — only equality with the held-out item matters
    )
    hits = recs.filter(F.col("rec") == F.col("held")).select("b").distinct()
    out = ev.agg(F.count(F.lit(1)).alias("n_eval")).crossJoin(
        hits.agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return out.select(
        F.lit(n_baskets).cast("long").alias("n_baskets"),
        F.col("n_eval").cast("long").alias("n_eval"),
        F.col("n_hits").cast("long").alias("n_hits"),
        F.expr(
            "CASE WHEN n_eval > 0 THEN n_hits * 1000000 DIV n_eval"
            " ELSE CAST(0 AS BIGINT) END"
        ).alias("hitrate_micro"),
    )
