"""Frequent itemset mining (market-basket Apriori, sizes 2-3).

The copurchase graph this engine already builds (sources/graphs.py
lineitem_copurchase_graph, the SURVEY §2 S1 family) is the support>=1,
size=2 slice of this operator; frequent itemsets generalize it to
support-thresholded pair AND triple co-occurrence — the classic
market-basket / co-click mining workload a link-graph pipeline runs right
next to PageRank (association candidates, related-items, query-rewrite
pairs).

Scale design (the 100-TB story):

* **Apriori level-1 prune before any pair explode**: items below ``minsup``
  cannot appear in a frequent pair/triple (support is anti-monotone), so
  baskets are semi-joined down to frequent items first. On web corpora this
  is the big win — the item-frequency histogram is heavy-tailed and most of
  the long tail dies here, BEFORE the quadratic step.
* **Per-basket self-join, co-partitioned**: pairs come from one shuffle of
  the pruned basket table on ``basket_id``; both sides of the a<b self-join
  land in the same partition, so the explode is map-side after one shuffle.
  Triples extend per-basket pairs with a third co-partitioned probe — never
  a global cross join.
* **Apriori level-2 prune between pairs and triples**: candidate triples
  must have ALL three sub-pairs frequent; the extension semi-joins against
  the frequent-pair table on (a,c) and (b,c) before counting. The
  frequent-pair table is minsup-thresholded output, orders of magnitude
  smaller than raw pairs.
* **Hot-basket cap**: a mega-basket (a crawler session with 10^5 items)
  contributes g^2/2 pairs and g^3/6 triples. ``max_basket_size`` drops
  baskets above the cap EAGERLY with a logged count (same no-silent-
  truncation contract as dedup._capped_bucket_pairs / graphstats hub caps).
  Dropping whole baskets keeps support counts exact over the surviving
  baskets (a partial explode would undercount inconsistently).
* Support counts are exact BIGINTs — hash-stable across engines.

Reference parity: the reference's single hard-wired query family has no
mining analogue; this extends the engine the same way the training-data
operators do (task mandate). Oracle: naive pair/triple GROUP BY counts in
DuckDB — Apriori pruning is a pure optimization, the thresholded output is
identical.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

log = logging.getLogger(__name__)

__all__ = ["frequent_itemsets"]


def frequent_itemsets(
    baskets: DataFrame,
    minsup: int,
    max_size: int = 3,
    basket_col: str = "basket_id",
    item_col: str = "item",
    max_basket_size: int | None = None,
) -> DataFrame:
    """Return ``(size, a, b, c, support)`` for every itemset of 2..max_size
    distinct items co-occurring in at least ``minsup`` baskets (``c`` NULL
    for pairs; items ordered a < b < c, one canonical row per set).

    ``baskets``: (basket_col, item_col) membership rows; duplicates are
    collapsed (set semantics — support counts baskets, not occurrences).
    """
    if minsup < 1:
        raise ValueError(f"minsup must be >= 1, got {minsup}")
    if max_size not in (2, 3):
        raise ValueError(f"max_size must be 2 or 3, got {max_size}")

    b = baskets.select(
        F.col(basket_col).alias("bid"), F.col(item_col).alias("item")
    ).dropDuplicates(["bid", "item"])

    # Apriori level 1: only items frequent on their own can join a set
    freq_items = (
        b.groupBy("item").agg(F.count(F.lit(1)).alias("__s"))
        .filter(F.col("__s") >= minsup)
        .select("item")
    )
    b = b.join(freq_items, "item", "left_semi")

    if max_basket_size is not None:
        sizes = b.groupBy("bid").agg(F.count(F.lit(1)).alias("__n"))
        hot = sizes.filter(F.col("__n") > max_basket_size)
        stats = hot.agg(
            F.count(F.lit(1)).alias("baskets"), F.sum("__n").alias("slots")
        ).first()
        if stats["baskets"]:
            log.warning(
                "dropping %d hot baskets (> %d surviving items, %d item-slots) "
                "from itemset mining",
                stats["baskets"], max_basket_size, stats["slots"],
            )
            b = b.join(hot.select("bid"), "bid", "left_anti")

    # one shuffle on bid; the a<b self-join is co-partitioned after it
    pair_occ = (
        b.join(b.select("bid", F.col("item").alias("item2")), "bid")
        .filter(F.col("item") < F.col("item2"))
        .select("bid", F.col("item").alias("a"), F.col("item2").alias("b"))
    )
    f2 = (
        pair_occ.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= minsup)
    )
    out = f2.select(
        F.lit(2).alias("size"), "a", "b", F.lit(None).cast("long").alias("c"), "support"
    )
    if max_size == 2:
        return out

    # Apriori level 2: extend only frequent per-basket pairs with a third
    # item, and keep candidates whose (a,c) and (b,c) sub-pairs are frequent
    f2k = f2.select("a", "b")
    pair_f = pair_occ.join(f2k, ["a", "b"], "left_semi")
    cand = (
        pair_f.join(b.select("bid", F.col("item").alias("c")), "bid")
        .filter(F.col("c") > F.col("b"))
        .join(
            f2k.select(F.col("a").alias("__x"), F.col("b").alias("__y")),
            (F.col("a") == F.col("__x")) & (F.col("c") == F.col("__y")),
            "left_semi",
        )
        .join(
            f2k.select(F.col("a").alias("b"), F.col("b").alias("c")),
            ["b", "c"],
            "left_semi",
        )
    )
    f3 = (
        cand.groupBy("a", "b", "c")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= minsup)
        .select(F.lit(3).alias("size"), "a", "b", "c", "support")
    )
    return out.unionByName(f3)


def frequent_sequences(
    df: DataFrame,
    user_col: str,
    item_col: str,
    order_cols: list[str],
    minsup: int = 2,
) -> DataFrame:
    """GSP-style sequential pattern supports for lengths 2 and 3.

    A user supports pattern ``<a, b>`` iff some a-event strictly precedes
    some b-event in that user's timeline (the classic SUBSEQUENCE
    semantics, not adjacency — adjacency is ``sequences.transition_matrix``).
    Output ``(size, a, b, c, support)`` with ``c = ''`` for pairs, support =
    number of distinct supporting users, filtered to ``support >= minsup``.

    Existence algebra instead of occurrence enumeration — the trick that
    keeps this scale-safe:

    - ``<a, b>`` is supported iff ``first(a) < last(b)`` per user, so pair
      support needs only the per-(user, item) first/last positions: one
      window pass for positions, one groupBy, one per-user item self-join
      bounded by the ITEM VOCABULARY squared (never the timeline length).
    - ``<a, b, c>`` is supported iff ``first_b_after_first_a < last(c)``;
      the middle term joins first-positions against raw b-occurrences
      (bounded by timeline x vocabulary) and takes a min — no 3-way
      occurrence explosion.

    Exact integer counts; the ``seqpats_events`` gate replays both levels
    verbatim in DuckDB. Deterministic: positions come from a
    ``row_number`` ordered by the caller's explicit ``order_cols``
    (timestamp + id tiebreak).
    """
    w = Window.partitionBy(user_col).orderBy(*[F.col(c) for c in order_cols])
    ev = df.select(
        F.col(user_col).alias("u"),
        F.col(item_col).alias("it"),
        F.row_number().over(w).alias("pos"),
    ).localCheckpoint()  # referenced by three legs below
    tp = ev.groupBy("u", "it").agg(F.min("pos").alias("mn"), F.max("pos").alias("mx"))

    ta = tp.select("u", F.col("it").alias("a"), F.col("mn").alias("amn"))
    tb = tp.select("u", F.col("it").alias("b"), F.col("mx").alias("bmx"))
    out = (
        ta.join(tb, "u")
        .filter(F.col("amn") < F.col("bmx"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= minsup)
        .select(F.lit(2).alias("size"), "a", "b", F.lit("").alias("c"), "support")
    )

    # first b strictly after the first a, per (user, a, b)
    fab = (
        ta.join(ev.select("u", F.col("it").alias("b"), "pos"), "u")
        .filter(F.col("pos") > F.col("amn"))
        .groupBy("u", "a", "b")
        .agg(F.min("pos").alias("fb"))
    )
    tc = tp.select("u", F.col("it").alias("c"), F.col("mx").alias("cmx"))
    f3 = (
        fab.join(tc, "u")
        .filter(F.col("fb") < F.col("cmx"))
        .groupBy("a", "b", "c")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= minsup)
        .select(F.lit(3).alias("size"), "a", "b", "c", "support")
    )
    return out.unionByName(f3)


def association_rules(
    baskets: DataFrame,
    minsup: int,
    basket_col: str = "basket_id",
    item_col: str = "item",
    max_basket_size: int | None = None,
) -> DataFrame:
    """Directed association rules a -> b from the frequent pairs (Agrawal &
    Srikant 1994): confidence = sup(ab)/sup(a) and lift =
    n*sup(ab)/(sup(a)*sup(b)), both emitted as EXACT integer micro units
    (BIGINT products + one integer division — no float anywhere, so the
    rule ordering and the gate hash are reduction-order free).

    Reuses :func:`frequent_itemsets` (Apriori L1 prune + optional
    hot-basket cap) for the pair supports and joins per-item supports
    back; each frequent pair yields both directions.

    Returns ``(antecedent, consequent, support, conf_micro, lift_micro)``.
    """
    pairs = frequent_itemsets(
        baskets, minsup, max_size=2, basket_col=basket_col, item_col=item_col,
        max_basket_size=max_basket_size,
    ).select(F.col("a"), F.col("b"), F.col("support"))
    b = baskets.select(
        F.col(basket_col).alias("bid"), F.col(item_col).alias("item")
    ).dropDuplicates(["bid", "item"])
    sup1 = b.groupBy("item").agg(F.count(F.lit(1)).alias("s1"))
    n = b.select("bid").distinct().groupBy().agg(F.count(F.lit(1)).alias("nb"))
    both = pairs.unionByName(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"), "support")
    )
    joined = (
        both.join(sup1.select(F.col("item").alias("a"), F.col("s1").alias("sa")), "a")
        .join(sup1.select(F.col("item").alias("b"), F.col("s1").alias("sb")), "b")
        .crossJoin(F.broadcast(n))
    )
    return joined.select(
        F.col("a").alias("antecedent"),
        F.col("b").alias("consequent"),
        "support",
        F.expr("support * 1000000 DIV sa").alias("conf_micro"),
        F.expr("nb * support * 1000000 DIV (sa * sb)").alias("lift_micro"),
    )
