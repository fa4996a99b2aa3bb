"""RFM customer segmentation — recency / frequency / monetary quantile
scores, the classic marketing-analytics partitioning (Hughes 1994, public
methodology), built entirely from the repo's exact-quantile machinery.

Pipeline shape (100-TB lens): the fact table is scanned ONCE into the
per-key (recency, frequency, monetary) profile (one map-side-combined
aggregation keyed on the customer); each metric's quantile cutpoints come
from :func:`..operators.packing.exact_quantiles` (value histogram +
distributed prefix sum — |distinct| rows, never the raw table, no global
window); scoring is a broadcast of 3*(bins-1) cutpoint rows back onto the
profile — one codegen'd projection. Everything is exact BIGINT arithmetic;
ties at a cutpoint bin deterministically (score counts strict ``>``).

Scores: frequency/monetary score ``1 + #{cutpoints < value}`` (higher =
better); recency score is INVERTED (``bins - #{cutpoints < recency}``) so
recent customers score high. ``segment = 100*r + 10*f + m``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["rfm_scores"]


def rfm_scores(
    facts: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    n_bins: int = 5,
) -> DataFrame:
    """Per-key RFM profile + quantile scores.

    ``value_col`` must be integer-valued (pre-scale to cents). Recency is
    whole days between the key's last fact and the global last fact (both
    exact epoch-day BIGINTs). Returns ``(key, recency_days, frequency,
    monetary, r_score, f_score, m_score, segment)``.
    """
    from .packing import exact_quantiles

    day = F.expr(f"CAST(FLOOR(unix_timestamp({ts_col})) AS BIGINT) DIV 86400")
    prof = facts.groupBy(F.col(key_col).alias("k")).agg(
        F.max(day).alias("__last"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col(value_col).cast("long")).alias("monetary"),
    )
    asof = prof.groupBy().agg(F.max("__last").alias("__asof"))
    prof = (
        prof.crossJoin(F.broadcast(asof))
        .select(
            "k",
            (F.col("__asof") - F.col("__last")).alias("recency_days"),
            "frequency",
            "monetary",
        )
        .localCheckpoint()  # feeds three cutpoint scans + the final scoring
    )
    probes = [(i, n_bins) for i in range(1, n_bins)]

    def cuts(metric: str) -> DataFrame:
        return (
            exact_quantiles(prof, metric, probes)
            .groupBy()
            .agg(F.sort_array(F.collect_list("value")).alias(f"__c_{metric}"))
        )

    scored = (
        prof.crossJoin(F.broadcast(cuts("recency_days")))
        .crossJoin(F.broadcast(cuts("frequency")))
        .crossJoin(F.broadcast(cuts("monetary")))
        .select(
            F.col("k").alias(key_col),
            "recency_days",
            "frequency",
            "monetary",
            F.expr(
                f"CAST({n_bins} - size(filter(__c_recency_days, c -> c < recency_days)) AS BIGINT)"
            ).alias("r_score"),
            F.expr(
                "CAST(1 + size(filter(__c_frequency, c -> c < frequency)) AS BIGINT)"
            ).alias("f_score"),
            F.expr(
                "CAST(1 + size(filter(__c_monetary, c -> c < monetary)) AS BIGINT)"
            ).alias("m_score"),
        )
    )
    return scored.withColumn(
        "segment",
        (100 * F.col("r_score") + 10 * F.col("f_score") + F.col("m_score")).cast("long"),
    )
