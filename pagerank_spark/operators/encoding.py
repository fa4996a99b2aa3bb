"""Categorical/text feature encoders for training-data pipelines.

- :func:`target_encode_loo` — leave-one-out target encoding: each row gets
  the mean target of its category EXCLUDING itself (the standard
  leakage-free variant), as an exact integer in micro-units:
  ``(sum_cat - y_i) * 10^6 div (cnt_cat - 1)``. Singleton categories fall
  back to the global mean (same exact arithmetic). One map-side-combined
  aggregation over the categories plus one broadcast-friendly join back —
  the table is scanned once and never re-shuffled, the classic 100-TB shape
  for per-category statistics. Integer division requires a NON-NEGATIVE
  target (Spark's ``div`` truncates toward zero while DuckDB's ``//``
  floors — they only agree on non-negatives; the gate emits FLOOR'd prices,
  which are non-negative by TPC-H construction).
- :func:`feature_hash` — the hashing trick (Weinberger et al. 2009):
  whitespace tokens -> engine-neutral polynomial hash -> ``mod n_buckets``
  -> per-row sparse ``(bucket, cnt)`` counts. No vocabulary pass, no
  driver-side dictionary — the property that makes it the scale encoder
  (CountVectorizer needs a global vocab broadcast; the hasher needs
  nothing). Collisions are the documented trade; n_buckets controls them.
  Uses the same ``_poly31`` char hash as operators/sketches.py so DuckDB
  restates it exactly.

Reference parity: none in the reference (single-query engine) — LLM-training
pipeline mandate breadth (feature engineering over corpus metadata).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .sketches import _poly31


def target_encode_loo(
    df: DataFrame,
    cat_col: str,
    target_col: str,
    id_col: str,
    scale: int = 1_000_000,
) -> DataFrame:
    """``(id_col, cat_col, te_micro)`` — exact-integer LOO target means.

    ``target_col`` must be integer-valued and non-negative (see module
    docstring for the division-semantics contract).
    """
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(cat_col).alias("cat"),
        F.col(target_col).cast("long").alias("y"),
    )
    stats = base.groupBy("cat").agg(
        F.sum("y").alias("s"), F.count(F.lit(1)).alias("c")
    )
    g = base.groupBy().agg(F.sum("y").alias("gs"), F.count(F.lit(1)).alias("gc"))
    out = (
        base.join(F.broadcast(stats), "cat")
        .crossJoin(F.broadcast(g))
        .select(
            "id",
            F.col("cat").alias(cat_col),
            F.when(
                F.col("c") > 1,
                F.expr(f"(s - y) * {scale} DIV (c - 1)"),
            )
            .otherwise(F.expr(f"gs * {scale} DIV gc"))
            .cast("long")
            .alias("te_micro"),
        )
    )
    return out.withColumnRenamed("id", id_col)


def feature_hash(
    df: DataFrame,
    text_col: str,
    id_col: str,
    n_buckets: int = 64,
) -> DataFrame:
    """``(id_col, bucket, cnt)`` hashed token counts per row (sparse)."""
    toks = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.split(F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), r"\s+")
        ).alias("tok"),
    ).filter(F.col("tok") != "")
    return (
        toks.select("id", F.pmod(_poly31(F.col("tok")), F.lit(n_buckets)).alias("bucket"))
        .groupBy("id", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumnRenamed("id", id_col)
    )


def group_zscore(
    df: DataFrame, group_col: str, value_col: str, out_col: str = "z_micro"
) -> DataFrame:
    """Per-group z-score standardization (the feature-engineering
    normalizer): ``z = (x - mean_g) / std_g`` with POPULATION std, emitted
    micro-scaled via floor(x*1e6 + 0.5).

    Exactness: per-group mean/variance come from exact BIGINT moments
    ``(n, s, ssq)`` in one map-side-combined aggregation; the n-scalings
    cancel into the closed form ``z = (n*x - s) / sqrt(n*ssq - s^2)`` —
    exact integers into two correctly-rounded IEEE ops, no float
    reduction anywhere. Groups with zero variance emit NULL.

    Scale shape: one aggregation (groups-sized) broadcast back onto the
    scan — the fact table is read once and never shuffled. Overflow
    contract (caller's): ``n_g * ssq_g < 2^63`` — quantize wide values.

    Returns the input columns plus ``out_col``.
    """
    m = df.groupBy(F.col(group_col)).agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.col(value_col).cast("long")).alias("__s"),
        F.sum(F.col(value_col).cast("long") * F.col(value_col).cast("long")).alias("__q"),
    )
    z = F.expr(
        f"CASE WHEN __n * __q - __s * __s > 0 THEN"
        f" (CAST(__n AS DOUBLE) * {value_col} - __s)"
        f" / sqrt(CAST(__n * __q - __s * __s AS DOUBLE)) END"
    )
    return (
        df.join(F.broadcast(m), group_col)
        .withColumn(out_col, F.floor(z * F.lit(1_000_000) + F.lit(0.5)).cast("long"))
        .drop("__n", "__s", "__q")
    )
