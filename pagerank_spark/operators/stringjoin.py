"""Exact edit-distance similarity join (Ed-Join-style prefix filtering).

Every pair of strings within Levenshtein distance ``k`` — without an
all-pairs join. The filter chain (Xiao, Wang & Lin, VLDB'08 "Ed-Join",
adapted to the set-prefix form used by :func:`~pagerank_spark.operators.
dedup.jaccard_similarity_join`):

- **q-gram lower bound**: one edit operation destroys at most ``q`` of a
  string's distinct q-grams, so ``ed(s, t) <= k`` implies s has at most
  ``k*q`` distinct q-grams that t lacks. Under ANY global total order on
  q-grams, s and t must therefore share a gram within each side's first
  ``k*q + 1`` grams — the prefix-filtering theorem with overlap
  ``|G(s)| - k*q``.
- **rarest-first order**: grams are ordered by ascending corpus frequency,
  so the candidate equi-join keys on grams that appear in few strings;
  frequent grams (the quadratic hazard) are pushed out of every prefix.
- **length band**: ``ed <= k`` implies ``| |s| - |t| | <= k``, applied
  inside the join condition.
- **verification**: exact ``levenshtein`` on candidates only (Spark
  built-in, codegen'd — DuckDB's ``levenshtein`` restates it in the gate).

Short-string tail: a string with fewer than ``k*q + 1`` distinct grams
(length < q*(k+1)) cannot carry a full prefix, so the theorem does not
apply. Those strings are matched by an explicit length-band join against
the by-length buckets instead (2k+1 equi-joins on exact length) — still no
cartesian product; the bucket sizes bound the work, and short strings are a
vanishing fraction of any real corpus (log-normal lengths). Both candidate
families are unioned, deduped, then verified, so the result is EXACT for
every length.

Scale shape: one gram explode -> frequency aggregate (map-side combined) ->
frequency join back -> per-string rarest-prefix window (bounded at k*q+1
rows per string) -> gram-keyed equi self-join -> verify. The same
``max_gram_bucket`` precision-trade guard as the Jaccard join is available
for adversarial corpora of near-identical strings; leave ``None`` for
exactness (collapse exact duplicates first).

Reference parity: no string operators exist in the reference; this is
LLM-pipeline breadth (typo-tolerant entity resolution / near-key joins).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .skew import chunked_self_pairs


def edit_distance_join(
    df: DataFrame,
    k: int = 1,
    q: int = 3,
    id_col: str = "id",
    text_col: str = "s",
    max_gram_bucket: int | None = None,
) -> DataFrame:
    """All pairs ``(a_id, b_id, dist)`` with ``a_id < b_id`` and
    ``levenshtein <= k``. Exact (modulo the optional bucket guard)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if q < 2:
        raise ValueError(f"q must be >= 2, got {q}")
    pk = k * q + 1  # prefix size
    min_long = q * (k + 1)  # strings at least this long carry a full prefix

    s = df.select(
        F.col(id_col).alias("id"), F.coalesce(F.col(text_col), F.lit("")).alias("s")
    ).withColumn("len", F.length("s"))
    s = s.localCheckpoint()  # referenced by both candidate families + verify

    long_s = s.filter(F.col("len") >= min_long)
    grams = (
        long_s.select(
            "id",
            "len",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.col("len") - q + 1),
                    lambda i: F.col("s").substr(i, F.lit(q)),
                )
            ).alias("g"),
        )
        .dropDuplicates(["id", "g"])
    )
    freq = grams.groupBy("g").agg(F.count(F.lit(1)).alias("gf"))
    rn = F.row_number().over(
        Window.partitionBy("id").orderBy(F.col("gf").asc(), F.col("g").asc())
    )
    prefix = (
        grams.join(freq, "g")
        .select("id", "len", "g", rn.alias("rn"))
        .filter(F.col("rn") <= pk)
        .select("id", "len", "g")
    )
    if max_gram_bucket is not None:
        bucket = prefix.groupBy("g").agg(F.count(F.lit(1)).alias("bc"))
        hot = bucket.filter(F.col("bc") > max_gram_bucket)
        n_hot = hot.count()
        if n_hot:
            import warnings

            warnings.warn(
                f"edit_distance_join: dropping {n_hot} prefix grams with bucket "
                f"> {max_gram_bucket} (documented precision trade)"
            )
        prefix = prefix.join(hot.select("g"), "g", "left_anti")

    # Bounded-chunk candidate enumeration (operators/skew.py::
    # chunked_self_pairs): a bare gram-keyed self-join broadcast the tiny
    # prefix table, so the 130M-row candidate enumeration ran at the stream
    # side's AQE-coalesced parallelism — wall flat ~50s from local[8] to
    # local[32] on sf0.1 part names. Chunked: 50.7s -> 25.2s / 15.2s,
    # two-parallelism efficiency 0.25 -> 0.41 (BENCH/BASELINE.md).
    cand_long = (
        chunked_self_pairs(prefix, "g", "id", extra_cols=("len",))
        .filter(F.abs(F.col("a_len") - F.col("b_len")) <= k)
        .select("a_id", "b_id")
    )

    # short-string tail: explicit length-band join (2k+1 exact-length keys)
    short_s = s.filter(F.col("len") < min_long).select(
        F.col("id").alias("a_id"), F.col("len").alias("a_len")
    )
    by_len = s.select(F.col("id").alias("b_id"), F.col("len").alias("b_len"))
    cand_short = None
    for d in range(-k, k + 1):
        c = short_s.join(
            by_len,
            (F.col("b_len") == F.col("a_len") + d) & (F.col("a_id") < F.col("b_id")),
        ).select("a_id", "b_id")
        cand_short = c if cand_short is None else cand_short.unionByName(c)

    cands = cand_long.unionByName(cand_short).dropDuplicates(["a_id", "b_id"])
    sa = s.select(F.col("id").alias("a_id"), F.col("s").alias("sa"))
    sb = s.select(F.col("id").alias("b_id"), F.col("s").alias("sb"))
    return (
        cands.join(sa, "a_id")
        .join(sb, "b_id")
        .withColumn("dist", F.levenshtein("sa", "sb"))
        .filter(F.col("dist") <= k)
        .select("a_id", "b_id", F.col("dist").cast("int"))
    )
