"""Sparse text retrieval: inverted index construction and BM25 ranking.

The lexical half of a RAG / training-data retrieval stack (the dense half is
:mod:`.similarity`): build posting lists over the corpus once, then rank
documents for a query with BM25 (Robertson-Spärck Jones; k1=1.2, b=0.75,
the standard Okapi defaults).

Scale shape (the 100-TB lens):

* **Indexing** is one explode + one map-side-combined aggregate keyed by
  (token, doc) — the word-count plan. Posting lists live partitioned by
  token, which is exactly the key BM25 probes, so scoring joins are
  co-located; document-frequency and length tables are vocabulary-/corpus-
  sized side tables.
* **Scoring** filters the postings to the query's tokens FIRST (an `isin`
  predicate that reaches the scan — the inverted-index lookup), so the work
  is proportional to the query terms' posting lists, never the corpus. The
  final top-k is `orderBy + limit` = TakeOrderedAndProject (per-partition
  heaps, k-row driver merge).
* **No Python anywhere** — tokenization, tf normalization, and the score
  sum are codegen'd expressions.

Hash-stable scores (repo discipline): the only float is the IDF log,
rounded to integer microunits PER TERM (`idf_micro`, the :mod:`.lm`
pattern). The Lucene-style IDF ``ln(1 + (N-df+0.5)/(df+0.5)) =
ln((2N+2)/(2df+1))`` is used rather than the raw Robertson form because it
is strictly positive for df <= N — so the later integral division never
sees a negative operand (Spark's ``div`` truncates toward zero, DuckDB's
``//`` floors; they only agree on non-negatives). The tf normalization is
exact integer rational arithmetic — with k1 = 6/5 and b = 3/4,

    tf_norm = tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
            = 44*L*tf / (20*L*tf + 6*L + 18*dl*N)        (avgdl = L/N)

so each term's contribution is ``(idf_micro * 44*L*tf) div (...)`` — one
EXACT integral division (Spark ``div`` on DECIMAL(38,0) operands is
BigDecimal divideToIntegralValue, not a scale-6 rounded ``/``), summed per
document as exact BIGINT. DECIMAL(38,0) intermediates dodge int64 overflow
at corpus scale (L up to 1e12 tokens is fine). A DuckDB oracle replays
every posting, idf, and score verbatim in HUGEINT.

Reference parity: estherlyoon/pagerank has no retrieval surface; this is
LLM-pipeline mandate breadth (SURVEY §2c).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["build_postings", "bm25_topk", "rrf_fuse"]

MICRO = 1_000_000


def _tokens(text_col: str):
    """Whitespace tokens, lowercased, empties dropped — the textops
    convention so retrieval sees the same tokens as tf-idf/LM scoring."""
    return F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda t: F.length(t) > 0
    )


def build_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Inverted index: ``(token, doc_id, tf)`` posting rows, partitioned by
    the probe key. One explode + one map-side-combined count."""
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(_tokens(text_col)).alias("token"))
        .groupBy("token", "doc_id")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


def bm25_topk(
    docs: DataFrame,
    query_tokens: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    postings: DataFrame | None = None,
) -> DataFrame:
    """``(doc_id, score_micro)`` — the BM25 top-``k`` for a bag-of-words
    query, ties broken by ascending doc id. ``score_micro`` is the exact
    BIGINT micro-scaled score (see module docstring). Pass a pre-built
    ``postings`` frame to amortize indexing across queries."""
    if not query_tokens:
        raise ValueError("query_tokens must be non-empty")
    q = sorted({t.lower() for t in query_tokens})
    post = postings if postings is not None else build_postings(docs, id_col, text_col)
    # corpus stats as a 1-row broadcast frame: N docs, L total tokens
    dl = docs.select(
        F.col(id_col).alias("doc_id"), F.size(_tokens(text_col)).cast("long").alias("dl")
    )
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.coalesce(F.sum("dl"), F.lit(0)).cast("long").alias("total_len"),
    )
    hits = post.filter(F.col("token").isin(q))
    df_tbl = hits.groupBy("token").agg(F.countDistinct("doc_id").cast("long").alias("df"))
    # idf_micro per term: the module's single float, rounded before any sum;
    # ln((2N+2)/(2df+1)) > 0 whenever df <= N, so downstream ints stay positive
    idf = df_tbl.crossJoin(F.broadcast(stats)).select(
        "token",
        F.round(
            F.log(
                (2 * F.col("n_docs") + 2).cast("double")
                / (2 * F.col("df") + 1).cast("double")
            )
            * MICRO
        )
        .cast("long")
        .alias("idf_micro"),
    )
    d38 = "decimal(38,0)"
    contrib = (
        hits.join(F.broadcast(idf), "token")
        .join(dl.hint("shuffle_hash"), "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "num",
            F.col("idf_micro").cast(d38)
            * F.lit(44).cast(d38)
            * F.col("total_len").cast(d38)
            * F.col("tf").cast(d38),
        )
        .withColumn(
            "den",
            F.lit(20).cast(d38) * F.col("total_len").cast(d38) * F.col("tf").cast(d38)
            + F.lit(6).cast(d38) * F.col("total_len").cast(d38)
            + F.lit(18).cast(d38) * F.col("dl").cast(d38) * F.col("n_docs").cast(d38),
        )
        # `div` = IntegralDivide: exact divideToIntegralValue on decimals,
        # NOT the scale-6-rounded `/` — matches DuckDB `//` on positives
        .select("doc_id", F.expr("num div den").alias("c"))
    )
    return (
        contrib.groupBy("doc_id")
        .agg(F.sum("c").alias("score_micro"))
        .orderBy(F.col("score_micro").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def rrf_fuse(
    rankings: dict[str, DataFrame],
    k: int = 60,
    id_col: str = "doc_id",
    score_col: str = "score",
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Büttcher 2009, public
    methodology) of named candidate rankings — the standard hybrid
    lexical+dense combiner: each ranking contributes ``1/(k + rank)`` per
    document, summed across rankers.

    Every input frame is ``(id_col, score_col)`` with higher = better;
    ranks are dense row numbers with ascending-id tiebreak. Contributions
    are exact integers (``1000000000 DIV (k + rank)`` — no float), so the
    fused ``rrf_scaled`` is a reduction-order-free BIGINT.

    Scale shape: inputs are top-k REDUCTIONS (TakeOrderedAndProject
    outputs, k rows each), so the global rank window here runs over k-row
    frames — never the corpus; the fuse itself is a union + one grouped
    sum over at most ``len(rankings) * k`` rows. Never feed a corpus-sized
    frame: rank it to top-k first (that is where the distributed work
    belongs).
    """
    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranking")
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    legs = [
        df.select(
            F.col(id_col).alias("id"), F.row_number().over(w).alias("r")
        )
        for df in rankings.values()
    ]
    u = legs[0]
    for leg in legs[1:]:
        u = u.unionByName(leg)
    return u.groupBy(F.col("id").alias(id_col)).agg(
        F.sum(F.expr(f"1000000000 DIV ({int(k)} + r)")).alias("rrf_scaled"),
        F.count(F.lit(1)).alias("n_rankers"),
    )


def phrase_search(
    docs: DataFrame,
    phrase: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact positional phrase matching ("words adjacent, in order") — the
    retrieval primitive BM25's bag-of-words scoring cannot express; the
    classic implementation is a positional-postings self-join, but for a
    phrase known at plan time the scalable shape is better: ONE zero-shuffle
    projection that slides the k-word window over each document's token
    array inside codegen (``filter(sequence(...))`` — per-row work is
    O(tokens * k), no explode, no join, nothing leaves the row).

    Tokenization matches the corpus-wide convention (lowercase
    ``[a-z0-9]+`` runs). Returns matching docs only:
    ``(id_col, n_tokens, n_hits)`` with ``n_hits`` = number of (possibly
    overlapping) occurrences — exact integers.
    """
    words = re.findall(r"[a-z0-9]+", phrase.lower())
    if not words:
        raise ValueError("phrase must contain at least one token")
    k = len(words)
    conds = " AND ".join(
        "element_at(__toks, CAST(i AS INT) + {off}) = '{w}'".format(off=off, w=w)
        for off, w in enumerate(words)
    )
    hits = F.expr(
        f"size(filter(sequence(1, size(__toks) - {k} + 1), i -> {conds}))"
    )
    return (
        docs.select(
            F.col(id_col),
            F.expr(
                f"regexp_extract_all(lower(coalesce({text_col}, '')), '[a-z0-9]+', 0)"
            ).alias("__toks"),
        )
        .filter(F.size("__toks") >= k)
        .select(
            id_col,
            F.size("__toks").cast("long").alias("n_tokens"),
            hits.cast("long").alias("n_hits"),
        )
        .filter(F.col("n_hits") > 0)
    )
