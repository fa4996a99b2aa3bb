"""Multinomial Naive Bayes text classification — train and predict as pure
Catalyst plans.

The classic counting classifier (McCallum & Nigam 1998, "A Comparison of
Event Models for Naive Bayes Text Classification" — public methodology):
train = one token-count aggregation per class, predict = per-document sum of
per-token log-likelihoods plus a class prior. It is the canonical first
labeler in corpus pipelines (language/domain/quality routing) because both
phases are relational:

* **Training** is two map-side-combined aggregates over the exploded token
  stream — per-(class, token) counts and per-class totals — exactly the
  word-count plan. The model tables are vocabulary x classes sized (small),
  ``localCheckpoint``'d so scoring reads the trained model instead of
  re-running the aggregates per action (the lm.py discipline).
* **Prediction** explodes each document's tokens once, joins the (class,
  token) cost table, and aggregates per (doc, class). The corpus is scanned
  once; the model side is broadcast-sized. No Python anywhere — tokenize,
  smooth, log, and argmin are all codegen'd expressions.

Hash-stable outputs: per-token add-k cost ``-LN((c+k)/(N_c+k*V))`` is
rounded to integer MICROUNITS before any summation (the repo-wide
discipline for float-derived gate outputs — see operators/lm.py), so
document scores are exact BIGINTs, reduction-order independent, and the
argmin is deterministic with a lexicographic class tiebreak. Costs are
strictly positive (p < 1 always under add-k with V > 1), keeping integer
division and rounding away from engine-divergent negative semantics.

Reference parity: none (the reference is a single-query link-graph engine);
LLM-training-pipeline mandate breadth — corpus routing/labeling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = ["train_naive_bayes", "nb_predict", "logreg_gd"]

_SCALE = 1_000_000


def _tokens(df: DataFrame, id_cols: list[str], text_col: str) -> DataFrame:
    """(id_cols..., tok) — lowercased whitespace tokens, empties dropped
    (same convention as operators/encoding.py::feature_hash)."""
    return df.select(
        *id_cols,
        F.explode(
            F.split(F.trim(F.lower(F.coalesce(F.col(text_col), F.lit("")))), r"\s+")
        ).alias("tok"),
    ).filter(F.col("tok") != "")


def train_naive_bayes(
    docs: DataFrame, class_col: str = "lang", text_col: str = "text"
) -> tuple[DataFrame, DataFrame, int, int]:
    """Count-based multinomial NB model.

    Returns ``(token_counts, class_stats, vocab_size, n_docs)`` where
    ``token_counts`` is ``(cls, tok, c)``, ``class_stats`` is
    ``(cls, n_tokens, n_docs_c)``, ``vocab_size`` the corpus-wide distinct
    token count and ``n_docs`` the training row count. Two shuffles, both
    map-side combined; two scalar actions (vocab size, doc count).
    """
    toks = _tokens(docs, [class_col], text_col).withColumnRenamed(class_col, "cls")
    token_counts = (
        toks.groupBy("cls", "tok").agg(F.count(F.lit(1)).alias("c")).localCheckpoint()
    )
    class_stats = (
        docs.select(F.col(class_col).alias("cls"))
        .groupBy("cls")
        .agg(F.count(F.lit(1)).alias("n_docs_c"))
        .join(
            token_counts.groupBy("cls").agg(F.sum("c").alias("n_tokens")),
            "cls",
            "left",
        )
        .fillna(0, ["n_tokens"])
        .localCheckpoint()
    )
    vocab_size = token_counts.select("tok").distinct().count()
    n_docs = docs.count()
    return token_counts, class_stats, vocab_size, n_docs


def nb_predict(
    docs: DataFrame,
    token_counts: DataFrame,
    class_stats: DataFrame,
    vocab_size: int,
    n_docs: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    add_k: int = 1,
) -> DataFrame:
    """``(id_col, pred_cls, cost_micro)`` — argmin total micro-cost class.

    Per-token cost ``-LN((c + k) / (N_c + k*V))`` and per-class prior cost
    ``-LN(n_docs_c / n_docs)`` are each micro-rounded BEFORE summation;
    the winning class minimizes ``prior + sum(cnt * token_cost)`` with
    ties broken by class name. Documents with no tokens score the prior
    alone (the most frequent class wins).
    """
    # doc x class scaffold keeps empty-token documents (C is small — the
    # explode below is the heavy side and runs once)
    classes = class_stats.select(
        "cls",
        F.round(
            -F.log(F.col("n_docs_c").cast("double") / F.lit(float(n_docs))) * _SCALE
        )
        .cast("long")
        .alias("prior_micro"),
        "n_tokens",
    )
    doc_tok = (
        _tokens(docs, [id_col], text_col)
        .groupBy(id_col, "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    tok_cost = (
        doc_tok.crossJoin(F.broadcast(classes.select("cls", "n_tokens")))
        .join(token_counts, ["cls", "tok"], "left")
        .select(
            id_col,
            "cls",
            (
                F.col("cnt")
                * F.round(
                    -F.log(
                        (F.coalesce(F.col("c"), F.lit(0)) + F.lit(add_k)).cast("double")
                        / (F.col("n_tokens") + F.lit(add_k) * F.lit(vocab_size))
                    )
                    * _SCALE
                ).cast("long")
            ).alias("part"),
        )
        .groupBy(id_col, "cls")
        .agg(F.sum("part").alias("tok_micro"))
    )
    scored = (
        docs.select(id_col)
        .crossJoin(F.broadcast(classes.select("cls", "prior_micro")))
        .join(tok_cost, [id_col, "cls"], "left")
        .select(
            id_col,
            "cls",
            (F.col("prior_micro") + F.coalesce(F.col("tok_micro"), F.lit(0))).alias(
                "cost_micro"
            ),
        )
    )
    best = F.expr(
        f"min_by(struct(cost_micro, cls), struct(cost_micro, cls))"
    )
    return (
        scored.groupBy(id_col)
        .agg(best.alias("b"))
        .select(id_col, F.col("b.cls").alias("pred_cls"), F.col("b.cost_micro").alias("cost_micro"))
    )


def nearest_centroid(
    train: DataFrame,
    test: DataFrame,
    label_col: str = "label",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 1024,
) -> DataFrame:
    """Nearest-centroid (Rocchio) classification over embedding vectors.

    Vectors snap to the integer grid ``round(x*scale)``
    (operators/clustering.quantize_vectors), so class centroids are exact
    rational ``S_c / n_c`` held as BIGINT sums + counts, and the squared
    distance to a centroid is the exact BIGINT ``delta_c = sum_p (n_c*x_p -
    S_cp)^2`` divided by ``n_c^2`` — the division happens ONCE in double
    (correctly-rounded ops over exact ints: reduction-order-free).
    Prediction = min over classes with a deterministic (dist, label)
    tiebreak via a per-test-vector keyed window.

    Scale shape: the centroid table is classes x D rows (one posexplode +
    map-side-combined sum — tiny), broadcast back; the test scan is one
    zip_with/aggregate lambda per class — no per-row Python, no global
    window. Overflow contract: ``n_c * scale`` under ~3e9 (per-class rows
    times grid; quantize down for million-row classes).

    Returns ``(id_col, label_true, pred, dist)`` per test row.
    """
    from .clustering import quantize_vectors

    tr = quantize_vectors(train, scale, vec_col, "__qv")
    te = quantize_vectors(test, scale, vec_col, "__qv")
    cent = (
        tr.select(F.col(label_col).alias("__cl"), F.posexplode("__qv").alias("pos", "val"))
        .groupBy("__cl", "pos")
        .agg(F.sum("val").alias("s"))
        .groupBy("__cl")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "s"))).alias("ps"))
        .select("__cl", F.expr("transform(ps, p -> p.s)").alias("sv"))
        .join(tr.groupBy(F.col(label_col).alias("__cl")).agg(F.count(F.lit(1)).alias("n")), "__cl")
    )
    scored = (
        te.crossJoin(F.broadcast(cent))
        .select(
            F.col(id_col),
            F.col(label_col).alias("label_true"),
            F.col("__cl").alias("pred"),
            F.expr(
                "CAST(aggregate(zip_with(__qv, sv, (x, s) -> (n * x - s) * (n * x - s)),"
                " 0L, (acc, v) -> acc + v) AS DOUBLE)"
                " / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))"
            ).alias("dist"),
        )
    )
    w = Window.partitionBy(id_col).orderBy("dist", "pred")
    return scored.withColumn("__rn", F.row_number().over(w)).where(F.col("__rn") == 1).drop("__rn")


def logreg_gd(
    units: DataFrame,
    label: Column,
    features: list[Column],
    iters: int = 3,
    eta: float = 0.125,
) -> DataFrame:
    """Distributed logistic regression by full-batch gradient descent —
    the textbook convex-training loop (public methodology; the
    data-parallel shape of every parameter-server/allreduce trainer):
    each iteration is ONE map-side-combined aggregation producing the
    d+1 gradient components, driver traffic is d+1 numbers, and the
    coefficient update runs driver-side — the BPE/Bradley-Terry
    "k scalar collects for k rounds" pattern. No per-row Python: the
    sigmoid and gradient terms are codegen'd expressions.

    Determinism/hash-stability: coefficients live as exact-integer-derived
    doubles — every per-row gradient term ``(sigmoid(beta.x) - y) * x_j``
    is nano-rounded BEFORE the (order-free) BIGINT sum, so the only
    cross-engine risk is EXP's 1-ulp at a nano boundary (the lm.py
    discipline); the driver update ``b - eta*((g/1e9)/n)`` is the same
    IEEE tree the SQL oracle states, and Python shortest-repr literals
    round-trip doubles exactly into both engines' parsers. ``eta`` should
    be dyadic. Features should be pre-scaled to O(1) magnitudes (dyadic
    divisors keep the scaling exact).

    Returns ONE row: ``(n, beta0_nano..betaD_nano, n_correct,
    prob_sum_nano)`` — trained coefficients (bias first), 0/1 accuracy
    count at the 0.5 threshold, and the nano-summed predicted mass.
    """
    if iters < 1:
        raise ValueError("iters must be >= 1")
    d = len(features) + 1
    el = repr(float(eta))
    rows = units.select(
        label.cast("long").alias("y"),
        *[feat.cast("double").alias(f"x{j}") for j, feat in enumerate(features, start=1)],
    ).localCheckpoint()
    n = rows.count()
    beta = [0.0] * d

    def _z() -> str:
        t = repr(beta[0])
        for j in range(1, d):
            t = f"({t} + {repr(beta[j])} * x{j})"
        return t

    for _ in range(int(iters)):
        s = f"(1.0 / (1.0 + EXP(-({_z()}))))"
        aggs = []
        for j in range(d):
            xj = "1.0" if j == 0 else f"x{j}"
            aggs.append(
                F.expr(
                    f"SUM(CAST(ROUND((({s} - CAST(y AS DOUBLE)) * {xj})"
                    f" * 1000000000.0) AS BIGINT))"
                ).alias(f"g{j}")
            )
        g = rows.agg(*aggs).collect()[0]
        beta = [
            beta[j] - float(eta) * ((g[f"g{j}"] / 1e9) / n) for j in range(d)
        ]
    s = f"(1.0 / (1.0 + EXP(-({_z()}))))"
    out = rows.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr(
            f"SUM(CASE WHEN ({_z()} >= 0.0) = (y = 1) THEN 1 ELSE 0 END)"
        ).cast("long").alias("n_correct"),
        F.expr(
            f"SUM(CAST(ROUND({s} * 1000000000.0) AS BIGINT))"
        ).alias("prob_sum_nano"),
    )
    for j in range(d):
        out = out.withColumn(f"beta{j}_nano", F.lit(round(beta[j] * 1e9)).cast("long"))
    return out.select(
        "n", *[f"beta{j}_nano" for j in range(d)], "n_correct", "prob_sum_nano"
    )


def knn_classifier_loo(
    emb: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Leave-one-out k-nearest-neighbor classification over an embedding
    corpus (Fix & Hodges 1951; Cover & Hart 1967 — public methodology):
    every vector is scored by the majority label of its k cosine
    neighbors (itself excluded — the knn_graph contract), the standard
    embedding-quality probe ("are same-label points neighbors?") run
    before trusting a representation for retrieval or dedup.

    Composes the exact quantized-cosine :func:`~pagerank_spark.operators.
    similarity.knn_graph` (deterministic ranks, integer dot products) with
    one label join and a per-vector keyed-window argmax under the total
    order ``(votes DESC, label ASC)`` — fully deterministic, no floats
    past the reused kNN. Returns ``(vec_id, label, pred, votes,
    correct)`` one row per scorable vector (zero-norm vectors drop with
    the kNN contract).
    """
    from .similarity import knn_graph

    g = knn_graph(emb, k=k, id_col=id_col, vec_col=vec_col)
    lab = emb.select(F.col(id_col).alias("neighbor"), F.col(label_col).alias("__nl"))
    votes = (
        g.join(lab, "neighbor")
        .groupBy(F.col(id_col), F.col("__nl"))
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = Window.partitionBy(id_col).orderBy(F.col("votes").desc(), F.col("__nl").asc())
    top = (
        votes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(id_col, F.col("__nl").alias("pred"), "votes")
    )
    own = emb.select(F.col(id_col), F.col(label_col).alias("label"))
    return top.join(own, id_col).select(
        id_col,
        F.col("label").cast("long").alias("label"),
        F.col("pred").cast("long").alias("pred"),
        F.col("votes").cast("long").alias("votes"),
        (F.col("pred") == F.col("label")).cast("long").alias("correct"),
    )
