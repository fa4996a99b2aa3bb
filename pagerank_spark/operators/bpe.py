"""Distributed BPE merge-rule learning over a documents table.

Byte-pair-encoding tokenizer training is the canonical sequential-looking
algorithm that distributes cleanly: each round is (1) one exploded
adjacent-pair count — a map-side-combined groupBy over the corpus — and
(2) one argmax row to the driver (count desc, pair asc: deterministic), and
(3) one pure-JVM ``aggregate`` lambda projection applying the merge greedily
left-to-right to every token array. k merge rules cost k shuffles over the
corpus; no per-row Python anywhere, and the driver traffic is k single-row
collects regardless of corpus size.

This is word-level BPE (tokens = whitespace words, merges join adjacent
words), the same recurrence as subword BPE — the testdata corpus has no
sub-word structure, and the merge/apply machinery is representation-
agnostic. Merged tokens are joined with ``\\x1f`` (unit separator) so merge
boundaries can never be confused with the original text.

Eager localCheckpoint per round: the apply-lambda nests one level per
round, so without truncation round k's plan holds k stacked aggregates over
the original scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEP = "\x1f"


def _adjacent_pairs(tok_col: str):
    """array<struct<l,r>> of adjacent token pairs (empty for <2 tokens)."""
    return F.expr(
        f"IF(size({tok_col}) < 2, array(),"
        f" transform(sequence(1, size({tok_col}) - 1),"
        f" i -> struct(element_at({tok_col}, i) AS l, element_at({tok_col}, i + 1) AS r)))"
    )


def _apply_merge(tok_col, left: str, right: str):
    """Greedy left-to-right non-overlapping merge of (left, right) pairs —
    one array ``aggregate`` lambda, fully inside codegen."""
    merged = left + SEP + right

    def step(acc, x):
        hit = (F.size(acc) > 0) & (F.element_at(acc, -1) == F.lit(left)) & (x == F.lit(right))
        return F.when(
            hit, F.concat(F.slice(acc, F.lit(1), F.size(acc) - 1), F.array(F.lit(merged)))
        ).otherwise(F.concat(acc, F.array(x)))

    return F.aggregate(tok_col, F.array().cast("array<string>"), step)


def learn_bpe_merges(
    docs: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Learn up to ``k`` BPE merge rules; returns ``(round, left, right,
    freq)`` with round starting at 1, in learning order. Stops early when no
    adjacent pair occurs twice. Deterministic: the per-round argmax breaks
    count ties by (left, right) ascending."""
    spark = docs.sparkSession
    toks = docs.select(F.split(F.col(text_col), " ").alias("t")).localCheckpoint(eager=False)
    rules = []
    for rnd in range(1, k + 1):
        top = (
            toks.select(F.explode(_adjacent_pairs("t")).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.count(F.lit(1)).alias("freq"))
            .orderBy(F.col("freq").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["freq"] < 2:
            break
        left, right, freq = top[0]["l"], top[0]["r"], int(top[0]["freq"])
        rules.append((rnd, left, right, freq))
        toks = toks.select(_apply_merge("t", left, right).alias("t")).localCheckpoint()
    return spark.createDataFrame(rules, "round int, left string, right string, freq long")


def apply_bpe_merges(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize ``docs`` with an already-learned merge list (ordered):
    returns ``(doc_id, tokens array<string>, n_tokens)``. One chained
    projection per rule — a single codegen'd scan for moderate rule counts
    (checkpoint every 8 rules bounds expression nesting)."""
    out = docs.select(F.col(id_col).alias("doc_id"), F.split(F.col(text_col), " ").alias("t"))
    for i, (left, right) in enumerate(merges):
        out = out.select("doc_id", _apply_merge("t", left, right).alias("t"))
        if (i + 1) % 8 == 0:
            out = out.localCheckpoint()
    return out.select("doc_id", F.col("t").alias("tokens"), F.size("t").alias("n_tokens"))
