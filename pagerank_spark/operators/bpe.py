"""Distributed BPE merge-rule learning over a documents table.

Byte-pair-encoding tokenizer training is the canonical sequential-looking
algorithm that distributes cleanly: each round is (1) one exploded
adjacent-pair count — a map-side-combined groupBy over the corpus — and
(2) one argmax row to the driver (count desc, pair asc: deterministic), and
(3) one pure-JVM ``aggregate`` lambda projection applying the merge greedily
left-to-right to every token array. k merge rules cost k shuffles over the
corpus; no per-row Python anywhere, and the driver traffic is k single-row
collects regardless of corpus size.

Two granularities share the merge/apply machinery:

- word-level (:func:`learn_bpe_merges` / :func:`apply_bpe_merges`): tokens
  are whitespace words, merges join adjacent words. Merged tokens are
  joined with ``\\x1f`` (unit separator) so merge boundaries can never be
  confused with the original text.
- byte/char-level (:func:`learn_bpe_merges_byte` /
  :func:`apply_bpe_merges_byte`): the real-tokenizer form — the alphabet is
  the characters WITHIN whitespace words plus an end-of-word marker, merges
  never cross word boundaries, and merged symbols concatenate (the
  canonical Sennrich recurrence). Crucially the rounds run over the
  DISTINCT-WORD vocabulary weighted by word counts (Heaps' law: vocab <<
  corpus), so the corpus is scanned ONCE to build the vocab and each of the
  k rounds shuffles only the vocabulary table.

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


def _apply_merge(tok_col, left: str, right: str, sep: str = SEP):
    """Greedy left-to-right non-overlapping merge of (left, right) pairs —
    one array ``aggregate`` lambda, fully inside codegen."""
    merged = left + sep + right

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
    from .spread import spread_small_input

    spark = docs.sparkSession
    # one-file corpora would run every per-round merge rewrite single-core
    # behind the checkpoint barrier (operators/spread.py; no-op at scale)
    toks = spread_small_input(docs).select(
        F.split(F.col(text_col), " ").alias("t")
    ).localCheckpoint(eager=False)
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

# -- byte/char-level BPE ----------------------------------------------------

EOW = "</w>"


def _word_symbols(w_col):
    """Char-split a word and append the end-of-word marker as its own
    symbol: 'ab' -> [a, b, </w>]. The empty-string guard strips the empty
    elements Spark's split-by-empty-pattern can emit."""
    chars = F.filter(F.split(w_col, ""), lambda c: c != F.lit(""))
    return F.concat(chars, F.array(F.lit(EOW)))


def _word_vocab(docs: DataFrame, text_col: str) -> DataFrame:
    """``(w, cnt)`` distinct whitespace words with corpus counts — the one
    corpus-wide shuffle of the byte-level trainer."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def learn_bpe_merges_byte(
    docs: DataFrame,
    k: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Learn up to ``k`` byte/char-level BPE merge rules; returns
    ``(round, left, right, freq)`` in learning order, freq = total corpus
    occurrences of the merged pair. Stops when no pair occurs twice.
    Deterministic: count ties break by (left, right) ascending.

    Scale shape: one corpus scan builds the weighted word vocabulary; each
    round is a map-side-combined pair count over the VOCAB (weighted by
    ``cnt``), one single-row argmax collect, and one codegen'd merge
    projection — per-round cost scales with distinct words, not corpus
    rows. Eager localCheckpoint per round truncates the nested-lambda plan.
    """
    spark = docs.sparkSession
    vocab = (
        _word_vocab(docs, text_col)
        .select("cnt", _word_symbols(F.col("w")).alias("t"))
        .localCheckpoint()
    )
    rules = []
    for rnd in range(1, k + 1):
        top = (
            vocab.select("cnt", F.explode(_adjacent_pairs("t")).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("cnt").alias("freq"))
            .orderBy(F.col("freq").desc(), F.col("l").asc(), F.col("r").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["freq"] < 2:
            break
        left, right, freq = top[0]["l"], top[0]["r"], int(top[0]["freq"])
        rules.append((rnd, left, right, freq))
        vocab = vocab.select("cnt", _apply_merge("t", left, right, sep="").alias("t")).localCheckpoint()
    return spark.createDataFrame(rules, "round int, left string, right string, freq long")


def apply_bpe_merges_byte(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize ``docs`` with an ordered byte-level merge list: returns
    ``(doc_id, tokens array<string>, n_tokens)``, tokens in document order.

    The merge chain runs over the input's DISTINCT words only (one
    projection per rule, checkpoint every 8 bounds expression nesting);
    per-occurrence work is a single hash join from the exploded
    (doc_id, pos, w) rows back onto the tokenized vocabulary, then an
    order-preserving regroup (array_sort over (pos, tokens) structs —
    no window, no per-row Python)."""
    w = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.posexplode(F.split(F.col(text_col), r"\s+")).alias("pos", "w"),
        )
        .filter(F.col("w") != "")
    )
    vocab = w.select("w").distinct().select("w", _word_symbols(F.col("w")).alias("t"))
    for i, (left, right) in enumerate(merges):
        vocab = vocab.select("w", _apply_merge("t", left, right, sep="").alias("t"))
        if (i + 1) % 8 == 0:
            vocab = vocab.localCheckpoint()
    return (
        w.join(vocab, "w")
        .groupBy("doc_id")
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "t"))), lambda s: s["t"]
                )
            ).alias("tokens")
        )
        .select("doc_id", "tokens", F.size("tokens").alias("n_tokens"))
    )
