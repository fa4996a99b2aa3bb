"""Transcript -> edge derivation (the engine's ETL; FIXTURES.md §2).

The reference consumes a pre-built CSR image (graphgen.cpp emits it offline);
our source of truth is the transcripts table and the edge list is a derived
DataFrame:

- **Reply edges**: each turn points at its predecessor within the
  conversation (citation direction) — a ``lag`` window over
  ``(conv_id) ordered by turn_idx``. This is the one place window functions
  genuinely enter the design (SURVEY.md §2.3).
- **Tool-invocation edges**: each ``role='tool'`` turn points at the nearest
  preceding ``assistant`` turn in the same conversation with the same
  ``tool`` — ``last(..., ignorenulls)`` over ``(conv_id, tool)``.
- Dedup to a simple graph (no self-loops, no duplicate (src,dst)) matching
  the reference generator's property (graphgen.cpp:35-37).

All edges are intra-conversation, so connected components == conversations —
an exact golden used by tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .ids import vertex_ids


def derive_edges(transcripts: DataFrame, ids: DataFrame | None = None) -> DataFrame:
    """Derive the simple digraph ``edges(src long, dst long)``.

    ``ids`` is the ``(conv_id, turn_idx, vid)`` table from
    :func:`pagerank_spark.operators.ids.vertex_ids`; derived if omitted.
    The join with ids broadcasts when small; at scale both sides hash on
    (conv_id, turn_idx) — a single co-partitioned exchange.
    """
    if ids is None:
        ids = vertex_ids(transcripts)
    t = transcripts.join(ids, on=["conv_id", "turn_idx"], how="inner")

    w_reply = Window.partitionBy("conv_id").orderBy("turn_idx")
    reply = (
        t.withColumn("prev_vid", F.lag("vid").over(w_reply))
        .filter(F.col("prev_vid").isNotNull())
        .select(F.col("vid").alias("src"), F.col("prev_vid").alias("dst"))
    )

    w_tool = (
        Window.partitionBy("conv_id", "tool")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    tool = (
        t.filter(F.col("tool").isNotNull())
        .withColumn(
            "invoker_vid",
            F.last(F.when(F.col("role") == "assistant", F.col("vid")), ignorenulls=True).over(w_tool),
        )
        .filter((F.col("role") == "tool") & F.col("invoker_vid").isNotNull())
        .select(F.col("vid").alias("src"), F.col("invoker_vid").alias("dst"))
    )

    return (
        reply.unionByName(tool)
        .filter(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )


def transcripts_to_graph(transcripts: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Convenience: ``(ids, edges)`` for a transcripts DataFrame."""
    ids = vertex_ids(transcripts)
    return ids, derive_edges(transcripts, ids)
