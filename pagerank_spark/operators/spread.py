"""Small-input spread guard for compute-heavy corpus scans.

Several operators do their dominant arithmetic BEFORE the first shuffle
(minhash signatures: 64 hashes per shingle; BPE merge rounds: per-round
token-array rewrites; simhash: 64 bit-columns per token). Spark sizes the
scan stage by input bytes, so a corpus that arrives as one small parquet
file becomes ONE task and the whole projection runs on a single core —
measured 8x slower at bench scale on the minhash path, and the single hot
core is what external contention amplifies.

``spread_small_input`` handles the two input shapes differently:

* **Scan-shaped frames** (leaves + projections/filters/generates — no
  shuffle-introducing operator): probing ``df.rdd.getNumPartitions()`` is
  just file listing, so check the count and repartition only when the
  input has fewer partitions than ``defaultParallelism``. At corpus scale
  the parquet scan already yields >= cores splits — the guard is a no-op
  and no shuffle is ever added to the 100-TB path.
* **Derived frames** (aggregates/joins/windows upstream): the runtime
  partition count is AQE's BYTE-based coalescing choice, which is blind to
  downstream compute cost (a tiny agg output coalesces to one partition
  and the heavy projection runs serial), and probing ``.rdd`` would
  finalize the adaptive plan by EXECUTING the upstream stages eagerly
  (measured: one extra job at plan-build time). So: no probe — pin the
  parallelism with one explicit lazy ``repartition``. The data already
  crossed a shuffle to become derived; one more round trip of the same
  (post-aggregation, usually reduced) data is bounded and buys guaranteed
  parallelism for the compute stage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# logical operators whose presence means the frame's runtime partitioning
# comes from a shuffle (AQE-coalesced) rather than from the scan
_SHUFFLE_OPS = (
    "Aggregate",
    "Join",
    "Window",
    "Sort",
    "Deduplicate",
    "Distinct",
    "Repartition",
    "RepartitionByExpression",
    "GlobalLimit",
    "Intersect",
    "Except",
    "CoGroup",
    "FlatMapGroups",
)


def _is_scan_shaped(df: DataFrame) -> bool:
    plan = df._jdf.queryExecution().analyzed().toString()
    return not any(op in plan for op in _SHUFFLE_OPS)


def spread_small_input(df: DataFrame) -> DataFrame:
    """Ensure ``df`` enters a compute-heavy projection with at least
    ``defaultParallelism`` partitions — see module docstring."""
    para = df.sparkSession.sparkContext.defaultParallelism
    if _is_scan_shaped(df):
        if df.rdd.getNumPartitions() < para:
            return df.repartition(para)
        return df
    return df.repartition(para)
