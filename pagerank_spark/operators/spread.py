"""Small-input spread guard for compute-heavy corpus scans.

Several operators do their dominant arithmetic BEFORE the first shuffle
(minhash signatures: 64 hashes per shingle; BPE merge rounds: per-round
token-array rewrites; simhash: 64 bit-columns per token). Spark sizes the
scan stage by input bytes, so a corpus that arrives as one small parquet
file becomes ONE task and the whole projection runs on a single core —
measured 8x slower at bench scale on the minhash path, and the single hot
core is what external contention amplifies.

``spread_small_input`` repartitions only when the input has fewer
partitions than the session's ``defaultParallelism``. At corpus scale the
parquet scan already yields >= cores splits, so the guard is a no-op and
no shuffle is ever added to the 100-TB path; the round trip it adds on a
tiny input is measured strictly cheaper than the serial projection it
prevents.

Note: ``df.rdd`` finalizes the physical plan; on an un-materialized
aggregate subtree under AQE that can execute upstream stages eagerly. The
guard is therefore applied at operator entry points whose input is a base
table / scan in every repo code path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread_small_input(df: DataFrame) -> DataFrame:
    """Repartition ``df`` to ``defaultParallelism`` iff it has fewer
    partitions than that — see module docstring."""
    para = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < para:
        return df.repartition(para)
    return df
