"""Iceberg catalog wiring — the production persistence layer.

The north rule targets Iceberg tables for transcripts, derived graphs, and
superstep checkpoints. This sandbox ships no Iceberg runtime jars (and no
network to fetch them), so everything in the engine runs against the
Parquet-backed Checkpointer (plans/checkpoint.py) which reproduces the
write-audit-publish commit discipline. This module is the cluster-side
wiring: session configs for a Hadoop or REST catalog, and commit helpers
that map 1:1 onto the Checkpointer API. It is import-safe without Iceberg
and raises a clear error only when actually used without the runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ICEBERG_SESSION_CONF = {
    # spark-submit --packages org.apache.iceberg:iceberg-spark-runtime-3.5_2.12:<ver>
    "spark.sql.extensions": "org.apache.iceberg.spark.extensions.IcebergSparkSessionExtensions",
    "spark.sql.catalog.graph": "org.apache.iceberg.spark.SparkCatalog",
    "spark.sql.catalog.graph.type": "hadoop",
    # production: set spark.sql.catalog.graph.warehouse=s3://... or a REST catalog
}


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def commit_superstep(spark: SparkSession, table: str, k: int, state: DataFrame) -> None:
    """Atomic superstep commit as an Iceberg snapshot.

    Equivalent of ``Checkpointer.commit`` — ``overwritePartitions`` on the
    ranks table gives the write-audit-publish semantics (a crash before the
    snapshot commit leaves the previous snapshot current), and the snapshot
    log is the superstep history (time travel = resume point selection).
    """
    if not iceberg_available(spark):
        raise RuntimeError(
            "Iceberg runtime not on the classpath; use plans.checkpoint.Checkpointer "
            "(same commit discipline over Parquet) or launch with the iceberg-spark-runtime package"
        )
    state.withColumn("superstep", F.lit(k)).writeTo(table).overwritePartitions()


def resume_superstep(spark: SparkSession, table: str) -> tuple[int, DataFrame] | None:
    """Latest committed superstep from the table's current snapshot."""
    if not iceberg_available(spark):
        raise RuntimeError("Iceberg runtime not on the classpath")
    df = spark.read.table(table)
    row = df.agg({"superstep": "max"}).first()
    if row is None or row[0] is None:
        return None
    k = int(row[0])
    return k, df.filter(df.superstep == k).drop("superstep")
