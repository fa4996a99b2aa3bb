"""SparkSession bootstrap tuned for link-graph analytics.

The reference engine hard-wires its physical execution (credit-based
prefetch, 64B line batching, FIFO pipelining — pagerank.v:250-341,788-849).
On Spark all of that is owned by Catalyst/Tungsten/AQE; the knobs that
survive are partitioning, AQE, and Arrow batch sizing, set here once.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "pagerank-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with graph-workload defaults.

    Defaults are sized for the sandbox (``local[$SPARK_GRAFT_CPUS]``) but every
    setting is the one you would ship to a 1000-executor cluster: AQE on
    (runtime shuffle coalescing + skew-join splitting), Arrow enabled for the
    pandas-UDF kernels, and shuffle parallelism matched to core count locally
    (on a real cluster: 2-3x total cores).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        # SPARK_GRAFT_MASTER opts any entry point (bench.py, jobs/, tests)
        # into another master without code edits — most usefully
        # local-cluster[K,c,m]: real separate executor JVMs, measured 39%
        # faster than the shared 32-thread heap at 4x8 on this box
        # (BENCH/SCALING_NOTES §14).
        master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        # local[N]: one shuffle partition per core keeps every superstep a
        # single wave; on a real cluster this is set to 2-3x total cores.
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Arrow batches are our analogue of the reference's 64B line batching
        # (pagerank.v:788-791): bigger batches amortize the JVM<->Python hop.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    if master.startswith("local-cluster["):
        # local-cluster[K,c,m]: executor memory must fit the per-worker MB
        # budget (leave the Python workers headroom), and executors are
        # fresh JVMs that need the repo on their Python path. Both settings
        # are inert under plain local[N].
        worker_mb = int(master.rstrip("]").split(",")[-1])
        builder = builder.config(
            "spark.executor.memory", f"{max(1024, worker_mb - 1024)}m"
        ).config(
            "spark.executorEnv.PYTHONPATH",
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    # experiment hook: ';'-separated k=v pairs, e.g.
    # SPARK_GRAFT_EXTRA_CONF='spark.io.compression.codec=zstd' — lets the
    # scaling harness A/B runtime confs without code edits
    env_conf = os.environ.get("SPARK_GRAFT_EXTRA_CONF", "")
    for pair in filter(None, (p.strip() for p in env_conf.split(";"))):
        k, _, v = pair.partition("=")
        builder = builder.config(k, v)
    return builder.getOrCreate()
