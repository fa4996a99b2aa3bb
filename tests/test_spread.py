"""Small-input spread guard (operators/spread.py)."""


def test_spread_small_input_repartitions_one_file(spark):
    from pagerank_spark.operators.spread import spread_small_input

    para = spark.sparkContext.defaultParallelism
    one = spark.range(1000).coalesce(1)
    assert one.rdd.getNumPartitions() == 1
    out = spread_small_input(one)
    assert out.rdd.getNumPartitions() == para
    assert out.count() == 1000


def test_spread_small_input_noop_at_scale(spark):
    # scan-shaped input already at >= defaultParallelism partitions:
    # returned as-is, no shuffle added (the 100-TB-path contract)
    from pagerank_spark.operators.spread import spread_small_input

    para = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 1000, 1, para + 4)
    out = spread_small_input(wide)
    assert out is wide


def test_spread_derived_frame_no_eager_probe(spark):
    # Derived (aggregate) input: the guard must NOT probe .rdd (which
    # finalizes the AQE plan by running upstream stages) — it repartitions
    # lazily instead. Assert zero jobs run while building the plan.
    from pyspark.sql import functions as F

    from pagerank_spark.operators.spread import spread_small_input

    sc = spark.sparkContext
    st = sc.statusTracker()
    sc.setJobGroup("spread-derived-probe", "plan build must run no jobs")
    try:
        agg = spark.range(100_000).groupBy((F.col("id") % 50).alias("k")).count()
        out = spread_small_input(agg)
        probe_jobs = st.getJobIdsForGroup("spread-derived-probe") or []
        assert not probe_jobs, "spread probed a derived frame eagerly"
    finally:
        sc.setLocalProperty("spark.jobGroup.id", None)
    assert out.count() == 50
    assert out.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
