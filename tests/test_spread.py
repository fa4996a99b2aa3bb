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
    # input already at >= defaultParallelism partitions: returned as-is,
    # no shuffle added (the 100-TB-path contract)
    from pagerank_spark.operators.spread import spread_small_input

    para = spark.sparkContext.defaultParallelism
    wide = spark.range(1000).repartition(para + 4)
    out = spread_small_input(wide)
    assert out is wide
