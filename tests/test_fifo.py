"""FIFO allocation: sequential-walk replay."""

from pagerank_spark.operators.inventory import fifo_allocate


def _run(spark, lots, demands):
    l = spark.createDataFrame(lots, "key long, lot_id long, qty long")
    d = spark.createDataFrame(demands, "key long, demand long")
    return {(r.key, r.lot_id): (r.consumed, r.remaining) for r in fifo_allocate(l, d).collect()}


def test_matches_sequential_walk(spark):
    lots = [(1, 10, 5), (1, 20, 3), (1, 30, 7), (2, 10, 4)]
    demands = [(1, 9), (2, 100)]
    got = _run(spark, lots, demands)
    # key 1: walk 9 -> 5 from lot 10, 3 from lot 20, 1 from lot 30
    assert got[(1, 10)] == (5, 0)
    assert got[(1, 20)] == (3, 0)
    assert got[(1, 30)] == (1, 6)
    # key 2: demand exceeds supply -> everything consumed
    assert got[(2, 10)] == (4, 0)


def test_zero_and_missing_demand(spark):
    lots = [(1, 1, 5), (3, 1, 2)]
    got = _run(spark, lots, [(1, 0)])  # key 3 has no demand row
    assert got[(1, 1)] == (0, 5)
    assert got[(3, 1)] == (0, 2)
