"""Table profiler: exact per-column stats, nulls counted, one-pass plan."""

from pyspark.sql import functions as F

from pagerank_spark.operators.profile import profile_table


def test_profile_exact_stats(spark):
    rows = [
        (1, "a", 10.0, None),
        (2, "a", None, 5),
        (3, None, 3.5, 5),
        (None, "b", 3.5, 7),
    ]
    df = spark.createDataFrame(rows, "k long, s string, x double, m int")
    out = {r.column: r for r in profile_table(df).collect()}
    assert set(out) == {"k", "s", "x", "m"}
    assert all(r.n_rows == 4 for r in out.values())
    k = out["k"]
    assert (k.dtype, k.n_null, k.n_distinct, k.min_long, k.max_long) == ("bigint", 1, 3, 1, 3)
    s = out["s"]
    assert (s.dtype, s.n_null, s.n_distinct, s.min_long, s.max_long) == ("string", 1, 2, None, None)
    x = out["x"]
    assert (x.dtype, x.n_null, x.n_distinct) == ("double", 1, 2)
    m = out["m"]
    assert (m.dtype, m.n_null, m.n_distinct, m.min_long, m.max_long) == ("int", 1, 2, 5, 7)


def test_profile_approx_mode_runs(spark):
    df = spark.range(1000).withColumn("s", F.concat_ws("-", "id"))
    out = {r.column: r for r in profile_table(df, exact=False).collect()}
    assert out["id"].n_rows == 1000
    # HLL estimate is near-exact at this cardinality but not asserted equal
    assert 900 <= out["id"].n_distinct <= 1100


def test_profile_single_scan_plan(spark):
    # the whole profile is ONE aggregation tree over ONE scan: no joins,
    # no shuffles beyond the distinct Expand branches' own exchanges
    df = spark.range(100).withColumn("s", F.concat_ws("-", "id"))
    plan = profile_table(df)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
