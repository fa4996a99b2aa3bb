"""Onion decomposition: planted shells peel in the expected order."""

from pyspark.sql import functions as F

from pagerank_spark.algos.kcore import onion_layers


def test_planted_shells(spark):
    r5 = spark.range(5)
    clique = r5.alias("a").join(r5.alias("b"), F.col("a.id") < F.col("b.id")).select(
        F.col("a.id").alias("src"), F.col("b.id").alias("dst")
    )
    cycle = spark.range(8).selectExpr("100 + id AS src", "100 + (id + 1) % 8 AS dst")
    pend = spark.range(8).selectExpr("1000 + id AS src", "100 + id AS dst")
    star = spark.range(1, 5).selectExpr("CAST(500 AS BIGINT) AS src", "500 + id AS dst")
    got = {
        r.id: (r.layer, r.k_peel)
        for r in onion_layers(clique.unionByName(cycle).unionByName(pend).unionByName(star)).collect()
    }
    for i in range(8):
        assert got[1000 + i] == (1, 1)       # pendants
    for i in range(1, 5):
        assert got[500 + i] == (1, 1)        # star leaves
    assert got[500] == (2, 0)                # isolated ex-center peels at min 0
    for i in range(8):
        assert got[100 + i] == (3, 2)        # bare cycle
    for i in range(5):
        assert got[i] == (4, 4)              # 5-clique, coreness 4
    assert len(got) == 8 + 4 + 1 + 8 + 5


def test_single_clique_one_layer(spark):
    r4 = spark.range(4)
    clique = r4.alias("a").join(r4.alias("b"), F.col("a.id") < F.col("b.id")).select(
        F.col("a.id").alias("src"), F.col("b.id").alias("dst")
    )
    got = onion_layers(clique).collect()
    assert {(r.layer, r.k_peel) for r in got} == {(1, 3)} and len(got) == 4
