"""Z-order key (functions/layout.py) — bit-exactness and clustering effect."""

from pyspark.sql import functions as F

from pagerank_spark.functions.layout import zorder_key


def _py_spread(x, bits):
    out = 0
    for i in range(bits):
        out |= (x & (1 << i)) << i
    return out


def _py_z(a, b, bits=21):
    return _py_spread(a, bits) | (_py_spread(b, bits) << 1)


def test_zorder_matches_python_bit_interleave(spark):
    rows = [(a, b) for a in (0, 1, 2, 3, 5, 1000, 2**20) for b in (0, 1, 7, 999, 2**20)]
    df = spark.createDataFrame(rows, ["a", "b"])
    got = df.select("a", "b", zorder_key(F.col("a"), F.col("b")).alias("z")).collect()
    for r in got:
        assert r["z"] == _py_z(r["a"], r["b"]), (r["a"], r["b"])
    # canonical small cases: z(1,0)=1, z(0,1)=2, z(1,1)=3, z(2,2)=12
    assert _py_z(1, 0) == 1 and _py_z(0, 1) == 2 and _py_z(1, 1) == 3 and _py_z(2, 2) == 12


def test_zorder_clusters_both_dimensions(spark):
    # 32x32 grid; cut the z-sorted order into 16 chunks: each chunk's
    # bounding box in (a, b) must be far smaller than the full domain,
    # which a single-column sort cannot achieve for the second dimension
    rows = [(a, b) for a in range(32) for b in range(32)]
    df = spark.createDataFrame(rows, ["a", "b"])
    z = df.select("a", "b", zorder_key(F.col("a"), F.col("b"), bits=5).alias("z"))
    ordered = [ (r["a"], r["b"]) for r in z.orderBy("z").collect() ]
    chunk = len(ordered) // 16
    for c in range(16):
        part = ordered[c * chunk:(c + 1) * chunk]
        aspan = max(p[0] for p in part) - min(p[0] for p in part)
        bspan = max(p[1] for p in part) - min(p[1] for p in part)
        assert aspan <= 8 and bspan <= 8, (c, aspan, bspan)
