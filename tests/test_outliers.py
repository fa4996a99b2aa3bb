"""Hampel median/MAD outliers: planted spikes flagged, inliers kept,
degenerate (MAD=0) groups flag every deviation."""

from pagerank_spark.operators.outliers import mad_outliers


def test_planted_spikes_flagged(spark):
    # group a: tight cluster 100..108 plus two spikes
    rows = [(i, "a", 100 + (i % 9)) for i in range(40)]
    rows += [(100, "a", 1000), (101, "a", -500)]
    # group b: all-identical values + one deviation -> MAD 0, deviation flagged
    rows += [(i, "b", 7) for i in range(200, 220)]
    rows += [(999, "b", 8)]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    out = {r.id: (r.g, r.v, r.med2, r.mad4) for r in mad_outliers(df, "g", "v", "id", k=3).collect()}
    assert set(out) == {100, 101, 999}
    # group a median = 103.5 -> med2 = 207; spikes are way outside
    assert out[100][2] == 207 and out[101][2] == 207
    # group b: med2 = 14, mad4 = 0
    assert out[999] == ("b", 8, 14, 0)


def test_no_false_positives_uniform(spark):
    df = spark.createDataFrame([(i, "g", i % 10) for i in range(1000)], "id long, g string, v long")
    # values 0..9, median 4.5 (med2=9), dev2 in {1..9}, mad4 = 2*5 = 10
    # k=3: 2*dev2 > 30 never holds -> empty
    assert mad_outliers(df, "g", "v", "id", k=3).count() == 0
