"""RAKE: hand-computed scores on a tiny corpus."""

from pagerank_spark.operators.textops import rake_keywords


def test_hand_scores(spark):
    # stopwords {the, a, of, and, to, in, is, it}
    docs = spark.createDataFrame(
        [
            (0, "red car and blue car"),
            (1, "red car in the garage"),
        ],
        "doc_id long, text string",
    )
    got = {r.phrase: (r.n_occ, r.n_words, r.score_micro) for r in rake_keywords(docs, k=10).collect()}
    # phrases: "red car" x2, "blue car" x1, "garage" x1
    # freq: red 2, car 3, blue 1, garage 1
    # deg:  red 2*2=4, car 2*2+1*2=6, blue 2, garage 1
    s_red, s_car, s_blue, s_gar = (
        4 * 1_000_000 // 2,
        6 * 1_000_000 // 3,
        2 * 1_000_000 // 1,
        1 * 1_000_000 // 1,
    )
    assert got["red car"] == (2, 2, s_red + s_car)
    assert got["blue car"] == (1, 2, s_blue + s_car)
    assert got["garage"] == (1, 1, s_gar)
    assert len(got) == 3


def test_adjacent_stopwords_and_blank_docs(spark):
    docs = spark.createDataFrame(
        [(0, "a of the it"), (1, "  "), (2, "solo")], "doc_id long, text string"
    )
    rows = rake_keywords(docs, k=5).collect()
    assert [(r.phrase, r.score_micro) for r in rows] == [("solo", 1_000_000)]
