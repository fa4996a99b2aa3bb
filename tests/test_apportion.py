"""D'Hondt: textbook example + seat-budget invariants."""

from pagerank_spark.operators.apportion import dhondt_seats


def _votes(spark, rows):
    return spark.createDataFrame(rows, "district long, party string, votes long")


def test_wikipedia_example(spark):
    # classic: A=100k, B=80k, C=30k, D=20k, 8 seats -> 4/3/1/0
    v = _votes(spark, [(1, "A", 100000), (1, "B", 80000), (1, "C", 30000), (1, "D", 20000)])
    got = {r.party: r.seats for r in dhondt_seats(v, 8).collect()}
    assert got == {"A": 4, "B": 3, "C": 1, "D": 0}


def test_budget_and_zero_votes(spark):
    v = _votes(
        spark,
        [(1, "A", 7), (1, "B", 0), (2, "A", 1), (2, "B", 1), (2, "C", 1)],
    )
    rows = dhondt_seats(v, 3).collect()
    by_d = {}
    for r in rows:
        by_d.setdefault(r.district, {})[r.party] = r.seats
    assert sum(by_d[1].values()) == 3 and by_d[1]["B"] == 0
    assert sum(by_d[2].values()) == 3
    # exact three-way tie: every quotient 1/1 equal -> party-asc tiebreak,
    # then divisor ladder restarts at A
    assert by_d[2] == {"A": 1, "B": 1, "C": 1}
