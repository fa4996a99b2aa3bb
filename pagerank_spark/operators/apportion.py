"""Proportional apportionment: D'Hondt highest-averages allocation.

Allocating an integer budget across groups proportionally to integer
weights — seats to parties, replicas to shards, crawl quota to hosts — via
the highest-averages method: each group generates quotients weight/1,
weight/2, ..., weight/S and the S largest quotients per district win a
seat. Expressed relationally as one divisor explode + one keyed window —
no sequential seat loop, so a million districts allocate in two shuffles.

Determinism: quotients are single correctly-rounded divisions of exact
BIGINTs (identical doubles in any engine); equal quotients break by
(weight desc, group asc, divisor asc) — the standard largest-party rule,
made total.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def dhondt_seats(
    votes: DataFrame,
    n_seats: int,
    district_col: str = "district",
    party_col: str = "party",
    votes_col: str = "votes",
) -> DataFrame:
    """Return ``(district, party, votes, seats)`` — D'Hondt allocation of
    ``n_seats`` per district. Groups with zero/negative weight get no
    quotients (and no seats). Every input (district, party) row is
    preserved in the output, zero-seat parties included."""
    base = votes.select(
        F.col(district_col).alias("district"),
        F.col(party_col).alias("party"),
        F.col(votes_col).cast("long").alias("votes"),
    )
    q = base.where(F.col("votes") > 0).select(
        "district",
        "party",
        "votes",
        F.explode(F.sequence(F.lit(1), F.lit(int(n_seats)))).alias("div"),
    )
    q = q.withColumn("quot", F.col("votes").cast("double") / F.col("div").cast("double"))
    w = Window.partitionBy("district").orderBy(
        F.col("quot").desc(), F.col("votes").desc(), F.col("party").asc(), F.col("div").asc()
    )
    won = (
        q.withColumn("__rk", F.row_number().over(w))
        .where(F.col("__rk") <= int(n_seats))
        .groupBy("district", "party")
        .agg(F.count(F.lit(1)).alias("seats"))
    )
    return (
        base.join(won, ["district", "party"], "left")
        .select(
            "district",
            "party",
            "votes",
            F.coalesce("seats", F.lit(0)).cast("long").alias("seats"),
        )
    )
