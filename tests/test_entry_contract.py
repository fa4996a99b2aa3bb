"""Driver-contract smoke tests: entry() runs at sf0.001; every query key has
matching callable/oracle structure and every callable returns a DataFrame at
sf0.001 with >= 1 row (the fuller sf0.01 value comparison runs in
tools/check_oracles.py and the driver's own gate)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(not os.path.isdir(SF), reason="testdata not present")


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"id", "rank"}


def test_oracle_keys_subset_of_queries(spark):
    qs = entrymod.queries()
    os_ = entrymod.oracle_sql()
    assert set(os_).issubset(set(qs))
    assert len(qs) >= 16


# queries whose correct answer at the tiny sf0.001 tier is legitimately empty
# (k_core: k=90 is chosen to discriminate at the sf0.01 gate tier — 527/2000
# survive there — and the sf0.001 copurchase graph's 4-peel 90-core is empty;
# tpch_q7: no NATION_1<->NATION_2 cross-trade lines exist in the 0.001 slice
# (91 rows at the sf0.01 gate tier); tpch_q11: no part reaches 4x the mean
# stock value in the 0.001 slice (4 at sf0.01, 21 at sf0.1 — the data-derived
# threshold discriminates by design;
# radius_join_customers: the 150 multiplicative-hash lattice points in the
# 0.001 slice deterministically have no pair within distance 15 in the
# 1000x1000 grid — 2655 pairs at the sf0.01 gate tier)
EMPTY_OK_AT_SF0001 = {
    "k_core_copurchase",
    "tpch_q7",
    "tpch_q11",
    "radius_join_customers",
}


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_each_query_runs(spark, name):
    fn = entrymod.queries()[name]
    df = fn(spark, SF)
    n = df.count()
    assert n >= 1 or name in EMPTY_OK_AT_SF0001, name
