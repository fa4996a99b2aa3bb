"""Triad census (operators/graphstats.py::triad_census)."""

import itertools
from collections import Counter

from pagerank_spark.operators.graphstats import (
    TRIAD_CODE_NAMES,
    TRIAD_TYPES,
    _triad_class,
    triad_census,
)
from pagerank_spark.sources.graphs import TRIAD_SYNTH_N, er_graph, triad_synth_graph


def test_classifier_orbit_sizes():
    # labeled-code multiplicities per class on 3 labeled vertices
    c = Counter(TRIAD_CODE_NAMES.values())
    assert dict(c) == {
        "003": 1, "012": 6, "102": 3, "021D": 3, "021U": 3, "021C": 6,
        "111D": 6, "111U": 6, "030T": 6, "030C": 2, "201": 3,
        "120D": 3, "120U": 3, "120C": 6, "210": 6, "300": 1,
    }


def test_classifier_igraph_convention_examples():
    # codes: c12 (0-1), c13 (0-2), c23 (1-2); 1 = low->high, 2 = high->low
    assert _triad_class(1, 0, 1) == "021C"  # 0->1, 1->2: path
    assert _triad_class(2, 2, 0) == "021U"  # 1->0, 2->0: in-star at 0
    assert _triad_class(1, 1, 0) == "021D"  # 0->1, 0->2: out-star from 0
    assert _triad_class(3, 2, 0) == "111D"  # 0<->1, 2->0: asym source outside mutual
    assert _triad_class(3, 1, 0) == "111U"  # 0<->1, 0->2: asym source inside mutual
    assert _triad_class(1, 2, 1) == "030C"  # 0->1->2->0 cycle
    assert _triad_class(1, 1, 1) == "030T"  # 0->1, 0->2, 1->2 transitive
    assert _triad_class(3, 3, 3) == "300"


def test_census_matches_brute_force_on_er(spark):
    g = er_graph(spark, 60, 260, seed=23)
    el = [(r.src, r.dst) for r in g.collect()]
    arcs = set(el)
    verts = sorted({v for e in el for v in e})

    def code(a, b):
        return (1 if (a, b) in arcs else 0) | (2 if (b, a) in arcs else 0)

    expected = Counter(
        _triad_class(code(a, b), code(a, c), code(b, c))
        for a, b, c in itertools.combinations(verts, 3)
    )
    got = {r.triad: r.cnt for r in triad_census(g).collect()}
    assert set(got) == set(TRIAD_TYPES)
    assert got == {t: expected.get(t, 0) for t in TRIAD_TYPES}


def test_synth_graph_covers_all_classes(spark):
    got = {r.triad: r.cnt for r in triad_census(triad_synth_graph(spark)).collect()}
    assert all(got[t] > 0 for t in TRIAD_TYPES), got
    n = TRIAD_SYNTH_N
    assert sum(got.values()) == n * (n - 1) * (n - 2) // 6
