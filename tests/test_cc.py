"""CC correctness vs hand oracles + union-find on random graphs.

Fixtures from FIXTURES.md §3; labels asserted exactly == min vid per
component (the reference fixpoint)."""

import random

import pytest

from pds_hw2_mpi_connected_components_spark.operators.cc import connected_components, cc_count
from tests.conftest import cc_oracle, make_edges

FIXTURES = {
    "path5": ([(0, 1), (1, 2), (2, 3), (3, 4)], 1),
    "two_cliques_bridge": (
        [(a, b) for a in range(4) for b in range(a + 1, 4)]
        + [(a, b) for a in range(4, 8) for b in range(a + 1, 8)]
        + [(3, 4)],
        1,
    ),
    "two_islands": ([(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5)], 2),
    "star_hub": ([(0, k) for k in range(1, 51)], 1),
    "self_loops_dups": ([(0, 0), (0, 1), (1, 0), (0, 1)], 1),
    "cycle6": ([(i, (i + 1) % 6) for i in range(6)], 1),
}


@pytest.mark.parametrize("name", sorted(FIXTURES))
def test_cc_fixture(spark, name):
    pairs, want_count = FIXTURES[name]
    labels, metrics = connected_components(make_edges(spark, pairs))
    got = {r["vid"]: r["label"] for r in labels.collect()}
    assert got == cc_oracle(pairs)
    assert cc_count(labels) == want_count
    assert metrics[-1]["changed"] is False


def test_cc_isolates(spark):
    # vertices {2,3,4} exist but have no edges -> 4 components
    edges = make_edges(spark, [(0, 1)])
    vertices = spark.createDataFrame([(i,) for i in range(5)], "vid long")
    labels, _ = connected_components(edges, vertices=vertices)
    got = {r["vid"]: r["label"] for r in labels.collect()}
    assert got == {0: 0, 1: 0, 2: 2, 3: 3, 4: 4}
    assert cc_count(labels) == 4


def test_cc_random_vs_union_find(spark):
    rng = random.Random(7)
    n = 300
    pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(350)]
    pairs = [(a, b) for a, b in pairs if a != b]
    labels, _ = connected_components(
        make_edges(spark, pairs),
        vertices=spark.createDataFrame([(i,) for i in range(n)], "vid long"),
    )
    got = {r["vid"]: r["label"] for r in labels.collect()}
    assert got == cc_oracle(pairs, vertices=range(n))
