"""Frontier-broadcast CC: exact label equality with the star-contraction
mode and the union-find oracle, in both execution regimes (all-broadcast
and all-distributed rounds)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from pds_hw2_mpi_connected_components_spark.operators.cc import (
    cc_count,
    connected_components,
)
from pds_hw2_mpi_connected_components_spark.operators.frontier import (
    connected_components_frontier,
)
from tests.conftest import cc_oracle, make_edges
from tests.test_cc import FIXTURES


def _labels(df):
    return {r["vid"]: r["label"] for r in df.collect()}


@pytest.mark.parametrize("name", sorted(FIXTURES))
@pytest.mark.parametrize("threshold", [0, 10**9], ids=["join-rounds", "broadcast-rounds"])
def test_frontier_fixtures(spark, name, threshold):
    pairs, want_count = FIXTURES[name]
    labels, metrics = connected_components_frontier(
        make_edges(spark, pairs), broadcast_threshold=threshold
    )
    assert _labels(labels) == cc_oracle(pairs)
    assert cc_count(labels) == want_count
    modes = {m["mode"] for m in metrics}
    if threshold == 0:
        assert modes == {"join"}
    else:
        # round 0 is always distributed; later rounds broadcast the frontier
        assert metrics[0]["mode"] == "join"
        if len(metrics) > 1:
            assert {m["mode"] for m in metrics[1:]} == {"broadcast"}
    assert metrics[-1]["changed"] == 0


def test_frontier_matches_star_contraction_random(spark):
    rng = random.Random(23)
    n = 400
    pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(460)]
    pairs = [(a, b) for a, b in pairs if a != b]
    edges = make_edges(spark, pairs)
    verts = spark.createDataFrame([(i,) for i in range(n)], "vid long")
    star, _ = connected_components(edges, vertices=verts)
    frontier, m = connected_components_frontier(edges, vertices=verts)
    assert _labels(star) == _labels(frontier) == cc_oracle(pairs, vertices=range(n))
    # the frontier must actually shrink on a random (short-diameter-ish) graph
    changed = [x["changed"] for x in m]
    assert changed[-1] == 0 and max(changed) == changed[0]


def test_frontier_isolates(spark):
    edges = make_edges(spark, [(0, 1)])
    verts = spark.createDataFrame([(i,) for i in range(5)], "vid long")
    labels, _ = connected_components_frontier(edges, vertices=verts)
    assert _labels(labels) == {0: 0, 1: 0, 2: 2, 3: 3, 4: 4}


def test_frontier_path_graph_high_diameter(spark):
    """Worst case for min propagation: a path needs O(diameter) rounds but
    must still converge exactly; the frontier shrinks to the single moving
    wavefront."""
    n = 40
    pairs = [(i, i + 1) for i in range(n - 1)]
    labels, metrics = connected_components_frontier(
        make_edges(spark, pairs), broadcast_threshold=10**9
    )
    assert set(_labels(labels).values()) == {0}
    assert metrics[-1]["changed"] == 0
    assert len(metrics) <= n


def test_frontier_resume_mid_iteration(spark, tmp_path):
    from pds_hw2_mpi_connected_components_spark.plans.checkpoint import CheckpointStore

    pairs = [(i, (i + 1) % 48) for i in range(48)]  # ring: many rounds
    edges = make_edges(spark, pairs)
    full, _ = connected_components_frontier(edges)
    want = _labels(full)

    store = CheckpointStore(spark, str(tmp_path / "fk"))
    with pytest.raises(RuntimeError):
        connected_components_frontier(edges, max_rounds=3, checkpoint=store)
    assert store.latest("frontier_labels") is not None

    labels, metrics = connected_components_frontier(edges, checkpoint=store)
    assert _labels(labels) == want
    assert metrics[0]["round"] >= 3  # resumed, not restarted
    assert store.metrics("frontier_cc")
