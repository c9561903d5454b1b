"""Bowtie decomposition vs a pure-Python reachability oracle.

The oracle recomputes the Broder taxonomy from first principles: Tarjan
SCCs -> largest component (ties: min label) -> forward/backward/weak BFS
sets -> region assignment with the same precedence as the operator.
"""

from __future__ import annotations

import random
from collections import deque

import pytest

from pds_hw2_mpi_connected_components_spark.operators.bowtie import bowtie

from tests.conftest import make_edges
from tests.test_scc import tarjan_scc


def _bfs(adj, seeds):
    seen = set(seeds)
    q = deque(seen)
    while q:
        v = q.popleft()
        for w in adj.get(v, ()):
            if w not in seen:
                seen.add(w)
                q.append(w)
    return seen


def python_bowtie(pairs, vertices=()):
    vs = set(vertices)
    fwd_adj: dict = {}
    bwd_adj: dict = {}
    und_adj: dict = {}
    for a, b in pairs:
        vs.add(a)
        vs.add(b)
        if a == b:
            continue
        fwd_adj.setdefault(a, []).append(b)
        bwd_adj.setdefault(b, []).append(a)
        und_adj.setdefault(a, []).append(b)
        und_adj.setdefault(b, []).append(a)
    if not vs:
        return {}, None
    scc = tarjan_scc(pairs, vertices=vs)
    sizes: dict = {}
    for v, s in scc.items():
        sizes[s] = sizes.get(s, 0) + 1
    core_label = min(
        (s for s in sizes), key=lambda s: (-sizes[s], s)
    )
    core = {v for v, s in scc.items() if s == core_label}
    fwd = _bfs(fwd_adj, core)
    bwd = _bfs(bwd_adj, core)
    weak = _bfs(und_adj, core)
    in_set = bwd - core
    out_set = fwd - core
    from_in = _bfs(fwd_adj, in_set) if in_set else set()
    to_out = _bfs(bwd_adj, out_set) if out_set else set()
    out = {}
    for v in vs:
        if v in core:
            out[v] = "CORE"
        elif v in in_set:
            out[v] = "IN"
        elif v in out_set:
            out[v] = "OUT"
        elif v not in weak:
            out[v] = "DISC"
        elif v in from_in and v in to_out:
            out[v] = "TUBE"
        else:
            out[v] = "TENDRIL"
    return out, core_label


GRAPHS = {
    # the canonical bowtie: IN-chain -> 3-cycle core -> OUT-chain, one
    # tube bypassing the core, one tendril off IN, one disconnected pair
    "canonical": [
        (0, 1), (1, 2), (2, 0),            # core {0,1,2}
        (10, 0), (11, 10),                 # IN: 10, 11
        (2, 20), (20, 21),                 # OUT: 20, 21
        (10, 30), (30, 20),                # TUBE: 30 (IN -> OUT bypass)
        (11, 40),                          # TENDRIL: 40 (hangs off IN)
        (50, 51),                          # DISC: 50, 51
    ],
    # no arcs into/out of the core
    "core_only": [(0, 1), (1, 0), (5, 6)],
    # pure DAG: core = single vertex (smallest vid among size-1 SCCs)
    "dag": [(0, 1), (1, 2), (0, 2)],
    # two equal-size SCCs: tie broken by min label -> {0,1} is the core
    "tie": [(0, 1), (1, 0), (2, 3), (3, 2), (1, 2)],
    # tendril chain off OUT-side (feeds OUT): 31 -> 30 -> out(20)
    "out_feeder": [(0, 1), (1, 0), (1, 20), (30, 20), (31, 30)],
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_bowtie_vs_python(spark, name):
    pairs = GRAPHS[name]
    out, metrics = bowtie(make_edges(spark, pairs))
    want, core_label = python_bowtie(pairs)
    got = {r["vid"]: r["region"] for r in out.collect()}
    assert got == want, name
    cores = {r["core"] for r in out.collect()}
    assert cores == {core_label}
    assert metrics[-1]["converged"] is True


def test_bowtie_random_vs_python(spark):
    rng = random.Random(4321)
    n = 40
    pairs = list({(rng.randrange(n), rng.randrange(n)) for _ in range(90)})
    out, _ = bowtie(make_edges(spark, pairs))
    want, _core = python_bowtie(pairs)
    got = {r["vid"]: r["region"] for r in out.collect()}
    assert got == want


def test_bowtie_vertices_and_precomputed_scc(spark):
    from pds_hw2_mpi_connected_components_spark.operators.scc import (
        strongly_connected_components,
    )

    pairs = GRAPHS["canonical"]
    vertices = spark.createDataFrame(
        [(v,) for v in range(60)], "vid long"
    )
    edges = make_edges(spark, pairs)
    labels, _ = strongly_connected_components(edges, vertices=vertices)
    out, metrics = bowtie(edges, vertices=vertices, scc_labels=labels)
    # no "scc" phase entry when labels are supplied
    assert all(m["phase"] != "scc" for m in metrics)
    want, _core = python_bowtie(pairs, vertices=range(60))
    got = {r["vid"]: r["region"] for r in out.collect()}
    assert got == want
    # isolated vertices are DISC
    assert got[59] == "DISC"


def test_bowtie_empty(spark):
    empty = spark.createDataFrame([], "src long, dst long")
    out, metrics = bowtie(empty)
    assert out.count() == 0
    assert metrics[-1]["converged"] is True
