"""Strongly connected components vs a pure-Python Tarjan oracle.

The operator's label convention (scc = min vid of the component) matches
the undirected CC operator's, so the oracle just relabels Tarjan's
components by their min member.
"""

from __future__ import annotations

import random

import pytest

from pds_hw2_mpi_connected_components_spark.operators.scc import (
    strongly_connected_components,
)

from tests.conftest import make_edges


def tarjan_scc(pairs, vertices=()):
    """Iterative Tarjan; returns {vid: min vid of its SCC}."""
    adj: dict = {}
    vs = set(vertices)
    for a, b in pairs:
        vs.add(a)
        vs.add(b)
        if a != b:
            adj.setdefault(a, []).append(b)
    index: dict = {}
    low: dict = {}
    on_stack: set = set()
    stack: list = []
    out: dict = {}
    counter = [0]

    for root in sorted(vs):
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work[-1]
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                on_stack.add(v)
            recurse = False
            ns = adj.get(v, [])
            for i in range(pi, len(ns)):
                w = ns[i]
                if w not in index:
                    work[-1] = (v, i + 1)
                    work.append((w, 0))
                    recurse = True
                    break
                if w in on_stack:
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            work.pop()
            if work:
                pv = work[-1][0]
                low[pv] = min(low[pv], low[v])
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    out[w] = m
    return out


GRAPHS = {
    # two 3-cycles bridged by a one-way arc (bridge is not strongly connected)
    "two_cycles_bridge": [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 3)],
    # pure DAG: every vertex its own SCC
    "dag_diamond": [(0, 1), (0, 2), (1, 3), (2, 3)],
    # bowtie: IN-tendril -> core 2-cycle -> OUT-tendril
    "bowtie": [(0, 1), (1, 2), (2, 1), (2, 3), (9, 0), (3, 4)],
    # long directed path (worst-case trim depth)
    "path12": [(i, i + 1) for i in range(12)],
    # one big cycle
    "cycle8": [(i, (i + 1) % 8) for i in range(8)],
    # nested: big cycle with an inner chord cycle + dangling self-loop
    "chorded": [(0, 1), (1, 2), (2, 3), (3, 0), (1, 3), (3, 3), (3, 5)],
    # two disjoint SCCs connected through a DAG middle
    "chain_of_sccs": [(0, 1), (1, 0), (1, 2), (2, 3), (3, 4), (4, 3)],
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_scc_vs_tarjan(spark, name):
    pairs = GRAPHS[name]
    out, metrics = strongly_connected_components(
        make_edges(spark, pairs), local_threshold=0)
    got = {r["vid"]: r["scc"] for r in out.collect()}
    assert got == tarjan_scc(pairs), name
    assert metrics[-1]["converged"] is True


def test_scc_random_vs_tarjan(spark):
    rng = random.Random(1234)
    n = 48
    pairs = list({(rng.randrange(n), rng.randrange(n)) for _ in range(140)})
    out, metrics = strongly_connected_components(
        make_edges(spark, pairs), local_threshold=0)
    got = {r["vid"]: r["scc"] for r in out.collect()}
    assert got == tarjan_scc(pairs)
    assert metrics[-1]["converged"] is True


def test_scc_isolated_vertices_and_vertex_set(spark):
    pairs = [(0, 1), (1, 0)]
    vertices = spark.createDataFrame([(i,) for i in range(5)], "vid long")
    out, _ = strongly_connected_components(make_edges(spark, pairs),
                                           vertices=vertices)
    got = {r["vid"]: r["scc"] for r in out.collect()}
    assert got == {0: 0, 1: 0, 2: 2, 3: 3, 4: 4}


def test_scc_no_edges(spark):
    vertices = spark.createDataFrame([(i,) for i in range(3)], "vid long")
    empty = spark.createDataFrame([], "src long, dst long")
    out, metrics = strongly_connected_components(empty, vertices=vertices)
    got = {r["vid"]: r["scc"] for r in out.collect()}
    assert got == {0: 0, 1: 1, 2: 2}
    assert metrics[-1]["converged"] is True


def test_scc_partitioning_invariance(spark):
    """Labels must not depend on input partitioning/row order — the
    in-session analog of the verify recipe's local[8]-vs-local[32]
    determinism check."""
    rng = random.Random(99)
    n = 40
    pairs = list({(rng.randrange(n), rng.randrange(n)) for _ in range(120)})
    base = make_edges(spark, pairs)
    a, _ = strongly_connected_components(base.repartition(3), local_threshold=0)
    shuffled = list(pairs)
    rng.shuffle(shuffled)
    b, _ = strongly_connected_components(
        make_edges(spark, shuffled).repartition(17), local_threshold=0)
    la = {r["vid"]: r["scc"] for r in a.collect()}
    lb = {r["vid"]: r["scc"] for r in b.collect()}
    assert la == lb


def test_scc_nonconvergence_flagged(spark):
    """max_iter exhaustion is loud and the partial result is still correct
    for every emitted vertex (trim handles the first rounds of a path)."""
    pairs = [(i, i + 1) for i in range(30)]
    with pytest.warns(RuntimeWarning, match="max_iter"):
        out, metrics = strongly_connected_components(
            make_edges(spark, pairs), max_iter=3, local_threshold=0)
    assert metrics[-1]["converged"] is False
    want = tarjan_scc(pairs)
    got = {r["vid"]: r["scc"] for r in out.collect()}
    assert set(got).issubset(set(want))
    assert all(got[v] == want[v] for v in got)


def test_scc_deep_fold_bounded_plan(spark):
    """A chain of 2-cycles linked by one-way bridges colors as ONE class
    per outer round (min vid 0 reaches everything), so only the head SCC
    retires each round — the worst-case many-outer-round shape. With
    fold_every=2 the assigned accumulator must fold through flat
    checkpoints and keep the result's union plan bounded (the coreness
    accumulator contract, VERDICT r5 #4)."""
    # chain of 2-cycles: 2i <-> 2i+1, plus one-way bridges 2i+1 -> 2i+2
    n_cycles = 6
    pairs = []
    for i in range(n_cycles):
        a, b = 2 * i, 2 * i + 1
        pairs += [(a, b), (b, a)]
        if i < n_cycles - 1:
            pairs.append((b, 2 * i + 2))
    out, metrics = strongly_connected_components(
        make_edges(spark, pairs), fold_every=2, local_threshold=0)
    n_lines = len(out._jdf.queryExecution().analyzed().toString().splitlines())
    assert n_lines < 120, n_lines
    got = {r["vid"]: r["scc"] for r in out.collect()}
    assert got == tarjan_scc(pairs)

def test_scc_local_finish_matches_distributed(spark):
    """r7: the driver-local Tarjan finisher (operators/scc.py
    ``local_threshold``) must produce labels identical to the pure
    distributed decomposition, and its metrics must say it ran."""
    rng = random.Random(7)
    n = 60
    pairs = list({(rng.randrange(n), rng.randrange(n)) for _ in range(170)})
    edges = make_edges(spark, pairs)
    dist, m_dist = strongly_connected_components(edges, local_threshold=0)
    loc, m_loc = strongly_connected_components(edges)  # default: local path
    assert any(m["phase"] == "local" for m in m_loc)
    assert not any(m["phase"] == "local" for m in m_dist)
    assert m_loc[-1]["converged"] is True
    got_d = {r["vid"]: r["scc"] for r in dist.collect()}
    got_l = {r["vid"]: r["scc"] for r in loc.collect()}
    assert got_d == got_l == tarjan_scc(pairs)


def test_scc_local_finish_mid_decomposition(spark):
    """The local gate also fires MID-decomposition: with a threshold
    between the full size and the remnant size, the trim/gather rounds
    shrink the alive set under the bound and the Tarjan pass finishes the
    tail — labels still exact."""
    # a 16-path feeding a 3-cycle: trim peels exactly one path head per
    # round, so the arc count crosses the threshold mid-trim and the gate
    # must hand the remaining subgraph to the Tarjan finisher
    path = [(i, i + 1) for i in range(16)]
    cyc = [(16, 17), (17, 18), (18, 16)]
    pairs = path + cyc
    out, metrics = strongly_connected_components(
        make_edges(spark, pairs), local_threshold=10)
    phases = [m["phase"] for m in metrics]
    assert "local" in phases
    got = {r["vid"]: r["scc"] for r in out.collect()}
    assert got == tarjan_scc(pairs)


def test_scc_color_pointer_jumping_rounds(spark):
    """r7 (VERDICT r6 #6): color-phase pointer jumping. A directed
    L-cycle is one SCC whose min-vid color must propagate all the way
    around: plain min-propagation needs L-1 color rounds; with
    color(color(v)) jumping the distance to the fixpoint halves every
    round, so the color phase must finish in O(log L) rounds."""
    L = 32
    cyc = make_edges(spark, [(i, (i + 1) % L) for i in range(L)])
    out, metrics = strongly_connected_components(cyc, local_threshold=0)
    color_rounds = sum(1 for m in metrics if m["phase"] == "color")
    assert color_rounds <= 10, color_rounds  # plain propagation: 31+
    got = {r["vid"]: r["scc"] for r in out.collect()}
    assert got == {i: 0 for i in range(L)}
