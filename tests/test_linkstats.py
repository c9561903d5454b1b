"""HITS vs dense numpy oracle; k-core vs a pure-Python peel oracle; local
clustering coefficient vs brute force."""

import math

import numpy as np
import pytest

from pds_hw2_mpi_connected_components_spark.operators.hits import hits
from pds_hw2_mpi_connected_components_spark.operators.kcore import k_core
from pds_hw2_mpi_connected_components_spark.operators.triangles import (
    clustering_coefficient,
)
from tests.conftest import make_edges

CASES = {
    "cycle6": (6, [(i, (i + 1) % 6) for i in range(6)]),
    "star_out": (6, [(0, k) for k in range(1, 6)]),
    "star_in": (6, [(k, 0) for k in range(1, 6)]),
    "two_islands": (6, [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3)]),
    "bipartite_hub_auth": (7, [(0, 4), (0, 5), (1, 4), (1, 5), (2, 5), (2, 6), (3, 6)]),
}


def numpy_hits(n, pairs, iters=200):
    A = np.zeros((n, n))
    for a, b in pairs:
        A[a, b] = 1.0
    h = np.full(n, 1.0 / math.sqrt(n))
    a = np.zeros(n)
    for _ in range(iters):
        a = A.T @ h
        na = np.linalg.norm(a)
        if na > 0:
            a = a / na
        h = A @ a
        nh = np.linalg.norm(h)
        if nh > 0:
            h = h / nh
    return a, h


@pytest.mark.parametrize("name", sorted(CASES))
def test_hits_vs_numpy(spark, name):
    n, pairs = CASES[name]
    vertices = spark.createDataFrame([(i,) for i in range(n)], "vid long")
    scores, metrics = hits(make_edges(spark, pairs), vertices=vertices, tol=1e-12)
    got_a, got_h = np.zeros(n), np.zeros(n)
    for r in scores.collect():
        got_a[r["vid"]], got_h[r["vid"]] = r["auth"], r["hub"]
    want_a, want_h = numpy_hits(n, pairs)
    assert np.allclose(got_a, want_a, atol=1e-6), name
    assert np.allclose(got_h, want_h, atol=1e-6), name
    # both vectors L2-normalized
    assert abs(np.linalg.norm(got_a) - 1.0) < 1e-9
    assert abs(np.linalg.norm(got_h) - 1.0) < 1e-9
    assert metrics[-1]["l1_delta"] < 1e-12 or len(metrics) == 50


def test_hits_no_edges(spark):
    vertices = spark.createDataFrame([(i,) for i in range(4)], "vid long")
    scores, _ = hits(make_edges(spark, []), vertices=vertices)
    rows = {r["vid"]: (r["auth"], r["hub"]) for r in scores.collect()}
    assert rows == {i: (0.0, 0.0) for i in range(4)}


def python_k_core(pairs, k):
    """Peel oracle: repeatedly drop vertices with undirected degree < k."""
    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    changed = True
    while changed:
        changed = False
        for v in [v for v, ns in adj.items() if len(ns) < k]:
            for u in adj.pop(v):
                adj[u].discard(v)
            changed = True
    return set(adj)


KCORE_GRAPHS = {
    # 5-clique with a pendant path hanging off vertex 0
    "clique_tail": [(a, b) for a in range(5) for b in range(a + 1, 5)]
    + [(0, 5), (5, 6), (6, 7)],
    # two triangles sharing a vertex
    "bowtie": [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2)],
    # 3x3 grid (no 3-core)
    "grid3": [(r * 3 + c, r * 3 + c + 1) for r in range(3) for c in range(2)]
    + [(r * 3 + c, (r + 1) * 3 + c) for r in range(2) for c in range(3)],
}


@pytest.mark.parametrize("name", sorted(KCORE_GRAPHS))
@pytest.mark.parametrize("k", [2, 3, 4])
def test_k_core_vs_python(spark, name, k):
    pairs = KCORE_GRAPHS[name]
    survivors, metrics = k_core(make_edges(spark, pairs), k=k)
    got = {r["vid"] for r in survivors.collect()}
    want = python_k_core(pairs, k)
    assert got == want, (name, k)
    # the peel reached a fixpoint (last round removed nothing)
    assert len(metrics) >= 1
    if len(metrics) >= 2:
        assert metrics[-1]["edges"] == metrics[-2]["edges"]


def python_coreness(pairs):
    """Sequential peel oracle: core number = the threshold-1 at which the
    vertex is removed when peeling with an ever-growing threshold."""
    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    alive = {v: len(ns) for v, ns in adj.items()}
    core = {}
    k = 1
    while alive:
        mn = min(alive.values())
        if mn >= k:
            k = mn + 1
        victims = [v for v, d in alive.items() if d < k]
        for v in victims:
            core[v] = k - 1
            del alive[v]
        for v in victims:
            for u in adj[v]:
                if u in alive:
                    alive[u] -= 1
    return core


def _random_pairs(seed=42, n=60, m=150):
    import random

    rng = random.Random(seed)
    return list({(a, b) for a, b in (
        (rng.randrange(n), rng.randrange(n)) for _ in range(m)
    ) if a != b})


CORENESS_GRAPHS = dict(KCORE_GRAPHS, random60=_random_pairs())


@pytest.mark.parametrize("name", sorted(CORENESS_GRAPHS))
def test_coreness_vs_python(spark, name):
    from pds_hw2_mpi_connected_components_spark.operators.kcore import coreness

    pairs = CORENESS_GRAPHS[name]
    out, metrics = coreness(make_edges(spark, pairs))
    got = {r["vid"]: r["coreness"] for r in out.collect()}
    assert got == python_coreness(pairs), name
    assert metrics[-1]["converged"] is True


def test_coreness_isolated_vertices(spark):
    from pds_hw2_mpi_connected_components_spark.operators.kcore import coreness

    pairs = [(0, 1), (1, 2), (2, 0)]
    vertices = spark.createDataFrame([(i,) for i in range(6)], "vid long")
    out, _ = coreness(make_edges(spark, pairs), vertices=vertices)
    got = {r["vid"]: r["coreness"] for r in out.collect()}
    assert got == {0: 2, 1: 2, 2: 2, 3: 0, 4: 0, 5: 0}


@pytest.mark.parametrize("k", [2, 3, 4])
def test_k_core_equals_coreness_filter(spark, k):
    """The decomposition refines k_core: k-core == {v : coreness(v) >= k}."""
    from pds_hw2_mpi_connected_components_spark.operators.kcore import coreness

    pairs = _random_pairs(seed=7)
    survivors, _ = k_core(make_edges(spark, pairs), k=k)
    via_kcore = {r["vid"] for r in survivors.collect()}
    out, _ = coreness(make_edges(spark, pairs))
    via_coreness = {r["vid"] for r in out.where(f"coreness >= {k}").collect()}
    assert via_kcore == via_coreness


def test_k_core_nonconvergence_flagged(spark):
    """max_iter exhaustion is loud: converged=False in the final metrics
    entry plus a RuntimeWarning (the result is a superset of the k-core)."""
    # long path: threshold-2 peeling strips one endpoint pair per round
    pairs = [(i, i + 1) for i in range(10)]
    with pytest.warns(RuntimeWarning, match="superset"):
        _, metrics = k_core(make_edges(spark, pairs), k=2, max_iter=2)
    assert metrics[-1]["converged"] is False


def python_lcc(pairs):
    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {}
    for v, ns in adj.items():
        d = len(ns)
        t = sum(1 for u in ns for w in ns if u < w and w in adj[u])
        out[v] = (d, t, round(2.0 * t / (d * (d - 1)), 8) if d >= 2 else 0.0)
    return out


@pytest.mark.parametrize("name", sorted(KCORE_GRAPHS))
def test_clustering_coefficient_vs_python(spark, name):
    pairs = KCORE_GRAPHS[name]
    got = {
        r["vid"]: (r["deg"], r["tri"], r["lcc"])
        for r in clustering_coefficient(make_edges(spark, pairs)).collect()
    }
    assert got == python_lcc(pairs), name


def test_coreness_deep_peel_bounded_plan(spark):
    """A 220-vertex path peels one endpoint pair per round (~110 rounds).
    With fold_every=8 the victims accumulator must periodically collapse
    into a flat checkpoint (VERDICT/ADVICE r5), keeping the result's union
    plan bounded instead of O(rounds) — without the fold this plan is one
    union branch per round (>400 lines) and pins every round's checkpoint
    RDD until the final union."""
    from pds_hw2_mpi_connected_components_spark.operators.kcore import coreness

    pairs = [(i, i + 1) for i in range(219)]
    out, metrics = coreness(make_edges(spark, pairs), fold_every=8)
    assert len(metrics) >= 100  # genuinely deep peel
    n_lines = len(out._jdf.queryExecution().analyzed().toString().splitlines())
    assert n_lines < 150, f"unbounded coreness output plan: {n_lines} lines"
    got = {r["vid"]: r["coreness"] for r in out.collect()}
    assert got == python_coreness(pairs)
    assert metrics[-1]["converged"] is True
