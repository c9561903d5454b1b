"""ANF / effective diameter vs an exact-replica Python sketch oracle.

The operator's determinism contract (operators/anf.py module docstring)
says the FM sketches are reproducible bit-for-bit from the published
hash spec — so the oracle here is not a tolerance band: it replays the
exact masks and the per-hop estimates must match to the 6-decimal
rounding both sides apply. A separate test checks the ESTIMATOR against
exact neighborhood counts within FM's published error envelope.
"""

from __future__ import annotations

import math
import random
from collections import deque

import pytest

from pds_hw2_mpi_connected_components_spark.operators.anf import (
    FM_PHI,
    anf,
    effective_diameter,
)

from tests.conftest import make_edges


def _bit(vid: int, t: int) -> int:
    x = ((vid % 2**31) ^ (t * 12582917 + 2654435769)) & 0x7FFFFFFF
    y = ((x * 2654435761) >> 16) & 0x7FFFFFFF
    z = ((y * 1597334677) >> 16) & 0x7FFFFFFF
    if z == 0:
        return 30
    return min(30, (z & -z).bit_length() - 1)


def _lzb(m: int) -> int:
    return ((~m & (m + 1)).bit_length()) - 1


def python_anf(pairs, n_trials, max_hops, vertices=(), directed=True):
    """Exact replay of the operator's sketch recursion."""
    vs = set(vertices)
    adj: dict = {}
    arcs = set()
    for a, b in pairs:
        vs.add(a)
        vs.add(b)
        if a != b:
            arcs.add((a, b))
            if not directed:
                arcs.add((b, a))
    for a, b in arcs:
        adj.setdefault(a, set()).add(b)
    masks = {v: [1 << _bit(v, t) for t in range(n_trials)] for v in vs}

    def est_sum():
        s = 0.0
        for v in vs:
            mean = sum(_lzb(m) for m in masks[v]) / float(n_trials)
            s += 2.0 ** mean / FM_PHI
        return round(s, 6)

    curve = [est_sum()]
    for _ in range(max_hops):
        nxt = {}
        changed = False
        for v in vs:
            acc = list(masks[v])
            for w in adj.get(v, ()):
                for i in range(n_trials):
                    acc[i] |= masks[w][i]
            nxt[v] = acc
            changed = changed or acc != masks[v]
        masks = nxt
        curve.append(est_sum())
        if not changed:
            break
    while len(curve) < max_hops + 1:
        curve.append(curve[-1])
    return curve


def exact_pairs_within(pairs, h, directed=True):
    """Exact N(h) by BFS from every vertex."""
    vs = set()
    adj: dict = {}
    for a, b in pairs:
        vs.add(a)
        vs.add(b)
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        if not directed:
            adj.setdefault(b, set()).add(a)
    total = 0
    for s in vs:
        dist = {s: 0}
        q = deque([s])
        while q:
            v = q.popleft()
            if dist[v] >= h:
                continue
            for w in adj.get(v, ()):
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
        total += len(dist)
    return total


GRAPHS = {
    "cycle_with_tail": [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (9, 0), (5, 6)],
    "path8": [(i, i + 1) for i in range(8)],
    "star_out": [(0, i) for i in range(1, 9)],
}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_anf_exact_sketch_replay(spark, name):
    pairs = GRAPHS[name]
    out, metrics = anf(make_edges(spark, pairs), n_trials=8, max_hops=10)
    got = [v for _, v in sorted((r["hop"], r["n_est"]) for r in out.collect())]
    want = python_anf(pairs, n_trials=8, max_hops=10)
    assert got == pytest.approx(want, abs=2e-6), name
    assert len(got) == 11
    assert metrics[-1]["converged"] is True


def test_anf_undirected_and_vertices(spark):
    pairs = [(0, 1), (1, 2)]
    vertices = spark.createDataFrame([(i,) for i in range(6)], "vid long")
    out, _ = anf(make_edges(spark, pairs), vertices=vertices, n_trials=8,
                 max_hops=4, directed=False)
    got = [v for _, v in sorted((r["hop"], r["n_est"]) for r in out.collect())]
    want = python_anf(pairs, n_trials=8, max_hops=4,
                      vertices=range(6), directed=False)
    assert got == pytest.approx(want, abs=2e-6)


def test_anf_estimator_accuracy(spark):
    """k=64 trials: for balls past the tiny-set regime the FM estimate of
    N(h) sits within ~3 standard errors (3 * 0.78 / sqrt(k) ~= 30%) of
    the exact count. Hop 0 (all balls singletons) is OUTSIDE that regime:
    the classic estimator E[2^R]/phi overshoots 1-element sets by a known
    constant factor (~1.8; Flajolet-Martin 1985 analyze the small-n bias)
    — pinned here as a ratio band so a hash regression can't hide in it."""
    rng = random.Random(7)
    n = 60
    pairs = list({(rng.randrange(n), rng.randrange(n)) for _ in range(150)})
    out, _ = anf(make_edges(spark, pairs), n_trials=64, max_hops=12)
    got = {r["hop"]: r["n_est"] for r in out.collect()}
    assert 1.5 <= got[0] / n <= 2.1, got[0]
    for h in (2, 4, 8, 12):
        exact = exact_pairs_within(pairs, h)
        assert math.isclose(got[h], exact, rel_tol=0.30), (h, got[h], exact)


def test_anf_nonconvergence_flagged(spark):
    pairs = [(i, i + 1) for i in range(12)]
    with pytest.warns(RuntimeWarning, match="max_hops"):
        out, metrics = anf(make_edges(spark, pairs), n_trials=4, max_hops=3)
    assert metrics[-1]["converged"] is False
    assert out.count() == 4


def test_effective_diameter():
    # exact curve of a directed 5-path: N(h) = (5-h)+...+5 pairs
    curve = [5, 9, 12, 14, 15]
    # target = 0.9*15 = 13.5 -> crosses between h=2 (12) and h=3 (14)
    assert effective_diameter(curve) == pytest.approx(2 + 1.5 / 2)
    assert effective_diameter([10, 10]) == 0.0
    assert effective_diameter([1, 5, 10, 10], q=1.0) == pytest.approx(2.0)
    with pytest.raises(ValueError):
        effective_diameter([])


def test_anf_partitioning_invariance(spark):
    rng = random.Random(31)
    n = 40
    pairs = list({(rng.randrange(n), rng.randrange(n)) for _ in range(100)})
    base = make_edges(spark, pairs)
    a, _ = anf(base.repartition(3), n_trials=8, max_hops=8)
    shuffled = list(pairs)
    rng.shuffle(shuffled)
    b, _ = anf(make_edges(spark, shuffled).repartition(17), n_trials=8,
               max_hops=8)
    ca = sorted((r["hop"], r["n_est"]) for r in a.collect())
    cb = sorted((r["hop"], r["n_est"]) for r in b.collect())
    assert ca == cb
