"""PageRank vs dense numpy power-iteration oracle (allclose 1e-6), including
dangling vertices; label propagation determinism; triangle fixtures."""

import numpy as np
import pytest

from pds_hw2_mpi_connected_components_spark.operators.labelprop import label_propagation
from pds_hw2_mpi_connected_components_spark.operators.pagerank import pagerank
from pds_hw2_mpi_connected_components_spark.operators.triangles import triangle_count
from pds_hw2_mpi_connected_components_spark.sources.graph_build import symmetrize
from tests.conftest import make_edges


def numpy_pagerank(n, pairs, alpha=0.85, iters=200):
    """Dense oracle: uniform teleport + uniform dangling redistribution."""
    out_deg = np.zeros(n)
    for a, b in pairs:
        out_deg[a] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for a, b in pairs:
            contrib[b] += r[a] / out_deg[a]
        dangling = r[out_deg == 0].sum()
        r = (1 - alpha) / n + alpha * (contrib + dangling / n)
    return r


CASES = {
    "cycle6": (6, [(i, (i + 1) % 6) for i in range(6)]),
    "star_out": (6, [(0, k) for k in range(1, 6)]),          # hub fan-out
    "star_in_dangling": (6, [(k, 0) for k in range(1, 6)]),  # 0 is dangling
    "two_islands": (6, [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3)]),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_pagerank_vs_numpy(spark, name):
    n, pairs = CASES[name]
    vertices = spark.createDataFrame([(i,) for i in range(n)], "vid long")
    ranks, metrics = pagerank(make_edges(spark, pairs), vertices=vertices, tol=1e-10)
    got = np.zeros(n)
    for r in ranks.collect():
        got[r["vid"]] = r["rank"]
    want = numpy_pagerank(n, pairs)
    assert np.allclose(got, want, atol=1e-6)
    assert abs(got.sum() - 1.0) < 1e-9


def test_pagerank_cycle_uniform(spark):
    n = 6
    ranks, _ = pagerank(make_edges(spark, CASES["cycle6"][1]), tol=1e-12)
    for r in ranks.collect():
        assert abs(r["rank"] - 1.0 / n) < 1e-9


def test_pagerank_salted_matches_plain(spark):
    n, pairs = CASES["star_in_dangling"]
    vertices = spark.createDataFrame([(i,) for i in range(n)], "vid long")
    plain, _ = pagerank(make_edges(spark, pairs), vertices=vertices, tol=1e-10)
    salted, _ = pagerank(make_edges(spark, pairs), vertices=vertices, tol=1e-10,
                         salt_buckets=4)
    a = {r["vid"]: r["rank"] for r in plain.collect()}
    b = {r["vid"]: r["rank"] for r in salted.collect()}
    assert all(abs(a[v] - b[v]) < 1e-12 for v in a)


def test_labelprop_two_cliques(spark):
    # two K4s joined by a bridge: LP should find 2 communities (labels = min id)
    pairs = (
        [(a, b) for a in range(4) for b in range(a + 1, 4)]
        + [(a, b) for a in range(4, 8) for b in range(a + 1, 8)]
        + [(3, 4)]
    )
    sym = symmetrize(make_edges(spark, pairs))
    labels, metrics = label_propagation(sym, max_iter=10)
    got = {r["vid"]: r["label"] for r in labels.collect()}
    assert set(got[v] for v in range(4)) == {0}
    assert set(got[v] for v in range(4, 8)) == {4}
    # determinism: rerun gives identical labels
    labels2, _ = label_propagation(sym, max_iter=10)
    assert got == {r["vid"]: r["label"] for r in labels2.collect()}


TRI_CASES = {
    "path5": ([(0, 1), (1, 2), (2, 3), (3, 4)], 0),
    "two_cliques_bridge": (
        [(a, b) for a in range(4) for b in range(a + 1, 4)]
        + [(a, b) for a in range(4, 8) for b in range(a + 1, 8)]
        + [(3, 4)],
        8,
    ),
    "two_islands": ([(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5)], 2),
    "star_hub": ([(0, k) for k in range(1, 51)], 0),
    "cycle6": ([(i, (i + 1) % 6) for i in range(6)], 0),
    "k5": ([(a, b) for a in range(5) for b in range(a + 1, 5)], 10),
    "dup_and_reversed": ([(0, 1), (1, 0), (1, 2), (2, 0), (0, 2)], 1),
}


@pytest.mark.parametrize("name", sorted(TRI_CASES))
def test_triangles(spark, name):
    pairs, want = TRI_CASES[name]
    assert triangle_count(make_edges(spark, pairs)) == want


def test_triangles_random_vs_oracle(spark):
    import itertools
    import random

    rng = random.Random(13)
    n = 40
    pairs = {(a, b) for a, b in ((rng.randrange(n), rng.randrange(n)) for _ in range(200)) if a != b}
    adj = {i: set() for i in range(n)}
    for a, b in pairs:
        adj[a].add(b)
        adj[b].add(a)
    want = sum(
        1 for a, b, c in itertools.combinations(range(n), 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    assert triangle_count(make_edges(spark, list(pairs))) == want


def test_labelprop_frontier_matches_full(spark):
    # irregular graph: two cliques + bridge + path tail + isolates-by-edge —
    # several iterations with a shrinking changed set, so the dirty-dst
    # frontier path actually engages (metrics prove it) and must reproduce
    # the full superstep bit-for-bit at every vertex.
    pairs = (
        [(a, b) for a in range(5) for b in range(a + 1, 5)]
        + [(a, b) for a in range(5, 9) for b in range(a + 1, 9)]
        + [(4, 5), (8, 9), (9, 10), (10, 11), (12, 13)]
    )
    sym = symmetrize(make_edges(spark, pairs))
    full, m_full = label_propagation(sym, max_iter=8, frontier_threshold=-1)
    # frontier_fraction=1.0: engage the dirty path as soon as anything is
    # countable (the production default waits for the convergence tail)
    fast, m_fast = label_propagation(sym, max_iter=8, frontier_fraction=1.0)
    assert all(m["mode"] == "full" for m in m_full)
    assert any(m["mode"] == "frontier" for m in m_fast), m_fast
    a = {r["vid"]: r["label"] for r in full.collect()}
    b = {r["vid"]: r["label"] for r in fast.collect()}
    assert a == b
    # per-iteration changed counts identical => identical trajectories
    assert [m["changed"] for m in m_full] == [m["changed"] for m in m_fast]


def test_pagerank_facade_routes_and_agrees(spark, tmp_path):
    from pds_hw2_mpi_connected_components_spark.operators import pagerank_auto
    from pds_hw2_mpi_connected_components_spark.plans.checkpoint import CheckpointStore

    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 0)]
    edges = spark.createDataFrame(pairs, "src long, dst long").localCheckpoint(eager=True)

    r_auto = pagerank_auto(edges, tol=1e-10, max_iter=60)
    assert r_auto.mode == "csr"  # small vertex set -> replicated-vector mode
    r_df = pagerank_auto(edges, csr_max_vertices=0, tol=1e-10, max_iter=60)
    assert r_df.mode == "df"
    store = CheckpointStore(spark, str(tmp_path / "ckpt"))
    r_ck = pagerank_auto(edges, checkpoint=store, tol=1e-10, max_iter=60)
    assert r_ck.mode == "df"  # a checkpoint store forces the resumable mode

    base = {r["vid"]: r["rank"] for r in r_auto.ranks.collect()}
    for res in (r_df, r_ck):
        got = {r["vid"]: r["rank"] for r in res.ranks.collect()}
        assert got.keys() == base.keys()
        assert all(abs(got[v] - base[v]) < 1e-6 for v in base), res.mode
    assert abs(sum(base.values()) - 1.0) < 1e-9

    with pytest.raises(ValueError, match="checkpoint"):
        pagerank_auto(edges, mode="csr", checkpoint=store)
    with pytest.raises(ValueError, match="unknown pagerank mode"):
        pagerank_auto(edges, mode="mpi")


def test_labelprop_detects_2_cycle(spark):
    """An isolated edge (0,1) swaps labels forever under synchronous LP; a
    triangle alongside it converges. The state-fingerprint detector must stop
    the loop as soon as labels(t) == labels(t-2), report converged="2-cycle",
    and return exactly the labels a plain superstep chain holds at that
    iteration."""
    from pyspark.sql import functions as F

    from pds_hw2_mpi_connected_components_spark.operators.labelprop import lp_superstep

    pairs = [(0, 1), (2, 3), (3, 4), (2, 4)]
    sym = symmetrize(make_edges(spark, pairs))
    labels, metrics = label_propagation(sym, max_iter=20)
    assert metrics[-1]["converged"] == "2-cycle"
    stop_iter = metrics[-1]["iter"]
    assert stop_iter < 19  # stopped well before max_iter
    assert metrics[-1]["changed"] > 0
    # replay plain supersteps to the stopping iteration: labels must match
    cur = sym.select(F.col("src").alias("vid")).union(
        sym.select(F.col("dst").alias("vid"))
    ).distinct().select("vid", F.col("vid").alias("label"))
    for _ in range(stop_iter + 1):
        cur = lp_superstep(sym, cur).localCheckpoint(eager=True)
    want = {r["vid"]: r["label"] for r in cur.collect()}
    got = {r["vid"]: r["label"] for r in labels.collect()}
    assert got == want


def test_labelprop_converged_flag_on_stable_graph(spark):
    # a graph that actually converges must carry converged=True, not 2-cycle
    pairs = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    sym = symmetrize(make_edges(spark, pairs))
    _, metrics = label_propagation(sym, max_iter=10)
    assert metrics[-1]["converged"] is True
    assert metrics[-1]["changed"] == 0


# -- personalized (seeded) PageRank ----------------------------------------

def numpy_ppr(n, pairs, seeds, alpha=0.85, iters=200):
    """Dense oracle: teleport + dangling mass uniform over the seed set."""
    out_deg = np.zeros(n)
    for a, b in pairs:
        out_deg[a] += 1
    p = np.zeros(n)
    p[list(seeds)] = 1.0 / len(seeds)
    r = p.copy()
    for _ in range(iters):
        contrib = np.zeros(n)
        for a, b in pairs:
            contrib[b] += r[a] / out_deg[a]
        dangling = r[out_deg == 0].sum()
        r = ((1 - alpha) + alpha * dangling) * p + alpha * contrib
    return r


def _seed_df(spark, seeds):
    return spark.createDataFrame([(int(s),) for s in seeds], "vid long")


@pytest.mark.parametrize("name", sorted(CASES))
def test_ppr_vs_numpy(spark, name):
    n, pairs = CASES[name]
    vertices = spark.createDataFrame([(i,) for i in range(n)], "vid long")
    ranks, _ = pagerank(
        make_edges(spark, pairs), vertices=vertices, tol=1e-10,
        reset=_seed_df(spark, [0, 1]),
    )
    got = np.zeros(n)
    for r in ranks.collect():
        got[r["vid"]] = r["rank"]
    want = numpy_ppr(n, pairs, [0, 1])
    assert np.allclose(got, want, atol=1e-6), name
    assert abs(got.sum() - 1.0) < 1e-9


def test_ppr_unreachable_gets_zero_mass(spark):
    # seeds in island {0,1,2}: island {3,4,5} must converge to rank 0
    n, pairs = CASES["two_islands"]
    vertices = spark.createDataFrame([(i,) for i in range(n)], "vid long")
    ranks, _ = pagerank(
        make_edges(spark, pairs), vertices=vertices, tol=1e-12,
        reset=_seed_df(spark, [0]),
    )
    got = {r["vid"]: r["rank"] for r in ranks.collect()}
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    for v in (3, 4, 5):
        assert got[v] == pytest.approx(0.0, abs=1e-9)
    for v in (0, 1, 2):
        assert got[v] > 0.1


def test_ppr_empty_seed_intersection_raises(spark):
    n, pairs = CASES["cycle6"]
    vertices = spark.createDataFrame([(i,) for i in range(n)], "vid long")
    with pytest.raises(ValueError, match="no seed vertex"):
        pagerank(
            make_edges(spark, pairs), vertices=vertices,
            reset=_seed_df(spark, [99]),
        )


def test_ppr_checkpoint_namespace_encodes_seed_set(spark, tmp_path):
    """Resuming PPR with a DIFFERENT reset set must not restore ranks
    personalized for the old seeds (r5 ADVICE): the checkpoint namespace
    folds a count+bit_xor fingerprint of the effective seed set, so a new
    seed set opens a fresh namespace instead of silently blending."""
    import os

    from pds_hw2_mpi_connected_components_spark.plans.checkpoint import CheckpointStore

    n, pairs = CASES["cycle6"]
    vertices = spark.createDataFrame([(i,) for i in range(n)], "vid long")
    edges = make_edges(spark, pairs)
    store = CheckpointStore(spark, str(tmp_path / "ck"))
    pagerank(edges, vertices=vertices, tol=0.0, max_iter=3,
             checkpoint=store, reset=_seed_df(spark, [0, 1]))
    r_b, _ = pagerank(edges, vertices=vertices, tol=0.0, max_iter=3,
                      checkpoint=store, reset=_seed_df(spark, [2]))
    r_fresh, _ = pagerank(edges, vertices=vertices, tol=0.0, max_iter=3,
                          reset=_seed_df(spark, [2]))
    got = {r["vid"]: r["rank"] for r in r_b.collect()}
    want = {r["vid"]: r["rank"] for r in r_fresh.collect()}
    assert got.keys() == want.keys()
    assert all(abs(got[v] - want[v]) < 1e-9 for v in want)
    # the two seed sets must live in two distinct on-disk namespaces
    spaces = {d for d in os.listdir(tmp_path / "ck")
              if d.startswith("pagerank_ppr_")
              and not d.endswith("_metrics.jsonl")}
    assert len(spaces) == 2, spaces
