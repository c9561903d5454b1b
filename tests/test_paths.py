"""Multi-source BFS hop distance vs a pure-Python BFS oracle."""

import pytest

from pds_hw2_mpi_connected_components_spark.operators.paths import bfs_hops
from tests.conftest import make_edges

GRAPHS = {
    "path10": [(i, i + 1) for i in range(10)],
    "cycle6": [(i, (i + 1) % 6) for i in range(6)],
    "two_islands": [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3)],
    "star": [(0, k) for k in range(1, 8)],
    "diamond": [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)],
}


def python_bfs(pairs, seeds, directed=False):
    adj = {}
    for a, b in pairs:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        if not directed:
            adj.setdefault(b, set()).add(a)
    dist = {s: 0 for s in seeds}
    frontier = list(seeds)
    d = 0
    while frontier:
        d += 1
        nxt = []
        for v in frontier:
            for u in adj.get(v, ()):
                if u not in dist:
                    dist[u] = d
                    nxt.append(u)
        frontier = nxt
    return dist


def _seed_df(spark, seeds):
    return spark.createDataFrame([(int(s),) for s in seeds], "vid long")


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_bfs_vs_python(spark, name):
    pairs = GRAPHS[name]
    out, metrics = bfs_hops(make_edges(spark, pairs), _seed_df(spark, [0]))
    got = {r["vid"]: r["hops"] for r in out.collect()}
    assert got == python_bfs(pairs, [0]), name
    assert metrics[-1]["converged"] is True


def test_bfs_multi_source_min_distance(spark):
    pairs = GRAPHS["path10"]
    out, _ = bfs_hops(make_edges(spark, pairs), _seed_df(spark, [0, 10]))
    got = {r["vid"]: r["hops"] for r in out.collect()}
    assert got == python_bfs(pairs, [0, 10])
    # the midpoint is reached from the nearer seed
    assert got[5] == 5 and got[9] == 1 and got[1] == 1


def test_bfs_directed(spark):
    pairs = [(0, 1), (1, 2), (3, 2)]  # 3 unreachable from 0 when directed
    out, _ = bfs_hops(make_edges(spark, pairs), _seed_df(spark, [0]), directed=True)
    got = {r["vid"]: r["hops"] for r in out.collect()}
    assert got == python_bfs(pairs, [0], directed=True) == {0: 0, 1: 1, 2: 2}


def test_bfs_unreachable_absent(spark):
    out, _ = bfs_hops(make_edges(spark, GRAPHS["two_islands"]), _seed_df(spark, [0]))
    got = {r["vid"]: r["hops"] for r in out.collect()}
    assert got == {0: 0, 1: 1, 2: 1}


def test_bfs_max_iter_partial_cover_flagged(spark):
    with pytest.warns(RuntimeWarning, match="non-empty frontier"):
        out, metrics = bfs_hops(
            make_edges(spark, GRAPHS["path10"]), _seed_df(spark, [0]), max_iter=3
        )
    got = {r["vid"]: r["hops"] for r in out.collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3}
    assert metrics[-1]["converged"] is False
