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


@pytest.mark.parametrize("name", ["star_hub", "two_cliques_bridge", "cycle6"])
def test_cc_salted_identical_to_plain(spark, name):
    """Hub salting (SURVEY §4 X6) must be a pure physical rewrite: min is
    associative, so two-stage salted min + salted join give bit-identical
    labels."""
    pairs, want_count = FIXTURES[name]
    plain, _ = connected_components(make_edges(spark, pairs))
    salted, _ = connected_components(make_edges(spark, pairs), salt_buckets=4)
    assert ({(r["vid"], r["label"]) for r in plain.collect()}
            == {(r["vid"], r["label"]) for r in salted.collect()})
    assert cc_count(salted) == want_count


def test_cc_salted_random_hub_graph(spark):
    """A 10^3-degree hub + random tail: salted == plain == union-find."""
    rng = random.Random(11)
    hub_pairs = [(0, k) for k in range(1, 1000)]
    tail = [(rng.randrange(1000, 1200), rng.randrange(1000, 1200)) for _ in range(300)]
    pairs = hub_pairs + [(a, b) for a, b in tail if a != b]
    salted, _ = connected_components(make_edges(spark, pairs), salt_buckets=8)
    got = {r["vid"]: r["label"] for r in salted.collect()}
    assert got == cc_oracle(pairs)


# ---------------------------------------------------------------------------
# round-3: the public cc() facade with mode auto-selection
# ---------------------------------------------------------------------------

def test_cc_facade_routes_and_agrees(spark, tmp_path):
    from pds_hw2_mpi_connected_components_spark.operators import cc
    from pds_hw2_mpi_connected_components_spark.plans.checkpoint import CheckpointStore

    pairs = [(0, 1), (1, 2), (3, 4), (5, 6), (6, 7), (7, 5)]
    edges = spark.createDataFrame(pairs, "src long, dst long").localCheckpoint(eager=True)

    # small vertex set -> auto picks csr (the measured-fastest small regime)
    r_auto = cc(edges)
    assert r_auto.mode == "csr"
    # past the csr vertex cap -> auto picks df (the distributed scale mode)
    r_df = cc(edges, csr_max_vertices=0)
    assert r_df.mode == "df"
    # a checkpoint store forces a resumable mode even below the cap
    store = CheckpointStore(spark, str(tmp_path / "ckpt"))
    r_ck = cc(edges, checkpoint=store)
    assert r_ck.mode == "df"
    # explicit frontier opt-in is honored
    r_fr = cc(edges, mode="frontier")
    assert r_fr.mode == "frontier"

    want = {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 5, 6: 5, 7: 5}
    for r in (r_auto, r_df, r_ck, r_fr):
        got = {x["vid"]: x["label"] for x in r.labels.collect()}
        assert got == want, r.mode

    with pytest.raises(ValueError, match="checkpoint"):
        cc(edges, mode="csr", checkpoint=store)
    with pytest.raises(ValueError, match="unknown cc mode"):
        cc(edges, mode="mpi")

    # df-mode records the post-hoc frontier-eligibility shape hint (this
    # tiny graph converges in <= FRONTIER_ELIGIBLE_MAX_ROUNDS rounds)
    assert r_df.metrics[-1]["frontier_eligible"] is True
    # non-df modes don't carry the hint
    assert "frontier_eligible" not in r_fr.metrics[-1]
