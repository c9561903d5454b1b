"""CSR-mode CC/PageRank must match the DataFrame mode bit-for-bit (CC) /
to 1e-9 (PR), on fixtures and random graphs."""

import random

import numpy as np
import pytest

from pds_hw2_mpi_connected_components_spark.operators.cc import connected_components
from pds_hw2_mpi_connected_components_spark.operators.csr import (
    connected_components_csr,
    pagerank_csr,
)
from pds_hw2_mpi_connected_components_spark.operators.pagerank import pagerank
from tests.conftest import cc_oracle, make_edges
from tests.test_pagerank import CASES, numpy_pagerank


@pytest.mark.parametrize("name", sorted(CASES))
def test_pagerank_csr_vs_numpy(spark, name):
    n, pairs = CASES[name]
    vertices = spark.createDataFrame([(i,) for i in range(n)], "vid long")
    ranks, _ = pagerank_csr(make_edges(spark, pairs), vertices=vertices, tol=1e-12)
    got = np.zeros(n)
    for r in ranks.collect():
        got[r["vid"]] = r["rank"]
    assert np.allclose(got, numpy_pagerank(n, pairs), atol=1e-6)


def test_cc_csr_random_vs_union_find(spark):
    rng = random.Random(11)
    n = 500
    pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(520)]
    pairs = [(a, b) for a, b in pairs if a != b]
    vertices = spark.createDataFrame([(i,) for i in range(n)], "vid long")
    labels, _ = connected_components_csr(make_edges(spark, pairs), vertices=vertices)
    got = {r["vid"]: r["label"] for r in labels.collect()}
    assert got == cc_oracle(pairs, vertices=range(n))


def test_cc_csr_matches_dataframe_mode(spark):
    rng = random.Random(23)
    n = 400
    pairs = list({(rng.randrange(n), rng.randrange(n)) for _ in range(300)})
    pairs = [(a, b) for a, b in pairs if a != b]
    vertices = spark.createDataFrame([(i,) for i in range(n)], "vid long")
    e = make_edges(spark, pairs)
    df_labels, _ = connected_components(e, vertices=vertices)
    csr_labels, _ = connected_components_csr(e, vertices=vertices)
    assert {(r["vid"], r["label"]) for r in df_labels.collect()} == {
        (r["vid"], r["label"]) for r in csr_labels.collect()
    }


def test_pagerank_csr_matches_dataframe_mode(spark):
    n, pairs = CASES["two_islands"]
    vertices = spark.createDataFrame([(i,) for i in range(n)], "vid long")
    e = make_edges(spark, pairs)
    a, _ = pagerank(e, vertices=vertices, tol=0.0, max_iter=10)
    b, _ = pagerank_csr(e, vertices=vertices, tol=0.0, max_iter=10)
    am = {r["vid"]: r["rank"] for r in a.collect()}
    bm = {r["vid"]: r["rank"] for r in b.collect()}
    assert all(abs(am[v] - bm[v]) < 1e-12 for v in am)
