"""CLI surface: ingest -> cc benchmark report -> pagerank, in-process."""

import json

import pytest

from pds_hw2_mpi_connected_components_spark import cli
from pds_hw2_mpi_connected_components_spark.sources.datagen import generate_pages


@pytest.fixture(scope="module")
def ingested(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("cli")
    pages_dir = str(root / "pages.parquet")
    generate_pages(spark, 300, n_components=5).write.mode("overwrite").parquet(pages_dir)
    out = str(root / "graph")
    rc = cli.main(["--master", "local[4]", "ingest", "--pages", pages_dir, "--out", out])
    assert rc == 0
    return out


def test_cli_cc_report(ingested, capsys):
    rc = cli.main(["--master", "local[4]", "cc", "-n", "2",
                   "--edges", f"{ingested}/edges.parquet"])
    out = capsys.readouterr().out
    assert rc == 0
    report = json.loads(out[out.index("{"):])
    assert report["result"]["components"] == 5
    assert report["result"]["trials_consistent"] is True
    assert report["benchmark"]["n_trials"] == 2
    assert report["result"]["edges_per_sec"] > 0
    assert report["benchmark"]["mean_s"] >= report["benchmark"]["min_s"]


def test_cli_cc_csr_mode_same_checksum(ingested, capsys):
    rc = cli.main(["--master", "local[4]", "cc", "-n", "1", "--mode", "csr",
                   "--edges", f"{ingested}/edges.parquet"])
    out_csr = json.loads(capsys.readouterr().out.lstrip())
    rc2 = cli.main(["--master", "local[4]", "cc", "-n", "1", "--mode", "df",
                    "--edges", f"{ingested}/edges.parquet"])
    out_df = json.loads(capsys.readouterr().out.lstrip())
    assert rc == rc2 == 0
    assert out_csr["result"]["labels_checksum"] == out_df["result"]["labels_checksum"]


def test_cli_pagerank(ingested, capsys):
    rc = cli.main(["--master", "local[4]", "pagerank",
                   "--edges", f"{ingested}/edges.parquet", "--max-iter", "10"])
    assert rc == 0
    report = json.loads(capsys.readouterr().out.lstrip())
    assert len(report["top10"]) == 10
    assert report["iterations"] <= 10


def test_cli_convert_and_file_inputs(ingested, tmp_path, capsys):
    """convert .mtx -> .bin, then run cc from BOTH file formats: same
    component count and labels checksum as the parquet path (the reference's
    converter + loader pipeline, end to end)."""
    from pds_hw2_mpi_connected_components_spark.sources.graph_io import write_mtx
    from pds_hw2_mpi_connected_components_spark.plans.session import get_spark

    spark = get_spark(master="local[4]")
    edges = spark.read.parquet(f"{ingested}/edges.parquet")
    n = spark.read.parquet(f"{ingested}/vertices.parquet").count()
    mtx = str(tmp_path / "g.mtx")
    write_mtx(edges, n, mtx)

    bin_path = str(tmp_path / "g.bin")
    rc = cli.main(["--master", "local[4]", "convert", mtx, bin_path])
    assert rc == 0
    conv = json.loads(capsys.readouterr().out.lstrip())
    assert conv["nrows"] == n and conv["nnz_expanded"] > 0

    reports = {}
    for src in (mtx, bin_path):
        rc = cli.main(["--master", "local[4]", "cc", "-n", "1", "--edges", src])
        assert rc == 0
        out = capsys.readouterr().out
        reports[src] = json.loads(out[out.index("{"):])
    assert reports[mtx]["result"]["components"] == 5
    assert (reports[mtx]["result"]["labels_checksum"]
            == reports[bin_path]["result"]["labels_checksum"])


def test_cli_bad_input_is_friendly(tmp_path, capsys):
    bad = str(tmp_path / "bad.mtx")
    with open(bad, "w") as f:
        f.write("%%MatrixMarket matrix coordinate pattern general\n2 2 1\n2 1\n")
    rc = cli.main(["--master", "local[4]", "cc", "--edges", bad])
    assert rc == 1
    err = capsys.readouterr().err
    assert err.startswith("error:") and "Traceback" not in err
    rc = cli.main(["--master", "local[4]", "cc", "--edges",
                   str(tmp_path / "missing.mtx")])
    assert rc == 1


def test_cli_analyze_scc_bowtie_anf(ingested, capsys):
    """Round-6 analyze surface: the three directed analyses each print a
    JSON report; scc and the undirected cc agree on the graph's shape
    (every SCC is inside a weak component, so #SCC >= #CC = 5); bowtie
    regions sum to the vertex count; the anf curve is monotone and the
    effective diameter falls inside the curve's hop range."""
    edges = f"{ingested}/edges.parquet"
    rc = cli.main(["--master", "local[4]", "analyze", "--op", "scc",
                   "--edges", edges])
    scc = json.loads(capsys.readouterr().out.lstrip())
    assert rc == 0
    assert scc["result"]["strongly_connected_components"] >= 5
    assert scc["result"]["converged"] is True

    rc = cli.main(["--master", "local[4]", "analyze", "--op", "bowtie",
                   "--edges", edges])
    bt = json.loads(capsys.readouterr().out.lstrip())
    assert rc == 0
    assert set(bt["result"]["regions"]) <= {
        "CORE", "IN", "OUT", "TUBE", "TENDRIL", "DISC"}
    assert bt["result"]["regions"].get("CORE", 0) >= 1

    rc = cli.main(["--master", "local[4]", "analyze", "--op", "anf",
                   "--edges", edges, "--trials", "8", "--hops", "12"])
    an = json.loads(capsys.readouterr().out.lstrip())
    assert rc == 0
    curve = an["result"]["n_est_curve"]
    assert len(curve) == 13
    assert all(b >= a for a, b in zip(curve, curve[1:]))
    assert 0.0 <= an["result"]["effective_diameter_90"] <= 12
