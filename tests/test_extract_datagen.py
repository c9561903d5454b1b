"""Extraction byte-parity + datagen determinism + graph-build ground truth.

The north-star invariant: byte-identical extracted text per url, pure
function vs distributed mapInPandas (BASELINE.json input_hint)."""

from pds_hw2_mpi_connected_components_spark.sources.datagen import (
    generate_pages,
    generate_pages_local,
    page_url,
    true_out_links,
)
from pds_hw2_mpi_connected_components_spark.sources.extract import (
    extract_links_df,
    extract_page,
)
from pds_hw2_mpi_connected_components_spark.sources.graph_build import build_graph
from pds_hw2_mpi_connected_components_spark.operators.cc import connected_components, cc_count

N, C = 400, 7


def test_datagen_deterministic_across_partitioning(spark):
    a = generate_pages(spark, N, n_components=C, num_partitions=1).collect()
    b = generate_pages(spark, N, n_components=C, num_partitions=13).collect()
    assert sorted((r["url"], bytes(r["html"])) for r in a) == sorted(
        (r["url"], bytes(r["html"])) for r in b
    )
    local = generate_pages_local(N, n_components=C)
    assert sorted(bytes(h) for h in local["html"]) == sorted(bytes(r["html"]) for r in a)


def test_extraction_byte_parity(spark):
    pages = generate_pages(spark, N, n_components=C, num_partitions=5)
    distributed = {r["url"]: (r["text"], list(r["links"]))
                   for r in extract_links_df(pages).collect()}
    local = generate_pages_local(N, n_components=C)
    for _, row in local.iterrows():
        text, links = extract_page(row["html"])
        dtext, dlinks = distributed[row["url"]]
        assert dtext == text  # byte-identical (str equality on utf-8 decoded)
        assert dlinks == links


def test_graph_build_matches_ground_truth(spark):
    pages = generate_pages(spark, N, n_components=C, num_partitions=4)
    g = build_graph(pages)
    url2vid = {r["url"]: r["vid"] for r in g.vertices.collect()}
    # vids dense, deterministic, ordered by url
    assert sorted(url2vid.values()) == list(range(len(url2vid)))
    assert [v for _, v in sorted(url2vid.items())] == list(range(len(url2vid)))

    truth = true_out_links(N, n_components=C)
    want = set()
    for pid, targets in truth.items():
        su = url2vid[page_url(pid, C)]
        for t in targets:
            dv = url2vid[page_url(t, C)]
            if su != dv:
                want.add((su, dv))
    got = {(r["src"], r["dst"]) for r in g.edges.collect()}
    assert got == want


def test_end_to_end_component_count(spark):
    # datagen guarantees exactly C components via the spine link
    pages = generate_pages(spark, N, n_components=C, num_partitions=3)
    g = build_graph(pages)
    labels, _ = connected_components(g.edges, vertices=g.vertices.select("vid"))
    assert cc_count(labels) == C


def test_pages_schema_validation(spark, tmp_path):
    from pds_hw2_mpi_connected_components_spark.sources.datagen import generate_pages
    from pds_hw2_mpi_connected_components_spark.sources.pages_io import (
        PagesSchemaError,
        read_pages,
        validate_pages_schema,
    )
    import pytest as _pytest

    pages = generate_pages(spark, 50, n_components=2)
    p = str(tmp_path / "pages.parquet")
    pages.write.mode("overwrite").parquet(p)
    ok = read_pages(spark, p)  # round-trips through validation
    assert ok.count() == 50

    # missing column
    pages.drop("lang").write.mode("overwrite").parquet(str(tmp_path / "bad1"))
    with _pytest.raises(PagesSchemaError, match="missing column 'lang'"):
        read_pages(spark, str(tmp_path / "bad1"))

    # wrong type
    bad = pages.withColumn("warc_ts", pages.url)
    with _pytest.raises(PagesSchemaError, match="warc_ts"):
        validate_pages_schema(bad)

    # extra columns are fine
    validate_pages_schema(pages.withColumn("extra", pages.url))
