"""MatrixMarket + binary-CSC ingestion: roundtrips, format contracts, and a
known-component-count fixture — the reference's own input formats
(mtx_to_bin.c, matrix.c) so its public datasets run on this engine."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from pds_hw2_mpi_connected_components_spark.operators.cc import cc_count, connected_components
from pds_hw2_mpi_connected_components_spark.sources.graph_io import (
    GraphFormatError,
    read_bin_csc,
    read_bin_header,
    read_mtx,
    write_bin_csc,
    write_mtx,
)

# two triangles + a path + two isolates-with-self... 11 vertices, 3 components
FIXTURE_PAIRS = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (6, 7), (7, 8), (8, 6), (8, 9)]
FIXTURE_N = 11  # vertex 10 exists but has no edges (dropped by file formats)
FIXTURE_COMPONENTS_IN_FILE = 3  # {0,1,2}, {3,4,5}, {6,7,8,9}


def _edge_set(df):
    return {(r["src"], r["dst"]) for r in df.collect()}


def _sym(pairs):
    return {(a, b) for a, b in pairs} | {(b, a) for a, b in pairs}


@pytest.fixture()
def fixture_mtx(tmp_path):
    p = str(tmp_path / "g.mtx")
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix coordinate pattern symmetric\n")
        f.write("% comment line\n")
        f.write("% another comment\n")
        f.write(f"{FIXTURE_N} {FIXTURE_N} {len(FIXTURE_PAIRS)}\n")
        for a, b in FIXTURE_PAIRS:
            # lower triangle, 1-based — the symmetric storage convention
            f.write(f"{max(a, b) + 1} {min(a, b) + 1}\n")
    return p


def test_read_mtx_expands_symmetric(spark, fixture_mtx):
    edges, header = read_mtx(spark, fixture_mtx)
    assert header == {
        "format": "coordinate", "field": "pattern",
        "nrows": FIXTURE_N, "ncols": FIXTURE_N, "nnz": len(FIXTURE_PAIRS),
    }
    assert _edge_set(edges) == _sym(FIXTURE_PAIRS)


def test_mtx_cc_count(spark, fixture_mtx):
    edges, _ = read_mtx(spark, fixture_mtx)
    labels, _ = connected_components(edges.localCheckpoint(eager=True))
    assert cc_count(labels) == FIXTURE_COMPONENTS_IN_FILE
    got = {r["vid"]: r["label"] for r in labels.collect()}
    assert got == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3, 6: 6, 7: 6, 8: 6, 9: 6}


def test_mtx_roundtrip(spark, fixture_mtx, tmp_path):
    edges, _ = read_mtx(spark, fixture_mtx)
    out = str(tmp_path / "rt.mtx")
    stored = write_mtx(edges, FIXTURE_N, out)
    assert stored == len(FIXTURE_PAIRS)
    edges2, header2 = read_mtx(spark, out)
    assert _edge_set(edges2) == _edge_set(edges)
    assert header2["nnz"] == stored


def test_mtx_real_field_drops_zero_values(spark, tmp_path):
    p = str(tmp_path / "r.mtx")
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real symmetric\n")
        f.write("3 3 3\n")
        f.write("2 1 1.5\n")
        f.write("3 1 0.0\n")  # explicit zero: dropped (mtx_to_bin.c:138)
        f.write("3 2 -2.0\n")
    edges, _ = read_mtx(spark, p)
    assert _edge_set(edges) == {(1, 0), (0, 1), (2, 1), (1, 2)}


def test_mtx_array_format(spark, tmp_path):
    # dense 2x2 symmetric array, column-major: [[0,1],[1,0]]
    p = str(tmp_path / "a.mtx")
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix array real symmetric\n")
        f.write("2 2\n")
        for v in ("0.0", "1.0", "1.0", "0.0"):
            f.write(v + "\n")
    edges, header = read_mtx(spark, p)
    assert header["format"] == "array" and header["nnz"] == 4
    assert _edge_set(edges) == {(0, 1), (1, 0)}


def test_mtx_rejects_general_symmetry(spark, tmp_path):
    p = str(tmp_path / "bad.mtx")
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix coordinate pattern general\n3 3 1\n2 1\n")
    with pytest.raises(GraphFormatError, match="symmetr"):
        read_mtx(spark, p)


def test_mtx_rejects_out_of_bounds(spark, tmp_path):
    p = str(tmp_path / "oob.mtx")
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix coordinate pattern symmetric\n3 3 2\n2 1\n4 1\n")
    with pytest.raises(GraphFormatError, match="out of bounds"):
        read_mtx(spark, p)


def test_bin_roundtrip_and_layout(spark, fixture_mtx, tmp_path):
    edges, _ = read_mtx(spark, fixture_mtx)
    p = str(tmp_path / "g.bin")
    nnz = write_bin_csc(edges, FIXTURE_N, FIXTURE_N, p)
    assert nnz == 2 * len(FIXTURE_PAIRS)  # expanded adjacency, no self loops
    assert read_bin_header(p) == {"nrows": FIXTURE_N, "ncols": FIXTURE_N, "nnz": nnz}

    # byte-level contract: independent struct/numpy parse (matrix.c:111-116)
    with open(p, "rb") as f:
        nrows, ncols, n2 = struct.unpack("<IIQ", f.read(16))
        col_ptr = np.fromfile(f, dtype=np.uint32, count=ncols + 1)
        row_idx = np.fromfile(f, dtype=np.uint32, count=n2)
    assert (nrows, ncols, n2) == (FIXTURE_N, FIXTURE_N, nnz)
    assert col_ptr[0] == 0 and col_ptr[-1] == nnz
    assert np.all(np.diff(col_ptr.astype(np.int64)) >= 0)
    manual = {
        (int(row_idx[k]), c)
        for c in range(ncols)
        for k in range(col_ptr[c], col_ptr[c + 1])
    }
    assert manual == _edge_set(edges)

    edges2, header2 = read_bin_csc(spark, p, num_partitions=4)
    assert header2["nnz"] == nnz
    assert _edge_set(edges2) == _edge_set(edges)


def test_bin_reader_partition_independent(spark, fixture_mtx, tmp_path):
    edges, _ = read_mtx(spark, fixture_mtx)
    p = str(tmp_path / "g.bin")
    write_bin_csc(edges, FIXTURE_N, FIXTURE_N, p)
    sets = [
        _edge_set(read_bin_csc(spark, p, num_partitions=k)[0]) for k in (1, 3, 16)
    ]
    assert sets[0] == sets[1] == sets[2] == _edge_set(edges)


def test_bin_cc_matches_mtx_cc(spark, fixture_mtx, tmp_path):
    edges, _ = read_mtx(spark, fixture_mtx)
    p = str(tmp_path / "g.bin")
    write_bin_csc(edges, FIXTURE_N, FIXTURE_N, p)
    edges2, _ = read_bin_csc(spark, p)
    labels, _ = connected_components(edges2.localCheckpoint(eager=True))
    assert cc_count(labels) == FIXTURE_COMPONENTS_IN_FILE


def test_bin_empty_graph(spark, tmp_path):
    p = str(tmp_path / "e.bin")
    empty = spark.createDataFrame([], "src long, dst long")
    assert write_bin_csc(empty, 5, 5, p) == 0
    edges, header = read_bin_csc(spark, p)
    assert header["nnz"] == 0 and edges.count() == 0


# ---------------------------------------------------------------------------
# round-3: vectorized windowed scan + distributed chunked export
# ---------------------------------------------------------------------------

def test_read_mtx_no_rdd_text_scan(spark, fixture_mtx, monkeypatch):
    """The .mtx scan must be the windowed mapInPandas path — no
    sc.textFile / zipWithIndex per-row Python stage anywhere (the round-2
    verdict's scale-killer)."""
    def _banned(*a, **k):
        raise AssertionError("sc.textFile used in read_mtx — RDD scan regression")

    monkeypatch.setattr(type(spark.sparkContext), "textFile", _banned)
    edges, header = read_mtx(spark, fixture_mtx)
    assert header["nnz"] == len(FIXTURE_PAIRS)
    assert _edge_set(edges) == _sym(FIXTURE_PAIRS)


def test_read_mtx_tiny_windows_alignment(spark, fixture_mtx, monkeypatch):
    """Force pathologically small byte windows so every line boundary is
    exercised: window alignment must neither lose nor duplicate entries."""
    from pds_hw2_mpi_connected_components_spark.sources import graph_io

    monkeypatch.setattr(graph_io, "_WINDOW_BYTES", 7)
    edges, _ = read_mtx(spark, fixture_mtx)
    assert _edge_set(edges) == _sym(FIXTURE_PAIRS)


def test_mtx_body_comments_and_blanks(spark, tmp_path):
    """Interior comment/blank lines in the coordinate body are tolerated
    (the reference's fscanf skips whitespace; %-comments are MM-legal)."""
    p = str(tmp_path / "c.mtx")
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix coordinate pattern symmetric\n")
        f.write("3 3 2\n")
        f.write("2 1\n")
        f.write("\n% interior comment\n   \n")
        f.write("3 2\n")
    edges, _ = read_mtx(spark, p)
    assert _edge_set(edges) == {(1, 0), (0, 1), (2, 1), (1, 2)}


def test_mtx_array_body_comment_does_not_shift(spark, tmp_path):
    """Array format: a blank or comment line inside the dense value body
    must NOT shift subsequent values to the wrong matrix cell (round-2
    advice finding). Values are positioned by rank among valid data lines."""
    p = str(tmp_path / "a2.mtx")
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix array real symmetric\n")
        f.write("2 2\n")
        f.write("0.0\n1.0\n")
        f.write("% interior comment\n\n")
        f.write("1.0\n0.0\n")
    edges, header = read_mtx(spark, p)
    assert header["nnz"] == 4
    assert _edge_set(edges) == {(0, 1), (1, 0)}


def test_mtx_array_count_mismatch_raises(spark, tmp_path):
    p = str(tmp_path / "a3.mtx")
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix array real symmetric\n")
        f.write("2 2\n0.0\n1.0\n1.0\n")  # 3 values, expected 4
    with pytest.raises(GraphFormatError, match="expected nrows\\*ncols"):
        read_mtx(spark, p)


def test_mtx_unparseable_token_raises(spark, tmp_path):
    """ANSI-mode regression guard: malformed tokens must surface as
    GraphFormatError, not an opaque task-level cast error."""
    p = str(tmp_path / "u.mtx")
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix coordinate pattern symmetric\n")
        f.write("3 3 2\n2 1\nx 1\n")
    with pytest.raises(GraphFormatError, match="unparseable"):
        read_mtx(spark, p)


def test_writers_never_collect_to_driver(spark, fixture_mtx, tmp_path, monkeypatch):
    """Both exporters are distributed chunked writers: a full toPandas of
    the edge set (the round-2 driver-OOM finding) is banned outright."""
    import pyspark.sql

    edges, _ = read_mtx(spark, fixture_mtx)

    def _banned(self, *a, **k):
        raise AssertionError("DataFrame.toPandas called inside a graph writer")

    monkeypatch.setattr(pyspark.sql.DataFrame, "toPandas", _banned)
    out_mtx = str(tmp_path / "d.mtx")
    out_bin = str(tmp_path / "d.bin")
    assert write_mtx(edges, FIXTURE_N, out_mtx) == len(FIXTURE_PAIRS)
    assert write_bin_csc(edges, FIXTURE_N, FIXTURE_N, out_bin) == 2 * len(FIXTURE_PAIRS)
    monkeypatch.undo()
    edges2, _ = read_mtx(spark, out_mtx)
    assert _edge_set(edges2) == _edge_set(edges)
    edges3, _ = read_bin_csc(spark, out_bin)
    assert _edge_set(edges3) == _edge_set(edges)


def test_write_bin_rejects_out_of_shape(spark, tmp_path):
    bad = spark.createDataFrame([(0, 9)], "src long, dst long")  # dst >= ncols
    with pytest.raises(GraphFormatError, match="out of bounds"):
        write_bin_csc(bad, 3, 3, str(tmp_path / "b.bin"))


def test_big_roundtrip_10m_edges(spark, tmp_path):
    """>=10M-edge export/ingest roundtrip with bounded driver memory: the
    writers stream bucket part files (reference converter's chunked-write
    analog, mtx_to_bin.c:333-373) and must preserve the exact edge set —
    verified by count + order-insensitive xxhash64 checksum, plus CSC
    col_ptr integrity via the windowed reader."""
    n_v = 4_000_000
    n_e = 10_000_000
    edges = (
        spark.range(n_e)
        .select(
            (F.col("id") % n_v).alias("src"),
            ((F.col("id") * 2654435761) % n_v).alias("dst"),
        )
        .localCheckpoint(eager=True)
    )

    def chk(df):
        return df.agg(
            F.count("*").alias("n"), F.bit_xor(F.xxhash64("src", "dst")).alias("h")
        ).collect()[0]

    p_bin = str(tmp_path / "big.bin")
    nnz = write_bin_csc(edges, n_v, n_v, p_bin, num_buckets=16)
    assert nnz == n_e
    back, header = read_bin_csc(spark, p_bin, num_partitions=16)
    a, b = chk(edges), chk(back)
    assert (a["n"], a["h"]) == (b["n"], b["h"])

    p_mtx = str(tmp_path / "big.mtx")
    stored = write_mtx(edges, n_v, p_mtx, num_buckets=16)
    tri = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).distinct()
    assert stored == tri.count()
    back2, _ = read_mtx(spark, p_mtx)
    # read_mtx returns the symmetric closure of the stored lower triangle
    sym = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
    )
    c, d = chk(sym), chk(back2)
    assert (c["n"], c["h"]) == (d["n"], d["h"])


def test_mtx_rejects_complex_field(spark, tmp_path):
    # complex entries carry two value tokens per line; a fixed 3-column parse
    # would silently shift columns (i<-j, j<-re, v<-im) — must refuse up front
    p = str(tmp_path / "cplx.mtx")
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix coordinate complex symmetric\n")
        f.write("3 3 2\n2 1 1.0 0.5\n3 1 2.0 0.0\n")
    with pytest.raises(GraphFormatError, match="field"):
        read_mtx(spark, p)


def test_mtx_truncated_coordinate_body_raises(spark, tmp_path):
    # header declares 4 entries, body holds 2 (copy truncated mid-transfer):
    # must fail loudly instead of returning a graph missing half its edges
    p = str(tmp_path / "trunc.mtx")
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix coordinate pattern symmetric\n")
        f.write("5 5 4\n2 1\n3 2\n")
    with pytest.raises(GraphFormatError, match="header declares"):
        read_mtx(spark, p)


def test_write_bin_ignores_stale_parts(spark, tmp_path):
    # a hard-killed earlier export leaves part files behind; a new export
    # must not splice them into its output (bucket 1 is empty in this graph)
    import os

    pairs = [(0, 1), (1, 0)]  # all edges land in low columns
    edges = spark.createDataFrame(pairs, "src long, dst long")
    p = str(tmp_path / "stale.bin")
    parts = p + ".parts"
    os.makedirs(parts)
    stale_rows = np.arange(7, dtype="<u4")
    with open(os.path.join(parts, "cnt-000003"), "wb") as f:
        np.full(1, 7, dtype="<u4").tofile(f)
    with open(os.path.join(parts, "rows-000003"), "wb") as f:
        stale_rows.tofile(f)
    nnz = write_bin_csc(edges, 8, 8, p, num_buckets=8)
    assert nnz == 2
    edges2, header2 = read_bin_csc(spark, p)
    assert header2["nnz"] == 2
    assert _edge_set(edges2) == {(0, 1), (1, 0)}


def test_mtx_pattern_rejects_trailing_value(spark, tmp_path):
    # a pattern body whose rows carry an extra value token must refuse loudly:
    # with explicit short `names` pandas promotes the first column to the
    # index, silently parsing entry "1 2 5" as edge (2,5) instead of (1,2)
    p = str(tmp_path / "trail.mtx")
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix coordinate pattern symmetric\n")
        f.write("5 5 2\n1 2 5\n3 4 6\n")
    with pytest.raises(GraphFormatError, match="fields"):
        read_mtx(spark, p)


def test_mtx_valued_rejects_missing_value(spark, tmp_path):
    # a `real` body with only (i, j) per row is 2 fields where 3 are declared
    p = str(tmp_path / "short.mtx")
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real symmetric\n")
        f.write("5 5 2\n2 1\n4 3\n")
    with pytest.raises(GraphFormatError, match="fields"):
        read_mtx(spark, p)


def test_write_mtx_rejects_out_of_bounds(spark, tmp_path):
    # ids outside [0, n) must fail at write time, not surface as a bounds
    # error (or a silently clamped bucket) on re-read
    bad = spark.createDataFrame([(0, 9)], "src long, dst long")  # 9 >= n=3
    with pytest.raises(GraphFormatError, match="out of bounds"):
        write_mtx(bad, 3, str(tmp_path / "oob_w.mtx"))


def test_writers_warn_on_oversized_buckets(spark, tmp_path, monkeypatch):
    import pds_hw2_mpi_connected_components_spark.sources.graph_io as gio

    monkeypatch.setattr(gio, "_BUCKET_WARN_ENTRIES", 2)
    edges = spark.createDataFrame(FIXTURE_PAIRS, "src long, dst long")
    with pytest.warns(RuntimeWarning, match="num_buckets"):
        write_mtx(edges, FIXTURE_N, str(tmp_path / "warn.mtx"), num_buckets=1)
    with pytest.warns(RuntimeWarning, match="num_buckets"):
        write_bin_csc(edges, FIXTURE_N, FIXTURE_N, str(tmp_path / "warn.bin"),
                      num_buckets=1)


def test_sharded_export_roundtrip(spark, tmp_path):
    """sharded=True defers the single-writer concat: parts + manifest land
    on disk with NO final file; assemble_* (pure file IO, Spark-free)
    produces a byte-contract-identical file later."""
    import json as _json
    import os as _os

    from pds_hw2_mpi_connected_components_spark.sources.graph_io import (
        assemble_bin_csc,
        assemble_mtx,
    )

    edges = spark.createDataFrame(FIXTURE_PAIRS, "src long, dst long")

    p = str(tmp_path / "s.mtx")
    total = write_mtx(edges, FIXTURE_N, p, num_buckets=4, sharded=True)
    assert not _os.path.exists(p)  # no final file yet
    man = _json.load(open(p + ".manifest.json"))
    assert man["format"] == "mtx-sharded" and man["entries"] == total
    assert sum(b["n"] for b in man["buckets"]) == total
    assert assemble_mtx(p) == total
    assert not _os.path.exists(p + ".parts") and not _os.path.exists(p + ".manifest.json")
    back, _ = read_mtx(spark, p)
    assert _edge_set(back) == _sym(FIXTURE_PAIRS)

    b = str(tmp_path / "s.bin")
    nnz = write_bin_csc(edges, FIXTURE_N, FIXTURE_N, b, num_buckets=4, sharded=True)
    assert not _os.path.exists(b)
    assert assemble_bin_csc(b) == nnz
    back2, header = read_bin_csc(spark, b)
    assert header["nnz"] == nnz
    assert _edge_set(back2) == _edge_set(edges)

    # sharded and direct writes produce byte-identical .bin files
    b2 = str(tmp_path / "direct.bin")
    write_bin_csc(edges, FIXTURE_N, FIXTURE_N, b2, num_buckets=4)
    assert open(b, "rb").read() == open(b2, "rb").read()
