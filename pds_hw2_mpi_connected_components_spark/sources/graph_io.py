"""Graph-file ingestion: MatrixMarket text and the reference's binary CSC.

These are the reference's only two input formats — closing them means a user
with an existing graph file (com-Friendster/mawi-style .mtx, or a .bin
produced by the reference's converter) can run this engine directly:

- MatrixMarket coordinate/array (reference converter
  /root/reference/src/converter/mtx_to_bin.c:100-245): ``%%MatrixMarket``
  banner, ``%`` comments, 1-based indices, `symmetric` symmetry REQUIRED
  (:115-123), pattern or value field (zero values dropped :138-145),
  off-diagonal entries expanded to both directions (:144-151).
- binary CSC (reference loader /root/reference/src/matrix.c:94-271):
  header = uint32 nrows, uint32 ncols, uint64 nnz (little-endian), then
  uint32 col_ptr[ncols+1], then uint32 row_idx[nnz]. The reader mirrors the
  reference's per-rank windowed pread design (:127-159): every Spark task
  preads ONLY its column range's col_ptr window and row_idx slice — the
  driver reads just the 16-byte header.

Scale notes: .mtx parsing is a distributed text scan (one zipWithIndex pass
to skip the header prefix stably, then a codegen'd split/filter). The .bin
WRITER is driver-side by design — the format itself is a single sequential
binary stream (an interchange format for the reference tooling, not the
engine's scale sink, which is partitioned parquet — plans/checkpoint.py).
"""

from __future__ import annotations

import os
import struct
from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_BANNER = "%%MatrixMarket"
_HEADER_STRUCT = struct.Struct("<IIQ")  # nrows u32, ncols u32, nnz u64


class GraphFormatError(ValueError):
    pass


def _read_mtx_header(path: str) -> tuple[dict, int]:
    """Parse banner + size line driver-side, reading only the file prefix.
    Returns (header dict, number of prefix lines to skip distributedly)."""
    with open(path, "r") as f:
        banner = f.readline()
        parts = banner.split()
        if len(parts) != 5 or parts[0] != _BANNER or parts[1] != "matrix":
            raise GraphFormatError(f"invalid MatrixMarket banner: {banner!r}")
        fmt, field, symmetry = parts[2].lower(), parts[3].lower(), parts[4].lower()
        if fmt not in ("coordinate", "array"):
            raise GraphFormatError(f"unsupported format {fmt!r}")
        if symmetry != "symmetric":
            # the reference refuses non-symmetric inputs (mtx_to_bin.c:115-123)
            raise GraphFormatError(
                f"MatrixMarket symmetry is {symmetry!r}; this engine (like the "
                "reference converter) expects an undirected graph — provide a "
                "symmetric .mtx or symmetrize explicitly"
            )
        lines = 1
        while True:
            line = f.readline()
            if not line:
                raise GraphFormatError("missing size line")
            lines += 1
            if line.lstrip().startswith("%") or not line.strip():
                continue
            size = line.split()
            break
        if fmt == "coordinate":
            if len(size) != 3:
                raise GraphFormatError(f"invalid coordinate size line: {line!r}")
            nrows, ncols, nnz = (int(x) for x in size)
        else:
            if len(size) != 2:
                raise GraphFormatError(f"invalid array size line: {line!r}")
            nrows, ncols = (int(x) for x in size)
            nnz = nrows * ncols
        return (
            {"format": fmt, "field": field, "nrows": nrows, "ncols": ncols, "nnz": nnz},
            lines,
        )


def read_mtx(spark: SparkSession, path: str) -> tuple[DataFrame, dict]:
    """MatrixMarket -> (edges (src,dst) 0-based long, header dict).

    Symmetric expansion matches the reference converter exactly: every
    off-diagonal entry (a,b) also emits (b,a); zero-valued entries are
    dropped; out-of-bounds indices raise (mtx_to_bin.c:133-151). Output is
    deduplicated (the engine's edge contract; CC/PageRank semantics are
    unchanged by duplicate edges in the reference's CSC too)."""
    header, skip = _read_mtx_header(path)
    sc = spark.sparkContext
    # zipWithIndex gives stable global line numbers (one lightweight extra
    # pass) — the only order-reliable way to skip the header prefix when the
    # text scan is split across tasks.
    lines = (
        sc.textFile(path)
        .zipWithIndex()
        .filter(lambda t: t[1] >= skip)
        .map(lambda t: (t[0],))
        .toDF(["line"])
    )
    body = lines.select(F.trim("line").alias("line")).where(
        (F.length("line") > 0) & ~F.col("line").startswith("%")
    )
    toks = body.select(F.split("line", r"\s+").alias("t"))
    if header["format"] == "coordinate":
        pattern = header["field"] == "pattern"
        ent = toks.select(
            F.element_at("t", 1).cast("long").alias("i"),
            F.element_at("t", 2).cast("long").alias("j"),
            (F.lit(1.0) if pattern else F.element_at("t", 3).cast("double")).alias("val"),
        )
    else:
        # array format: column-major dense values (mtx_to_bin.c:219-244);
        # one value per line, row index derived from the line position.
        vals = (
            sc.textFile(path)
            .zipWithIndex()
            .filter(lambda t: t[1] >= skip)
            .map(lambda t: (t[0].strip(), t[1] - skip))
            .toDF(["line", "pos"])
        )
        nr = header["nrows"]
        ent = vals.where((F.length("line") > 0) & ~F.col("line").startswith("%")).select(
            (F.col("pos") % nr + 1).alias("i"),
            (F.col("pos") / nr + 1).cast("long").alias("j"),
            F.col("line").cast("double").alias("val"),
        )
    bad = ent.where(
        F.col("i").isNull() | F.col("j").isNull()
        | (F.col("i") < 1) | (F.col("j") < 1)
        | (F.col("i") > header["nrows"]) | (F.col("j") > header["ncols"])
    ).count()
    if bad:
        raise GraphFormatError(f"{bad} entries out of bounds or unparseable in {path}")
    nz = ent.where(F.col("val") != 0.0).select(
        (F.col("i") - 1).alias("a"), (F.col("j") - 1).alias("b")
    )
    edges = (
        nz.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .union(
            nz.where(F.col("a") != F.col("b")).select(
                F.col("b").alias("src"), F.col("a").alias("dst")
            )
        )
        .distinct()
    )
    return edges, header


def write_mtx(edges: DataFrame, n: int, path: str) -> int:
    """Symmetric coordinate/pattern .mtx from an (src,dst) edge table:
    stores the lower triangle only (a >= b), 1-based — the storage contract
    the reference converter expands from. Driver-side sequential write (the
    format is a single text stream); returns stored entry count."""
    tri = (
        edges.select(
            F.greatest("src", "dst").alias("a"), F.least("src", "dst").alias("b")
        )
        .distinct()
        .orderBy("a", "b")
        .toPandas()
    )
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate pattern symmetric\n")
        f.write(f"% written by {__name__}\n")
        f.write(f"{n} {n} {len(tri)}\n")
        np.savetxt(f, tri.to_numpy() + 1, fmt="%d")
    return len(tri)


# ---------------------------------------------------------------------------
# binary CSC (.bin)
# ---------------------------------------------------------------------------

def write_bin_csc(edges: DataFrame, nrows: int, ncols: int, path: str) -> int:
    """The reference converter's output format (mtx_to_bin.c:320-368):
    CSC over the ALREADY-EXPANDED edge set — (src,dst) becomes
    row_idx=src within column dst, columns sorted, rows sorted per column.
    Driver-side (single sequential binary stream); returns nnz."""
    pdf = edges.select(
        F.col("dst").cast("long").alias("col"), F.col("src").cast("long").alias("row")
    ).orderBy("col", "row").toPandas()
    col = pdf["col"].to_numpy()
    row = pdf["row"].to_numpy()
    if len(col) and (col.min() < 0 or col.max() >= ncols or row.min() < 0 or row.max() >= nrows):
        raise GraphFormatError("edge endpoint out of bounds for declared shape")
    col_ptr = np.zeros(ncols + 1, dtype=np.uint64)
    np.add.at(col_ptr, col + 1, 1)
    col_ptr = np.cumsum(col_ptr)
    if col_ptr[-1] > np.iinfo(np.uint32).max:
        raise GraphFormatError("nnz exceeds uint32 col_ptr capacity (format limit)")
    with open(path, "wb") as f:
        f.write(_HEADER_STRUCT.pack(nrows, ncols, len(row)))
        col_ptr.astype(np.uint32).tofile(f)
        row.astype(np.uint32).tofile(f)
    return len(row)


def read_bin_header(path: str) -> dict:
    with open(path, "rb") as f:
        nrows, ncols, nnz = _HEADER_STRUCT.unpack(f.read(_HEADER_STRUCT.size))
    return {"nrows": nrows, "ncols": ncols, "nnz": nnz}


def read_bin_csc(
    spark: SparkSession, path: str, num_partitions: Optional[int] = None
) -> tuple[DataFrame, dict]:
    """.bin -> (edges (src,dst) long, header). Distributed exactly like the
    reference's per-rank loader (matrix.c:127-159): the driver reads the
    16-byte header only; each task owns a contiguous column block and preads
    its own col_ptr window (+1 entry) and row_idx slice. ``path`` must be
    task-readable (local/shared filesystem — same contract as the MPI
    reference's file)."""
    header = read_bin_header(path)
    nrows, ncols, nnz = header["nrows"], header["ncols"], header["nnz"]
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    num_partitions = max(1, min(num_partitions, ncols)) if ncols else 1
    # the reference's block partition of columns (matrix.c:126-133)
    per, rem = (ncols // num_partitions, ncols % num_partitions) if ncols else (0, 0)
    blocks = []
    for r in range(num_partitions):
        start = r * per + min(r, rem)
        end = start + per + (1 if r < rem else 0)
        blocks.append((start, end))
    spec = spark.createDataFrame(blocks, "start_col long, end_col long").repartition(
        num_partitions, "start_col"
    )
    hdr_size = _HEADER_STRUCT.size

    def load(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            for start, end in zip(b["start_col"], b["end_col"]):
                start, end = int(start), int(end)
                if end <= start:
                    continue
                with open(path, "rb") as f:
                    f.seek(hdr_size + 4 * start)
                    win = np.fromfile(f, dtype=np.uint32, count=end - start + 1)
                    lo, hi = int(win[0]), int(win[-1])
                    f.seek(hdr_size + 4 * (ncols + 1) + 4 * lo)
                    rows = np.fromfile(f, dtype=np.uint32, count=hi - lo)
                cols = np.repeat(
                    np.arange(start, end, dtype=np.int64), np.diff(win.astype(np.int64))
                )
                yield pd.DataFrame(
                    {"src": rows.astype(np.int64), "dst": cols}
                )

    edges = spec.mapInPandas(load, schema="src long, dst long")
    return edges, header
