"""CheckpointStore: per-iteration state persistence with atomic manifests.

The north rule requires every iteration of an iterative algorithm to
checkpoint its state (labels/ranks/edge frontier) plus per-partition lineage
and convergence metrics, so a killed run resumes mid-iteration.

Design (SURVEY.md §7.5): a thin abstraction with two backends —
- **parquet** (always available): state written to
  ``{root}/{name}/iter={k}/`` as parquet, then a JSON manifest
  ``{root}/{name}/manifest-{k}.json`` committed atomically
  (write tmp + rename). A checkpoint without a manifest is invisible —
  torn writes are ignored on resume, which is the crash-safety contract.
- **iceberg**: ``writeTo(...).using("iceberg")`` when the runtime jars are on
  the classpath (not in this sandbox); same manifest protocol on top.

The manifest records iteration number, row count, per-partition lineage
(writer-task partition index -> file, parsed from Spark's part-NNNNN
naming), and arbitrary metadata (e.g. convergence checksums), mirroring
what the reference's benchmark JSON records per trial
(/root/reference/src/benchmark.c:298-321) but per-iteration and durable.

Path contract: manifest/listing IO uses the LOCAL filesystem (os.listdir /
open), so ``root`` must be a local path (or a mount that looks like one —
NFS, fuse-mounted object store). For a native hdfs:// or s3a:// root the
manifest IO would need the Hadoop FileSystem API; that is deliberately out
of scope here — on a cluster, point ``root`` at shared POSIX storage or a
fuse mount. The DATA writes go through df.write.parquet and would work on
any Hadoop-supported scheme.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession


def _part_index(filename: str, fallback: int) -> int:
    """Partition index from Spark's ``part-NNNNN-...`` naming — the actual
    writer-task partition id, not just the file's sort position."""
    if filename.startswith("part-"):
        head = filename[len("part-"):].split("-", 1)[0]
        if head.isdigit():
            return int(head)
    return fallback


class CheckpointStore:
    def __init__(self, spark: SparkSession, root: str, backend: str = "parquet"):
        if backend not in ("parquet", "iceberg"):
            raise ValueError(f"unknown backend {backend!r}")
        if backend == "iceberg":
            # Iceberg needs its runtime jar; probe and fail fast with a clear
            # message rather than a deep ClassNotFound at write time.
            try:
                spark._jvm.java.lang.Class.forName(
                    "org.apache.iceberg.spark.source.IcebergSource"
                )
            except Exception as exc:  # pragma: no cover - jar absent in sandbox
                raise RuntimeError(
                    "iceberg backend requested but the Iceberg runtime jar is "
                    "not on the classpath; use backend='parquet'"
                ) from exc
        self.spark = spark
        self.root = root
        self.backend = backend
        os.makedirs(root, exist_ok=True)

    # -- paths -----------------------------------------------------------
    def _dir(self, name: str, it: int) -> str:
        return os.path.join(self.root, name, f"iter={it:05d}")

    def _manifest(self, name: str, it: int) -> str:
        return os.path.join(self.root, name, f"manifest-{it:05d}.json")

    # -- write / read ----------------------------------------------------
    def write(self, name: str, it: int, df: DataFrame,
              meta: Optional[dict[str, Any]] = None,
              rows: Optional[int] = None) -> DataFrame:
        """Persist iteration state; returns a fresh DataFrame reading it back
        (lineage cut). Manifest commit is atomic: tmp + rename.

        ``rows``: pass the row count when the caller already knows it (e.g.
        from its convergence aggregate) — otherwise it is read from the
        parquet footers' row-count metadata, NOT a second full scan (the
        round-1 design ran ``reread.count()`` here, a second scan of the
        state per superstep; at scale that doubles checkpoint cost)."""
        path = self._dir(name, it)
        df.write.mode("overwrite").parquet(path)
        files = sorted(
            f for f in os.listdir(path) if f.endswith(".parquet")
        )
        reread = self.spark.read.parquet(path)
        if rows is None:
            # footer metadata only: pyarrow reads num_rows without touching
            # column data (O(files), not O(rows)).
            import pyarrow.parquet as pq
            rows = sum(
                pq.ParquetFile(os.path.join(path, f)).metadata.num_rows
                for f in files
            )
        manifest = {
            "name": name,
            "iteration": it,
            "path": path,
            "rows": rows,
            "partitions": [
                {"index": _part_index(f, i), "file": f}
                for i, f in enumerate(files)
            ],
            "committed_at": time.time(),
            "meta": meta or {},
        }
        self._atomic_json(self._manifest(name, it), manifest)
        return reread

    def _atomic_json(self, dest: str, obj: dict) -> None:
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(dest), suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump(obj, f)
        os.replace(tmp, dest)

    def patch_meta(self, name: str, it: int, meta: dict[str, Any]) -> None:
        m = self._read_manifest(name, it)
        m["meta"].update(meta)
        self._atomic_json(self._manifest(name, it), m)

    def _read_manifest(self, name: str, it: int) -> dict:
        with open(self._manifest(name, it)) as f:
            return json.load(f)

    def manifest_meta(self, name: str, it: int) -> dict:
        return self._read_manifest(name, it).get("meta", {})

    def read(self, name: str, it: int) -> DataFrame:
        """State of a specific committed iteration (manifest must exist)."""
        self._read_manifest(name, it)  # raises if not committed
        return self.spark.read.parquet(self._dir(name, it))

    def latest(self, name: str) -> Optional[tuple[int, DataFrame]]:
        """(iteration, state) of the newest *committed* checkpoint, or None.
        Only manifests count — a parquet dir without its manifest is a torn
        write and is ignored."""
        d = os.path.join(self.root, name)
        if not os.path.isdir(d):
            return None
        its = sorted(
            int(f[len("manifest-"):-len(".json")])
            for f in os.listdir(d)
            if f.startswith("manifest-") and f.endswith(".json")
        )
        if not its:
            return None
        it = its[-1]
        return it, self.spark.read.parquet(self._dir(name, it))

    # -- metrics log ------------------------------------------------------
    def log_metrics(self, algo: str, row: dict[str, Any]) -> None:
        """Append one convergence-metrics row (jsonl; tiny, driver-side)."""
        with open(os.path.join(self.root, f"{algo}_metrics.jsonl"), "a") as f:
            f.write(json.dumps(row) + "\n")

    def metrics(self, algo: str) -> list[dict]:
        p = os.path.join(self.root, f"{algo}_metrics.jsonl")
        if not os.path.exists(p):
            return []
        with open(p) as f:
            return [json.loads(line) for line in f if line.strip()]
