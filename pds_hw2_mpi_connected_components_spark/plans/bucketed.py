"""Bucketed edge-table layout: co-location that survives ACROSS runs.

Within one job, the iterative operators shuffle static state once
(repartition + localCheckpoint). Bucketing moves that one shuffle to WRITE
time: a table written with bucketBy(k, "src") + sortBy("src") is read back
already hash(src, k)-partitioned, so every subsequent job's groupBy("src") /
join-on-src consumes it exchange-free — on a 100 TB edge table that is the
difference between re-shuffling 100 TB at the start of every PageRank/CC
run and never re-shuffling it again (docs/DESIGN_100TB.md §9).

Pick ``buckets`` equal to the shuffle partition count the iterative jobs
use (spark.sql.shuffle.partitions): matching counts let EnsureRequirements
reuse the bucketing directly; pagerank's repartition(n_part, "src") is then
planner-elided.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_edges(
    edges: DataFrame, name: str, buckets: Optional[int] = None
) -> None:
    """Persist (src, dst, ...) as a parquet table bucketed+sorted by src."""
    spark = edges.sparkSession
    if buckets is None:
        buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    (
        edges.write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, "src")
        .sortBy("src")
        .saveAsTable(name)
    )


def read_bucketed_edges(spark: SparkSession, name: str) -> DataFrame:
    """Read the bucketed table; downstream src-keyed ops are exchange-free
    (asserted by tests/test_plan_audit.py::test_bucketed_edges_no_exchange)."""
    return spark.table(name)
