"""Power-iteration PageRank on the *directed* edge table.

New capability mandated by the north rule (the reference computes only CC;
SURVEY.md §2.9) built on the same superstep skeleton as the reference's
min-label loop (/root/reference/src/connected_components.c:103-142): one
join + one aggregation per iteration, a driver-side convergence reduction,
per-iteration materialization instead of Allgatherv replication.

Semantics: damping alpha (default 0.85), uniform teleport, dangling mass
redistributed uniformly each iteration; ranks sum to 1. Convergence on L1
delta < tol (matches the numpy dense oracle in tests to allclose 1e-6).

Scale notes: contributions shuffle on dst; Spark performs partial (map-side)
aggregation for the sum automatically. Hub skew on dst is handled by AQE
skew-join splitting plus an optional salted two-stage aggregation
(`salt_buckets`) for the pathological in-degree hubs of web graphs.
"""

from __future__ import annotations

import time
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.checkpoint import CheckpointStore


def pagerank(
    edges: DataFrame,
    vertices: Optional[DataFrame] = None,
    alpha: float = 0.85,
    tol: float = 1e-8,
    max_iter: int = 100,
    checkpoint: Optional[CheckpointStore] = None,
    salt_buckets: int = 0,
) -> tuple[DataFrame, list[dict]]:
    """Returns ((vid, rank), metrics). ``edges`` directed (src,dst), deduped.

    ``salt_buckets`` > 0 splits the dst-sum into (dst, salt) partial sums
    before the final (dst) sum — two-stage aggregation that spreads a hot
    reducer key over N buckets (SURVEY.md §4 X6).
    """
    spark = edges.sparkSession
    if vertices is None:
        vertices = (
            edges.select(F.col("src").alias("vid"))
            .union(edges.select(F.col("dst").alias("vid")))
            .distinct()
        )
    vertices = vertices.select("vid").localCheckpoint(eager=True)
    n = vertices.count()
    if n == 0:
        return vertices.select("vid", F.lit(0.0).alias("rank")), []

    out_deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    # (vid, out_deg) for all vertices; 0 => dangling
    deg = (
        vertices.join(out_deg, vertices.vid == out_deg.src, "left")
        .select("vid", F.coalesce("out_deg", F.lit(0)).alias("out_deg"))
        .localCheckpoint(eager=True)
    )
    edges = edges.select("src", "dst").localCheckpoint(eager=True)

    start_iter = 0
    ranks = None
    if checkpoint is not None:
        resumed = checkpoint.latest("pagerank")
        if resumed is not None:
            start_iter, ranks = resumed
            start_iter += 1
    if ranks is None:
        ranks = vertices.select("vid", F.lit(1.0 / n).alias("rank"))
        ranks = ranks.localCheckpoint(eager=True)

    metrics: list[dict] = []
    for it in range(start_iter, max_iter):
        t0 = time.monotonic()
        rd = ranks.join(deg, "vid")
        dangling = rd.where(F.col("out_deg") == 0).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0))
        ).collect()[0][0]

        contrib_src = rd.where(F.col("out_deg") > 0).select(
            "vid", (F.col("rank") / F.col("out_deg")).alias("w")
        )
        joined = edges.join(contrib_src, edges.src == contrib_src.vid).select(
            "src", "dst", "w"
        )
        if salt_buckets > 0:
            # two-stage sum: (dst, salt) partials spread a hot dst key over
            # salt_buckets reducers; salt is a deterministic function of src.
            sums = (
                joined.withColumn("salt", F.pmod(F.xxhash64("src"), F.lit(salt_buckets)))
                .groupBy("dst", "salt").agg(F.sum("w").alias("pw"))
                .groupBy("dst").agg(F.sum("pw").alias("in_w"))
            )
        else:
            sums = joined.groupBy("dst").agg(F.sum("w").alias("in_w"))

        base = (1.0 - alpha) / n + alpha * dangling / n
        new_ranks = (
            vertices.join(sums, vertices.vid == sums.dst, "left")
            .select(
                "vid",
                (F.lit(base) + F.lit(alpha) * F.coalesce("in_w", F.lit(0.0))).alias("rank"),
            )
        )
        if checkpoint is not None:
            new_ranks = checkpoint.write("pagerank", it, new_ranks)
        else:
            new_ranks = new_ranks.localCheckpoint(eager=True)

        delta = (
            new_ranks.alias("a")
            .join(ranks.alias("b"), "vid")
            .agg(F.sum(F.abs(F.col("a.rank") - F.col("b.rank"))))
            .collect()[0][0]
        )
        dt = time.monotonic() - t0
        metrics.append({"iter": it, "l1_delta": delta, "dangling": dangling, "sec": dt})
        if checkpoint is not None:
            checkpoint.log_metrics("pagerank", metrics[-1])
        ranks = new_ranks
        if delta < tol:
            break
    return ranks, metrics
