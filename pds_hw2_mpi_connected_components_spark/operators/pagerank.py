"""Power-iteration PageRank on the *directed* edge table.

New capability mandated by the north rule (the reference computes only CC;
SURVEY.md §2.9) built on the superstep skeleton of the reference's min-label
loop (/root/reference/src/connected_components.c:103-142): one join + one
aggregation per iteration, a driver-side convergence reduction, per-iteration
materialization instead of Allgatherv replication.

Semantics: damping alpha (default 0.85), uniform teleport, dangling mass
redistributed uniformly each iteration; ranks sum to 1. Convergence on L1
delta < tol (matches the numpy dense oracle in tests to allclose 1e-6).

Shuffle budget per iteration (the 100 TB design point): exactly ONE
edge-scale shuffle — the groupBy(dst) contribution sum, with map-side
partial aggregation — and ONE action (a co-partitioned join of new vs old
ranks computing the L1 delta AND the next iteration's dangling mass in a
single pass). Enforced by tests/test_plan_audit.py. How:

- every loop-static table is a FLAT, pre-partitioned LogicalRDD:
  ``repartition(key).localCheckpoint(eager=True)``. Two measured pyspark
  4.1.2 facts drive this (see tests/test_plan_audit.py):
  1. localCheckpoint PRESERVES the child's hash partitioning (the LogicalRDD
     captures outputPartitioning), so joins/aggs on the checkpointed table
     need no exchange;
  2. ``persist()`` + CacheManager lookup is FRAGILE here: when two cached
     plans share lineage (vertices and w_edges both derive from ``edges``),
     analyzer attribute-deduplication rewrites one subtree and its cache
     lookup silently MISSES — round 1 rebuilt the weighted edge table
     (join + repartition) every single iteration because of this. Flat
     LogicalRDDs have no lineage to dedup and need no cache lookup.
- per iteration, new_ranks is materialized with
  ``repartition(n_part, "vid").localCheckpoint(eager=True)``; the
  repartition is ELIDED by the planner when the join output is already
  hash(vid, n_part) (the normal case) and only actually shuffles when AQE
  re-planned the join output, so the steady-state budget is the groupBy
  alone. (The checkpointed-durability path re-reads parquet, which is
  genuinely unpartitioned — there the vertex-scale repartition is the
  price of resumability.)
- localCheckpoint also cuts lineage every iteration (plan growth would
  otherwise OOM analysis around iteration ~30, measured round 1).
- materialized RDDs are freed by the driver GC + ContextCleaner once the
  loop drops its references — nothing stays pinned by CacheManager after
  the call returns (round 1 leaked the persisted statics).
- hub skew on dst: AQE skew handling + optional salted two-stage
  aggregation (`salt_buckets`, SURVEY.md §4 X6).
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
    """Returns ((vid, rank), metrics). ``edges`` directed (src,dst), deduped."""
    spark = edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    if vertices is None:
        vertices = (
            edges.select(F.col("src").alias("vid"))
            .union(edges.select(F.col("dst").alias("vid")))
            .distinct()
        )
    # flat + hash(vid): see module docstring for why localCheckpoint, not persist
    vertices = (
        vertices.select("vid").repartition(n_part, "vid").localCheckpoint(eager=True)
    )
    n = vertices.count()
    if n == 0:
        return vertices.select("vid", F.lit(0.0).alias("rank")), []

    out_deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    # static weighted edges: flat + hash(src), materialized once
    w_edges = (
        edges.join(out_deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("out_deg")).alias("inv_deg"))
        .repartition(n_part, "src")
        .localCheckpoint(eager=True)
    )
    # static dangling-vertex set (broadcast in the loop); flag column for the
    # combined stats pass
    dangling_v = (
        vertices.join(out_deg, vertices.vid == out_deg.src, "left_anti")
        .select("vid", F.lit(1).alias("is_dangling"))
        .localCheckpoint(eager=True)
    )
    n_dangling = dangling_v.count()

    start_iter = 0
    ranks = None
    dangling = None
    if checkpoint is not None:
        resumed = checkpoint.latest("pagerank")
        if resumed is not None:
            start_iter, ranks = resumed
            ranks = ranks.repartition(n_part, "vid").localCheckpoint(eager=True)
            start_iter += 1
    if ranks is None:
        # Project over the flat vertices: partitioning hash(vid) is preserved.
        ranks = vertices.select("vid", F.lit(1.0 / n).alias("rank"))
        dangling = n_dangling * (1.0 / n)  # uniform init: no action needed
    if dangling is None:
        dangling = (
            ranks.join(F.broadcast(dangling_v.select("vid")), "vid", "left_semi")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )

    metrics: list[dict] = []
    for it in range(start_iter, max_iter):
        t0 = time.monotonic()
        # shuffle-hash: build the hash table on the (small) ranks side; the
        # pre-partitioned flat edges stream through with no sort and no
        # exchange (A/B measured ~3x over the default sort-merge at 2M
        # vertices)
        joined = w_edges.join(ranks.hint("shuffle_hash"), w_edges.src == ranks.vid).select(
            "src", "dst", (F.col("rank") * F.col("inv_deg")).alias("w")
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
            # rows is n by construction (left join on the vertex table);
            # passing it avoids an extra scan. The parquet re-read is
            # unpartitioned: restore hash(vid) for the two consumers below.
            new_ranks = checkpoint.write("pagerank", it, new_ranks, rows=n)
            new_ranks = new_ranks.repartition(n_part, "vid").localCheckpoint(eager=True)
        else:
            # flat plan every iteration (plan growth + partitioning: see
            # module docstring). The repartition is a planner no-op while
            # the join output is already hash(vid, n_part).
            new_ranks = new_ranks.repartition(n_part, "vid").localCheckpoint(eager=True)

        # ONE action: L1 delta (convergence) + dangling mass of new_ranks
        # (needed next iteration). Both sides hash(vid): no shuffle.
        row = (
            new_ranks.alias("a")
            .join(ranks.alias("b").select("vid", F.col("rank").alias("old_rank")), "vid")
            .join(F.broadcast(dangling_v), "vid", "left")
            .agg(
                F.sum(F.abs(F.col("rank") - F.col("old_rank"))).alias("delta"),
                F.coalesce(
                    F.sum(F.when(F.col("is_dangling") == 1, F.col("rank"))), F.lit(0.0)
                ).alias("dangling"),
            )
            .collect()[0]
        )
        delta, dangling = row["delta"], row["dangling"]
        dt = time.monotonic() - t0
        metrics.append({"iter": it, "l1_delta": delta, "dangling": dangling, "sec": dt})
        if checkpoint is not None:
            checkpoint.log_metrics("pagerank", metrics[-1])
        ranks = new_ranks
        if delta < tol:
            break
    return ranks, metrics
