"""Synchronous label propagation (community detection).

North-rule extension (SURVEY.md §2.9) on the reference's superstep skeleton:
each superstep, every vertex adopts the most frequent label among its
neighbors, ties broken by the smaller label — a fully deterministic
tie-break, so (like the reference's min-label loop,
/root/reference/src/connected_components.c:117-123) results are identical at
any parallelism.

One superstep = join(sym_edges, labels on src) -> groupBy(dst, label).count()
-> top-1 per dst via min(struct(-cnt, label)) -> vertices with no neighbors
keep their label. Synchronous semantics: all updates read the *previous*
iteration's labels (DataFrame immutability = the reference's double
buffering, connected_components.c:130-132).

Shuffle budget per superstep (same playbook as operators/pagerank.py —
flat pre-partitioned LogicalRDDs): edges are hash(src) once, labels
hash(vid) per iteration, so the gather join and the keep-own-label join are
exchange-free; the two aggregations (count per (dst,label), then min-struct
per dst — an agg with map-side partials instead of a window sort) are the
only data shuffles.
"""

from __future__ import annotations

import time
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..plans.checkpoint import CheckpointStore


def lp_superstep(sym_edges: DataFrame, labels: DataFrame) -> DataFrame:
    """One synchronous LP round. ``sym_edges``: (src,dst) symmetric, deduped.
    ``labels``: (vid,label). Returns new (vid,label)."""
    counted = (
        sym_edges.join(labels.hint("shuffle_hash"), sym_edges.src == labels.vid)
        .groupBy("dst", "label")
        .agg(F.count("*").alias("cnt"))
    )
    # top-1 per dst as an aggregation, not a window: min over the struct
    # (-cnt, label) IS (count desc, label asc) rank 1, with map-side partial
    # aggregation instead of a full per-partition sort.
    top1 = (
        counted.groupBy("dst")
        .agg(F.min(F.struct((-F.col("cnt")).alias("nc"), F.col("label"))).alias("s"))
        .select(F.col("dst").alias("vid"), F.col("s.label").alias("new_label"))
    )
    return (
        labels.join(top1, "vid", "left")
        .select("vid", F.coalesce("new_label", F.col("label")).alias("label"))
    )


def label_propagation(
    sym_edges: DataFrame,
    vertices: Optional[DataFrame] = None,
    max_iter: int = 20,
    checkpoint: Optional[CheckpointStore] = None,
) -> tuple[DataFrame, list[dict]]:
    """Run synchronous LP to convergence (no label changes) or max_iter.
    Returns ((vid,label), metrics)."""
    n_part = int(sym_edges.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    if vertices is None:
        vertices = (
            sym_edges.select(F.col("src").alias("vid"))
            .union(sym_edges.select(F.col("dst").alias("vid")))
            .distinct()
        )
    # flat + hash(src): the per-superstep gather join streams the edges with
    # no exchange (labels side is hash(vid) = the join key's partitioning)
    sym_edges = (
        sym_edges.select("src", "dst").repartition(n_part, "src").localCheckpoint(eager=True)
    )

    start_iter, labels = 0, None
    if checkpoint is not None:
        resumed = checkpoint.latest("labelprop")
        if resumed is not None:
            start_iter, labels = resumed
            labels = labels.repartition(n_part, "vid").localCheckpoint(eager=True)
            start_iter += 1
    if labels is None:
        labels = (
            vertices.select("vid", F.col("vid").alias("label"))
            .repartition(n_part, "vid")
            .localCheckpoint(eager=True)
        )

    metrics: list[dict] = []
    for it in range(start_iter, max_iter):
        t0 = time.monotonic()
        new_labels = lp_superstep(sym_edges, labels)
        if checkpoint is not None:
            new_labels = checkpoint.write("labelprop", it, new_labels)
        new_labels = new_labels.repartition(n_part, "vid").localCheckpoint(eager=True)
        changed = (
            new_labels.alias("a")
            .join(labels.alias("b"), "vid")
            .where(F.col("a.label") != F.col("b.label"))
            .count()
        )
        metrics.append({"iter": it, "changed": changed, "sec": time.monotonic() - t0})
        if checkpoint is not None:
            checkpoint.log_metrics("labelprop", metrics[-1])
        labels = new_labels
        if changed == 0:
            break
    return labels, metrics
