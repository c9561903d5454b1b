"""Synchronous label propagation (community detection).

North-rule extension (SURVEY.md §2.9) on the reference's superstep skeleton:
each superstep, every vertex adopts the most frequent label among its
neighbors, ties broken by the smaller label — a fully deterministic
tie-break, so (like the reference's min-label loop,
/root/reference/src/connected_components.c:117-123) results are identical at
any parallelism.

One superstep = join(sym_edges, labels on src) -> groupBy(dst, label).count()
-> top-1 per dst via a window ordered (count desc, label asc) -> vertices
with no neighbors keep their label. Synchronous semantics: all updates read
the *previous* iteration's labels (DataFrame immutability = the reference's
double buffering, connected_components.c:130-132).
"""

from __future__ import annotations

import time
from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..plans.checkpoint import CheckpointStore


def lp_superstep(sym_edges: DataFrame, labels: DataFrame) -> DataFrame:
    """One synchronous LP round. ``sym_edges``: (src,dst) symmetric, deduped.
    ``labels``: (vid,label). Returns new (vid,label)."""
    counted = (
        sym_edges.join(labels, sym_edges.src == labels.vid)
        .groupBy("dst", "label")
        .agg(F.count("*").alias("cnt"))
    )
    w = Window.partitionBy("dst").orderBy(F.col("cnt").desc(), F.col("label").asc())
    top1 = (
        counted.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(F.col("dst").alias("vid"), F.col("label").alias("new_label"))
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
    if vertices is None:
        vertices = (
            sym_edges.select(F.col("src").alias("vid"))
            .union(sym_edges.select(F.col("dst").alias("vid")))
            .distinct()
        )
    sym_edges = sym_edges.select("src", "dst").localCheckpoint(eager=True)

    start_iter, labels = 0, None
    if checkpoint is not None:
        resumed = checkpoint.latest("labelprop")
        if resumed is not None:
            start_iter, labels = resumed
            start_iter += 1
    if labels is None:
        labels = vertices.select("vid", F.col("vid").alias("label")).localCheckpoint(eager=True)

    metrics: list[dict] = []
    for it in range(start_iter, max_iter):
        t0 = time.monotonic()
        new_labels = lp_superstep(sym_edges, labels)
        if checkpoint is not None:
            new_labels = checkpoint.write("labelprop", it, new_labels)
        else:
            new_labels = new_labels.localCheckpoint(eager=True)
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
