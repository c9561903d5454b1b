"""HITS (hubs & authorities) power iteration on the directed edge table.

Link-analysis extension in the same family as PageRank (SURVEY.md §2.9):
the reference computes only CC (/root/reference/src/connected_components.c);
HITS reuses the superstep skeleton of operators/pagerank.py — flat
pre-partitioned statics, one materialization per half-step, driver-side
scalar reductions — for Kleinberg's mutually-recursive scores
(auth = A^T hub, hub = A auth, each L2-normalized).

Shuffle budget per iteration (the 100 TB design point): exactly TWO
edge-scale shuffles — one groupBy(dst) for the auth half-step and one
groupBy(src) for the hub half-step, both with map-side partial aggregation.
That is the information-theoretic floor for HITS (two matvecs per
iteration), the analog of PageRank's single-matvec floor. How the rest of
the plan stays off the shuffle path:

- TWO flat edge tables, hash-partitioned for their consumer: ``e_by_src``
  (joined against hubs on src, aggregated to dst) and ``e_by_dst`` (joined
  against auths on dst, aggregated to src). Built once, localCheckpoint
  (partitioning-preserving; rationale in operators/pagerank.py docstring).
- L2 norms ride the SAME action that materializes each half-step: the
  half-step output is repartition+localCheckpoint'ed (the repartition is a
  planner no-op when the join already produced hash(vid)), then a cheap
  vertex-scale agg computes ``sum(x*x)`` — the normalization is applied
  LAZILY as a literal ``* (1/norm)`` multiplier in the NEXT half-step's
  plan, so no extra pass rewrites the vector. Scores returned to the caller
  are fully normalized.
- Convergence: L1 delta of the *normalized* auth vector between iterations,
  computed in the same vertex-scale agg (co-partitioned joins add no
  shuffle; the scalar's single-partition partial-aggregate gather is
  O(n_part) rows).
- Float-op ordering is pinned for the DuckDB oracle: contributions sum raw
  products ``score * (1/norm)`` (not ``score/norm``), and the norm is
  ``sqrt(sum(x*x))`` of the *unnormalized* half-step output. The oracle in
  __spark_entry__.py mirrors these expressions token-for-token.
"""

from __future__ import annotations

import math
import time
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def hits(
    edges: DataFrame,
    vertices: Optional[DataFrame] = None,
    tol: float = 1e-8,
    max_iter: int = 50,
) -> tuple[DataFrame, list[dict]]:
    """Returns ((vid, auth, hub), metrics). ``edges`` directed, deduped.

    Vertices with no in-links get auth 0; no out-links get hub 0 (standard
    HITS semantics on the full vertex set). Both vectors are L2-normalized.
    """
    spark = edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    if vertices is None:
        vertices = (
            edges.select(F.col("src").alias("vid"))
            .union(edges.select(F.col("dst").alias("vid")))
            .distinct()
        )
    vertices = (
        vertices.select("vid").repartition(n_part, "vid").localCheckpoint(eager=True)
    )
    n = vertices.count()
    if n == 0:
        return vertices.select(
            "vid", F.lit(0.0).alias("auth"), F.lit(0.0).alias("hub")
        ), []

    e_by_src = edges.select("src", "dst").repartition(n_part, "src").localCheckpoint(
        eager=True
    )
    e_by_dst = e_by_src.repartition(n_part, "dst").localCheckpoint(eager=True)

    # hub_0 = 1 for every vertex, pre-normalized (norm = sqrt(n), exact here)
    inv = 1.0 / math.sqrt(float(n))
    hubs = vertices.select("vid", F.lit(inv).alias("hub"))
    hub_scale = 1.0  # lazy 1/||.|| multiplier for the CURRENT hubs table
    auth_scale = 1.0
    prev_auth = None  # normalized auth of the previous iteration (for delta)

    metrics: list[dict] = []
    for it in range(max_iter):
        t0 = time.monotonic()
        # ---- auth half-step: a_un = A^T (h * hub_scale) -----------------
        a_contrib = (
            e_by_src.join(hubs.hint("shuffle_hash"), e_by_src.src == hubs.vid)
            .select("dst", (F.col("hub") * F.lit(hub_scale)).alias("w"))
            .groupBy("dst")
            .agg(F.sum("w").alias("s"))
        )
        auths = (
            vertices.join(a_contrib, vertices.vid == a_contrib.dst, "left")
            .select("vid", F.coalesce("s", F.lit(0.0)).alias("auth"))
            .repartition(n_part, "vid")
            .localCheckpoint(eager=True)
        )
        a_norm = auths.agg(F.sqrt(F.sum(F.col("auth") * F.col("auth")))).collect()[0][0]
        if not a_norm or a_norm == 0.0:
            # no edges at all: auth == hub == 0 everywhere, done
            zero = vertices.select(
                "vid", F.lit(0.0).alias("auth"), F.lit(0.0).alias("hub")
            )
            metrics.append({"iter": it, "l1_delta": 0.0, "sec": time.monotonic() - t0})
            return zero, metrics
        auth_scale = 1.0 / a_norm

        # ---- hub half-step: h_un = A (a * auth_scale) -------------------
        h_contrib = (
            e_by_dst.join(auths.hint("shuffle_hash"), e_by_dst.dst == auths.vid)
            .select("src", (F.col("auth") * F.lit(auth_scale)).alias("w"))
            .groupBy("src")
            .agg(F.sum("w").alias("s"))
        )
        new_hubs = (
            vertices.join(h_contrib, vertices.vid == h_contrib.src, "left")
            .select("vid", F.coalesce("s", F.lit(0.0)).alias("hub"))
            .repartition(n_part, "vid")
            .localCheckpoint(eager=True)
        )

        # ---- one vertex-scale action: hub norm + auth L1 delta ----------
        if prev_auth is not None:
            row = (
                new_hubs.join(auths, "vid")
                .join(prev_auth.select("vid", F.col("auth").alias("pa")), "vid")
                .agg(
                    F.sqrt(F.sum(F.col("hub") * F.col("hub"))).alias("hn"),
                    F.sum(
                        F.abs(F.col("auth") * F.lit(auth_scale) - F.col("pa"))
                    ).alias("delta"),
                )
                .collect()[0]
            )
            h_norm, delta = row["hn"], row["delta"]
        else:
            h_norm = new_hubs.agg(
                F.sqrt(F.sum(F.col("hub") * F.col("hub")))
            ).collect()[0][0]
            delta = float("inf")
        hub_scale = 1.0 / h_norm if h_norm else 1.0
        hubs = new_hubs
        prev_auth = auths.select(
            "vid", (F.col("auth") * F.lit(auth_scale)).alias("auth")
        ).localCheckpoint(eager=True)
        dt = time.monotonic() - t0
        metrics.append({"iter": it, "l1_delta": delta, "sec": dt})
        if delta < tol:
            break

    out = (
        prev_auth.join(
            hubs.select("vid", (F.col("hub") * F.lit(hub_scale)).alias("hub")), "vid"
        )
        .select("vid", "auth", "hub")
    )
    return out, metrics
