"""k-core decomposition by iterative degree peeling.

Link-graph extension (SURVEY.md §2.9 family): the k-core of an undirected
graph is the maximal induced subgraph where every vertex has degree >= k —
the standard web/social-graph denoising primitive (drop leaf chains and
sparse fringe before community / centrality analysis).

Algorithm: repeat { compute degrees on the surviving edge set; drop
vertices with deg < k; drop edges touching a dropped vertex } until no
vertex is dropped. Each round is ONE edge-scale aggregation (groupBy over
the symmetrized survivor edges, map-side combine) plus one semi/anti join
pair to shrink the edge set — the same shrinking-working-set shape as the
star-contraction CC loop (operators/cc.py), and like it the per-round
volume is O(surviving edges), monotonically decreasing. Convergence is a
driver-side O(1) count comparison; lineage is cut every round with
localCheckpoint (rationale in operators/pagerank.py docstring).

At 100 TB: peeling rounds on web graphs are few for small k (the fringe is
shallow); the dominant cost is the first rounds' full-edge aggregations,
which are the same shuffle the degree histogram already pays. No state is
ever replicated or collected to the driver.
"""

from __future__ import annotations

import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.graph_build import symmetrize


def k_core(
    edges: DataFrame, k: int, max_iter: int = 100
) -> tuple[DataFrame, list[dict]]:
    """Returns ((vid,) survivors of the k-core, metrics). ``edges`` is an
    undirected edge table in either canonical or symmetric form (it is
    symmetrized + deduped here); isolated vertices are never in a k-core
    for k >= 1, so no vertex table is needed."""
    spark = edges.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    sym = (
        symmetrize(edges.select("src", "dst"))
        .repartition(n_part, "src")
        .localCheckpoint(eager=True)
    )
    metrics: list[dict] = []
    n_edges = sym.count()
    for it in range(max_iter):
        t0 = time.monotonic()
        # sym is symmetric, so out-degree on src IS the undirected degree
        survivors = (
            sym.groupBy("src").agg(F.count("*").alias("deg"))
            .where(F.col("deg") >= k)
            .select(F.col("src").alias("vid"))
        )
        new_sym = (
            sym.join(survivors.hint("shuffle_hash"), sym.src == survivors.vid, "left_semi")
            .repartition(n_part, "dst")
            .join(
                survivors.hint("shuffle_hash"),
                F.col("dst") == survivors.vid,
                "left_semi",
            )
            .repartition(n_part, "src")
            .localCheckpoint(eager=True)
        )
        new_edges = new_sym.count()
        dt = time.monotonic() - t0
        metrics.append(
            {"iter": it, "edges": new_edges, "sec": dt}
        )
        converged = new_edges == n_edges
        sym, n_edges = new_sym, new_edges
        if converged:
            break
    return sym.select("src").distinct().withColumnRenamed("src", "vid"), metrics
