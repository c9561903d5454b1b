"""Edge-iterator triangle counting with degree-ordered orientation.

North-rule extension (SURVEY.md §2.9). Orientation kills web-graph hub
blowup: each undirected edge is directed from its lower-degree endpoint to
its higher-degree endpoint (ties by vertex id), so every vertex's
out-neighborhood in the oriented graph is O(sqrt(m)) — wedges (2-paths) are
enumerated from the *small* side only, the standard trick that makes the
2-hop self-join feasible on power-law graphs. Each triangle is counted
exactly once (its unique cyclic orientation apex).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.graph_build import canonicalize


def _oriented(edges: DataFrame) -> DataFrame:
    """Canonical undirected edges -> degree-ordered directed edges (u -> v
    where (deg(u), u) < (deg(v), v))."""
    canon = canonicalize(edges)
    deg = (
        canon.select(F.col("src").alias("vid"))
        .union(canon.select(F.col("dst").alias("vid")))
        .groupBy("vid")
        .agg(F.count("*").alias("deg"))
    )
    e = (
        canon.join(deg.withColumnRenamed("vid", "src").withColumnRenamed("deg", "ds"), "src")
        .join(deg.withColumnRenamed("vid", "dst").withColumnRenamed("deg", "dd"), "dst")
    )
    fwd = (F.col("ds") < F.col("dd")) | (
        (F.col("ds") == F.col("dd")) & (F.col("src") < F.col("dst"))
    )
    return e.select(
        F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("u"),
        F.when(fwd, F.col("dst")).otherwise(F.col("src")).alias("v"),
    )


def triangles_per_graph(edges: DataFrame) -> DataFrame:
    """All triangles as rows (a, b, c) with a < b < c (each exactly once)."""
    o = _oriented(edges).localCheckpoint(eager=True)
    e1 = o.alias("e1")
    e2 = o.alias("e2")
    wedges = e1.join(e2, F.col("e1.u") == F.col("e2.u")).where(
        F.col("e1.v") < F.col("e2.v")
    ).select(
        F.col("e1.u").alias("apex"), F.col("e1.v").alias("x"), F.col("e2.v").alias("y")
    )
    closing = canonicalize(edges).select(
        F.col("src").alias("x"), F.col("dst").alias("y")
    )
    tri = wedges.join(closing, ["x", "y"])
    # sort the three vertex ids: middle = sum - min - max
    return tri.select(
        F.least("apex", "x", "y").alias("a"),
        (F.col("apex") + F.col("x") + F.col("y")
         - F.least("apex", "x", "y") - F.greatest("apex", "x", "y")).alias("b"),
        F.greatest("apex", "x", "y").alias("c"),
    )


def triangle_count(edges: DataFrame) -> int:
    return triangles_per_graph(edges).count()
