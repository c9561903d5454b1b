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
from ..plans.flat import flat_checkpoint


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
    o = _oriented(edges).transform(flat_checkpoint)
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


def clustering_coefficient(edges: DataFrame) -> DataFrame:
    """Per-vertex local clustering coefficient over the undirected graph:
    2 * triangles(v) / (deg(v) * (deg(v) - 1)), 0.0 when deg(v) < 2.

    Composition of the two primitives this module/degrees already pay for:
    the oriented triangle enumeration (each triangle exploded to its three
    corners, one groupBy) and the canonical degree table. Per-vertex
    triangle counts shuffle O(3 * #triangles) rows with map-side combine;
    no new scale exposure beyond triangles_per_graph itself. Returns
    (vid, deg, tri, lcc) with lcc rounded to 8 (float-division noise floor,
    same contract as the PageRank oracle)."""
    tri = triangles_per_graph(edges)
    corners = (
        tri.select(F.col("a").alias("vid"))
        .unionAll(tri.select(F.col("b").alias("vid")))
        .unionAll(tri.select(F.col("c").alias("vid")))
    )
    tri_per_v = corners.groupBy("vid").agg(F.count("*").alias("tri"))
    canon = canonicalize(edges)
    deg = (
        canon.select(F.col("src").alias("vid"))
        .union(canon.select(F.col("dst").alias("vid")))
        .groupBy("vid")
        .agg(F.count("*").alias("deg"))
    )
    return deg.join(tri_per_v, "vid", "left").select(
        "vid",
        "deg",
        F.coalesce("tri", F.lit(0)).alias("tri"),
        F.round(
            F.when(
                F.col("deg") >= 2,
                2.0
                * F.coalesce("tri", F.lit(0))
                / (F.col("deg") * (F.col("deg") - 1)),
            ).otherwise(F.lit(0.0)),
            8,
        ).alias("lcc"),
    )
