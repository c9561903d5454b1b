"""Degree aggregation (SURVEY.md §2.5 A5 — the reference's per-column
histogram, /root/reference/src/converter/mtx_to_bin.c:267-286, which drives
its COO->CSC bucket sort). Here it is a plain hash aggregation with
map-side partial aggregation, and it doubles as the hub detector for skew
handling (degree > threshold => salted/hub-split joins, SURVEY.md §4 X6)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degree_table(edges: DataFrame) -> DataFrame:
    """(vid, out_deg, in_deg, deg) over the directed edge table."""
    out_deg = edges.groupBy(F.col("src").alias("vid")).agg(F.count("*").alias("out_deg"))
    in_deg = edges.groupBy(F.col("dst").alias("vid")).agg(F.count("*").alias("in_deg"))
    return (
        out_deg.join(in_deg, "vid", "full")
        .select(
            "vid",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
        )
        .withColumn("deg", F.col("out_deg") + F.col("in_deg"))
    )


def hubs(edges: DataFrame, threshold: int) -> DataFrame:
    """Vertices whose total degree exceeds ``threshold`` (salting targets)."""
    return degree_table(edges).where(F.col("deg") > threshold).select("vid", "deg")
