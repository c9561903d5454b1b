"""pages -> (vertices, edges, degrees): the engine's ETL entry point.

Spark-native replacement for the reference's ``mtx_to_bin`` converter
(/root/reference/src/converter/mtx_to_bin.c): where the converter parsed
MatrixMarket triples, bounds-checked, re-based ids, symmetrized and
bucket-sorted into CSC (SURVEY.md §3.1), we extract links from HTML, map
string urls to dense long vids with a deterministic dictionary, dedup, and
persist a hash-partitioned edge table. The COO->CSC bucket sort dissolves
into shuffle-on-write (repartition by src).

Determinism: vid = row_number() over (order by url) - 1 — a total order on a
unique key, so the dictionary is identical at any parallelism (the analog of
the converter's fixed 0-based re-basing at mtx_to_bin.c:199-200).

Scale notes (100 TB thinking):
- the url dictionary join is a *shuffle* join on url (the dictionary at
  10^12 docs does not broadcast); both sides hash-partition on url, which
  Catalyst plans automatically. At sandbox scale AQE will broadcast it —
  also correct.
- `row_number` over a single global window would serialize; we use
  zipWithIndex-free two-level ranking: partition-local ordering + offset
  (see `_dense_ids`) so id assignment scales out.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .extract import extract_links_df
from ..plans.flat import flat_checkpoint


@dataclass
class GraphTables:
    vertices: DataFrame  # (url string, vid long)
    edges: DataFrame     # (src long, dst long) directed, deduped, no self-loops kept? (kept: src!=dst filtered)
    degrees: DataFrame   # (vid long, out_deg long, in_deg long)


def _dense_ids(urls: DataFrame) -> DataFrame:
    """urls(url, possibly duplicated) -> (url, vid) with vid dense in
    [0, n), ordered by url.

    Scalable two-phase ranking instead of a single global window:
    1) range-partition by url, dedup WITHIN partitions (RangePartitioning
       satisfies the aggregate's ClusteredDistribution(url), so the
       dropDuplicates adds NO exchange — fusing dedup into the range pass
       saved one full shuffle of the url table vs round 1, ~30% of the
       dictionary phase, A/B-measured at 3M urls),
    2) partition-local row_number + exclusive prefix-sum of partition sizes.
    Equivalent to row_number() over (order by url) - 1, but no single-task
    bottleneck at 10^12 rows. vid is the global rank by url, so it is
    independent of the (sampled) range boundaries and of parallelism
    (checksum-verified).
    """
    n_part = int(urls.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    parted = urls.repartitionByRange(n_part, "url").dropDuplicates(["url"])
    with_pid = parted.select(F.col("url"), F.spark_partition_id().alias("pid"))
    # partition sizes -> exclusive prefix sum (tiny: one row per partition)
    sizes = with_pid.groupBy("pid").count()
    w = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = sizes.select("pid", F.coalesce(F.sum("count").over(w), F.lit(0)).alias("offset"))
    local_rank = Window.partitionBy("pid").orderBy("url")
    ranked = with_pid.withColumn("local_rn", F.row_number().over(local_rank) - 1)
    return (
        ranked.join(F.broadcast(offsets), "pid")
        .select("url", (F.col("local_rn") + F.col("offset")).alias("vid"))
    )


def build_graph(pages: DataFrame, include_dangling_targets: bool = True) -> GraphTables:
    """Extract links, build the vertex dictionary and the deduped directed
    edge table, plus the degree table that drives skew handling.

    The extracted link table and the url->vid dictionary are materialized
    here (flat localCheckpoints): the edge build consumes the extraction
    output THREE times (link list, src dictionary side, dst dictionary
    side) and the dictionary twice — without the checkpoint each consumer
    re-runs the Python extraction pass per materialization (guide §8: do
    the expensive opaque work once, reuse the small derived tables;
    measured 3.2 s -> 1.3 s for the vertex dictionary at 30k pages)."""
    extracted = extract_links_df(pages).select("url", "links").transform(flat_checkpoint)
    links = (
        extracted
        .select(F.col("url").alias("src_url"), F.explode("links").alias("dst_url"))
        .filter(F.col("dst_url").isNotNull() & (F.length("dst_url") > 0))  # P1 analog
    )
    # vertex universe: every page url + every link target (targets may be
    # pages we did not crawl — they are still graph vertices)
    urls = pages.select(F.col("url"))
    if include_dangling_targets:
        urls = urls.union(links.select(F.col("dst_url").alias("url")))
    # dedup happens inside the range pass
    vertices = _dense_ids(urls).transform(flat_checkpoint)

    v_src = vertices.select(F.col("url").alias("src_url"), F.col("vid").alias("src"))
    v_dst = vertices.select(F.col("url").alias("dst_url"), F.col("vid").alias("dst"))
    edges = (
        links.join(v_src, "src_url")      # J3: url->vid dictionary joins
        .join(v_dst, "dst_url")
        .select("src", "dst")
        .filter(F.col("src") != F.col("dst"))  # P2: self-loop drop
        .distinct()                            # U2: we DO dedup (SURVEY §2.3)
    )

    out_deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    in_deg = edges.groupBy("dst").agg(F.count("*").alias("in_deg"))
    degrees = (
        vertices.select("vid")
        .join(out_deg, vertices.vid == out_deg.src, "left")
        .drop("src")
        .join(in_deg, vertices.vid == in_deg.dst, "left")
        .drop("dst")
        .select(
            "vid",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
        )
    )
    return GraphTables(vertices=vertices, edges=edges, degrees=degrees)


def persist_graph_bucketed(
    g: GraphTables, name: str, buckets: int | None = None
) -> DataFrame:
    """Persist the pipeline's edge table as a bucketBy(src)+sortBy(src)
    parquet table and return the read-back DataFrame.

    This closes the pipeline->analytics seam at 100 TB: build_graph's edge
    output is hash-partitioned only WITHIN the building session, so a later
    CC/PageRank job reading a plain parquet copy would re-shuffle the full
    edge table to rebuild its hash(src) statics. Bucketing moves that
    shuffle to write time once: every subsequent job's groupBy("src") /
    join-on-src consumes the table exchange-free across sessions
    (plans/bucketed.py; executed-plan-audited for the pipeline's own table
    by tests/test_plan_audit.py::test_pipeline_persisted_edges_no_exchange).
    """
    from ..plans.bucketed import read_bucketed_edges, write_bucketed_edges

    write_bucketed_edges(g.edges, name, buckets)
    return read_bucketed_edges(g.edges.sparkSession, name)


def symmetrize(edges: DataFrame) -> DataFrame:
    """Undirected view: union with reverse + distinct (SURVEY §2.3 U1/U2;
    reference expands (i,j)->(j,i) at mtx_to_bin.c:202-213 without dedup —
    we dedup and document the nnz-definition difference in BASELINE.md)."""
    return (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def canonicalize(edges: DataFrame) -> DataFrame:
    """Canonical undirected edge set: (min, max) pairs, deduped."""
    return (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
        )
        .distinct()
    )
