"""Physical-plan budget tests: verify the shuffle claims the operators'
docstrings make, by traversing the executed plan tree (string-matching the
formatted explain over-counts — cached/checkpointed relations can print
their build-time Exchange inline).

AQE is disabled inside these tests (and restored after): we are auditing the
static planner's EnsureRequirements behavior; AQE can only remove work on
top of it.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def _walk(plan, pred):
    """Count plan nodes whose class simple-name satisfies pred, stopping at
    InMemoryTableScan leaves (their inlined build plan ran once, at cache
    time — it is not per-query work)."""
    name = plan.getClass().getSimpleName()
    if name.startswith("InMemoryTableScan"):
        return 0
    cnt = 1 if pred(name) else 0
    ch = plan.children()
    for i in range(ch.size()):
        cnt += _walk(ch.apply(i), pred)
    return cnt


def shuffle_exchanges(df) -> int:
    """Data-scale shuffles only: ShuffleExchangeExec, NOT BroadcastExchange
    (broadcasting a tiny side is desirable, and at test scale the planner
    broadcasts relations that would shuffle-join at production scale)."""
    return _walk(
        df._jdf.queryExecution().executedPlan(),
        lambda n: n.startswith("ShuffleExchange"),
    )


def any_exchanges(df) -> int:
    return _walk(df._jdf.queryExecution().executedPlan(), lambda n: "Exchange" in n)


@pytest.fixture()
def no_aqe(spark):
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    # hermetic planning, in-suite: (a) cached relations left by earlier
    # tests make CacheManager substitute InMemoryTableScans into OUR plans;
    # (b) test_cli's get_spark(getOrCreate) resets shuffle.partitions to 32
    # on the SHARED session, so the ==1-exchange assertions (built around
    # n_part=8) see a phantom co-partitioning mismatch. Pin both.
    spark.catalog.clearCache()
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    yield spark
    spark.conf.set("spark.sql.adaptive.enabled", prev)
    spark.conf.set("spark.sql.shuffle.partitions", prev_parts)


def _pagerank_statics(spark, n_part=8):
    """Replicates operators/pagerank.py's static-state construction."""
    edges = (
        spark.range(2000)
        .select((F.col("id") % 211).alias("src"), ((F.col("id") * 7 + 3) % 211).alias("dst"))
        .where("src != dst").distinct().localCheckpoint(eager=True)
    )
    out_deg = edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    vertices = (
        edges.select(F.col("src").alias("vid"))
        .union(edges.select(F.col("dst").alias("vid")))
        .distinct().repartition(n_part, "vid").localCheckpoint(eager=True)
    )
    w_edges = (
        edges.join(out_deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("out_deg")).alias("inv_deg"))
        .repartition(n_part, "src").localCheckpoint(eager=True)
    )
    return vertices, w_edges


def _one_iteration(vertices, w_edges, ranks):
    joined = w_edges.join(ranks.hint("shuffle_hash"), w_edges.src == ranks.vid).select(
        "src", "dst", (F.col("rank") * F.col("inv_deg")).alias("w")
    )
    sums = joined.groupBy("dst").agg(F.sum("w").alias("in_w"))
    return joined, vertices.join(sums, vertices.vid == sums.dst, "left").select(
        "vid", F.coalesce("in_w", F.lit(0.0)).alias("rank")
    )


def test_pagerank_iteration_exchange_budget(no_aqe):
    """The pagerank docstring's budget: exactly ONE data shuffle per
    iteration (the groupBy(dst) partial->final aggregation). Everything
    else — the contributions join, the vertices left-join, the delta
    join — consumes the flat pre-partitioned LogicalRDDs exchange-free.
    This also guards against the round-1 cache-lookup regression where
    w_edges was silently rebuilt (join + repartition) inside every
    iteration's plan: a rebuild adds its REPARTITION_BY_NUM exchange and
    breaks the ==1 assertions below."""
    spark = no_aqe
    n_part = 8
    vertices, w_edges = _pagerank_statics(spark, n_part)

    # --- iteration 1: ranks is a projection over the flat vertices -------
    ranks0 = vertices.select("vid", F.lit(0.01).alias("rank"))
    joined, new_ranks = _one_iteration(vertices, w_edges, ranks0)
    assert any_exchanges(joined) == 0
    assert shuffle_exchanges(new_ranks) == 1

    # --- steady state: ranks materialized exactly as the loop does -------
    ranks1 = new_ranks.repartition(n_part, "vid").localCheckpoint(eager=True)
    joined, new_ranks2 = _one_iteration(vertices, w_edges, ranks1)
    assert any_exchanges(joined) == 0
    assert shuffle_exchanges(new_ranks2) == 1

    # --- delta join (new vs old ranks): no data shuffle ------------------
    nr = new_ranks2.repartition(n_part, "vid").localCheckpoint(eager=True)
    delta_join = nr.join(ranks1.select("vid", F.col("rank").alias("old_rank")), "vid").select(
        (F.col("rank") - F.col("old_rank")).alias("d")
    )
    assert shuffle_exchanges(delta_join) == 0


def test_local_checkpoint_preserves_partitioning(no_aqe):
    """The design premise, measured: in pyspark 4.1.2,
    ``repartition(k, key).localCheckpoint(eager=True)`` yields a LogicalRDD
    that RETAINS hash(key, k) output partitioning — a follow-up
    ``repartition(k, key)`` is elided and joins need no exchange. If a
    Spark upgrade breaks this, the whole one-shuffle-per-iteration budget
    silently degrades; this test makes it loud."""
    spark = no_aqe
    a = (
        spark.range(500).select(F.col("id").alias("vid"), F.lit(1.0).alias("x"))
        .repartition(8, "vid").localCheckpoint(eager=True)
    )
    b = (
        spark.range(500).select(F.col("id").alias("vid"), F.lit(2.0).alias("y"))
        .repartition(8, "vid").localCheckpoint(eager=True)
    )
    assert any_exchanges(a.join(b.hint("shuffle_hash"), "vid")) == 0
    assert shuffle_exchanges(a.groupBy("vid").agg(F.sum("x"))) == 0
    # and the elision: re-repartitioning by the same key/count adds nothing
    assert shuffle_exchanges(a.repartition(8, "vid")) == 0


def test_bucketed_edges_no_exchange(no_aqe, tmp_path):
    """A bucketBy(src) table read back must feed src-keyed aggregation and
    the PageRank-style src join with NO shuffle — write-time co-location
    replaces the per-run static-state shuffle (DESIGN_100TB.md §9)."""
    from pyspark.sql import functions as F

    from pds_hw2_mpi_connected_components_spark.plans.bucketed import (
        read_bucketed_edges,
        write_bucketed_edges,
    )

    spark = no_aqe
    edges = spark.range(5000).select(
        (F.col("id") % 97).alias("src"), ((F.col("id") * 13 + 1) % 97).alias("dst")
    )
    write_bucketed_edges(edges, "bucketed_edges_test", buckets=8)
    try:
        back = read_bucketed_edges(spark, "bucketed_edges_test")
        assert shuffle_exchanges(back.groupBy("src").agg(F.count("*"))) == 0
        ranks = (
            spark.range(97).select(F.col("id").alias("vid"), F.lit(0.1).alias("rank"))
            .repartition(8, "vid").localCheckpoint(eager=True)
        )
        j = back.join(ranks.hint("shuffle_hash"), back.src == ranks.vid)
        assert shuffle_exchanges(j) == 0
        got = {(r["src"], r["dst"]) for r in back.collect()}
        want = {(i % 97, (i * 13 + 1) % 97) for i in range(5000)}
        assert got == want
    finally:
        spark.sql("DROP TABLE IF EXISTS bucketed_edges_test")


def test_hits_iteration_exchange_budget(no_aqe):
    """The hits docstring's budget: exactly TWO data shuffles per iteration
    (groupBy(dst) for the auth half-step, groupBy(src) for the hub
    half-step — the two-matvec floor). The edge-vs-scores joins, the
    vertices left-joins, and the norm/delta aggregation are all
    exchange-free over the flat pre-partitioned statics."""
    spark = no_aqe
    n_part = 8
    edges = (
        spark.range(2000)
        .select((F.col("id") % 211).alias("src"), ((F.col("id") * 7 + 3) % 211).alias("dst"))
        .where("src != dst").distinct()
    )
    vertices = (
        edges.select(F.col("src").alias("vid"))
        .union(edges.select(F.col("dst").alias("vid")))
        .distinct().repartition(n_part, "vid").localCheckpoint(eager=True)
    )
    e_by_src = edges.select("src", "dst").repartition(n_part, "src").localCheckpoint(eager=True)
    e_by_dst = e_by_src.repartition(n_part, "dst").localCheckpoint(eager=True)
    hubs = vertices.select("vid", F.lit(0.1).alias("hub"))

    # auth half-step: ONE shuffle (the groupBy(dst) aggregation)
    a_contrib = (
        e_by_src.join(hubs.hint("shuffle_hash"), e_by_src.src == hubs.vid)
        .select("dst", (F.col("hub") * F.lit(1.0)).alias("w"))
        .groupBy("dst").agg(F.sum("w").alias("s"))
    )
    auths = vertices.join(a_contrib, vertices.vid == a_contrib.dst, "left").select(
        "vid", F.coalesce("s", F.lit(0.0)).alias("auth")
    )
    assert shuffle_exchanges(auths) == 1
    auths = auths.repartition(n_part, "vid").localCheckpoint(eager=True)

    # hub half-step: ONE shuffle (the groupBy(src) aggregation)
    h_contrib = (
        e_by_dst.join(auths.hint("shuffle_hash"), e_by_dst.dst == auths.vid)
        .select("src", (F.col("auth") * F.lit(1.0)).alias("w"))
        .groupBy("src").agg(F.sum("w").alias("s"))
    )
    new_hubs = vertices.join(h_contrib, vertices.vid == h_contrib.src, "left").select(
        "vid", F.coalesce("s", F.lit(0.0)).alias("hub")
    )
    assert shuffle_exchanges(new_hubs) == 1
    new_hubs = new_hubs.repartition(n_part, "vid").localCheckpoint(eager=True)

    # combined norm + delta action: the two co-partitioned joins add ZERO
    # shuffles; the only exchange in the whole plan is the global agg's
    # single-partition gather of per-partition partials (O(n_part) rows,
    # not data-scale — every driver-side scalar pays it).
    prev_auth = auths.select("vid", F.col("auth").alias("pa")).localCheckpoint(eager=True)
    joined2 = new_hubs.join(auths, "vid").join(prev_auth, "vid")
    assert shuffle_exchanges(joined2) == 0
    stats = joined2.agg(
        F.sqrt(F.sum(F.col("hub") * F.col("hub"))).alias("hn"),
        F.sum(F.abs(F.col("auth") - F.col("pa"))).alias("delta"),
    )
    assert shuffle_exchanges(stats) == 1  # the single-partition gather only
