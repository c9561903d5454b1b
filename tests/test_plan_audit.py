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


def _hits_statics(spark, n_part=8):
    """Replicates operators/hits.py's static-state construction."""
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
    return vertices, e_by_src, e_by_dst


def test_hits_iteration_exchange_budget(no_aqe):
    """The hits docstring's budget: exactly TWO data shuffles per iteration
    (groupBy(dst) for the auth half-step, groupBy(src) for the hub
    half-step — the two-matvec floor). Audits the OPERATOR'S OWN half-step
    builders (operators/hits.auth_half_step / hub_half_step — the same
    functions hits() calls), so a plan regression inside the operator (lost
    hint, rebuilt static, extra repartition) fails here."""
    from pds_hw2_mpi_connected_components_spark.operators.hits import (
        auth_half_step,
        hub_half_step,
    )

    spark = no_aqe
    n_part = 8
    vertices, e_by_src, e_by_dst = _hits_statics(spark, n_part)
    hubs = vertices.select("vid", F.lit(0.1).alias("hub"))

    # auth half-step: ONE shuffle (the groupBy(dst) aggregation)
    auths_plan = auth_half_step(vertices, e_by_src, hubs, 1.0)
    assert shuffle_exchanges(auths_plan) == 1
    auths = auths_plan.repartition(n_part, "vid").localCheckpoint(eager=True)

    # hub half-step: ONE shuffle (the groupBy(src) aggregation)
    hub_plan = hub_half_step(vertices, e_by_dst, auths, 1.0)
    assert shuffle_exchanges(hub_plan) == 1

    # the observed-metrics variant hits() builds after iteration 1: the
    # current- and previous-auth joins feeding the norm+delta observation
    # are hash(vid)-co-partitioned, so the WHOLE iteration plan still holds
    # at the two-shuffle floor (one already spent in auths above).
    prev_auth = auths.select("vid", F.col("auth").alias("pa")).localCheckpoint(eager=True)
    observed_plan = (
        hub_plan.join(auths.hint("shuffle_hash"), "vid")
        .join(prev_auth.hint("shuffle_hash"), "vid")
        .select("vid", "hub")
    )
    assert shuffle_exchanges(observed_plan) == 1  # still just the groupBy(src)


def test_hits_jobs_per_iteration(no_aqe):
    """The round-5 driver-action budget: each hits() iteration launches
    exactly JOBS_PER_ITERATION (=2) Spark jobs — the two half-step
    localCheckpoint materializations; norms and the convergence delta ride
    those jobs as observed metrics, with no separate .collect() scalar
    actions. Measured as the job-count delta between max_iter=1 and
    max_iter=3 runs (setup jobs cancel out)."""
    from pds_hw2_mpi_connected_components_spark.operators.hits import (
        JOBS_PER_ITERATION,
        hits,
    )

    spark = no_aqe
    sc = spark.sparkContext
    edges = (
        spark.range(2000)
        .select((F.col("id") % 211).alias("src"), ((F.col("id") * 7 + 3) % 211).alias("dst"))
        .where("src != dst").distinct().localCheckpoint(eager=True)
    )

    def jobs_for(max_iter: int, group: str) -> int:
        sc.setJobGroup(group, f"hits max_iter={max_iter}")
        try:
            out, metrics = hits(edges, tol=0.0, max_iter=max_iter)
            assert len(metrics) == max_iter
        finally:
            sc.setJobGroup("hits_audit_done", "")
        return len(sc.statusTracker().getJobIdsForGroup(group))

    j1 = jobs_for(1, "hits_audit_1")
    j3 = jobs_for(3, "hits_audit_3")
    assert j3 - j1 == 2 * JOBS_PER_ITERATION


def test_hits_max_iter_guard(spark):
    """max_iter < 1 is a contract violation: loud ValueError, not an
    AttributeError from an undefined previous-iteration vector."""
    from pds_hw2_mpi_connected_components_spark.operators.hits import hits

    edges = spark.createDataFrame([(0, 1)], "src long, dst long")
    with pytest.raises(ValueError, match="max_iter"):
        hits(edges, max_iter=0)


def test_pipeline_persisted_edges_no_exchange(no_aqe):
    """Round-5 seam closure: the PIPELINE'S OWN persisted edge table (pages
    -> build_graph -> persist_graph_bucketed) must read back exchange-free
    into the iterative operators' src-keyed plans — not just a hand-made
    bucketed table (test_bucketed_edges_no_exchange). Asserts the two plan
    shapes the analytics jobs actually run: degree/out-deg aggregation and
    the PageRank-style ranks join."""
    from pds_hw2_mpi_connected_components_spark.sources.datagen import generate_pages
    from pds_hw2_mpi_connected_components_spark.sources.graph_build import (
        build_graph,
        persist_graph_bucketed,
    )

    spark = no_aqe
    pages = generate_pages(spark, 200, n_components=4, num_partitions=4)
    g = build_graph(pages)
    try:
        back = persist_graph_bucketed(g, "pipeline_bucketed_edges_test", buckets=8)
        assert shuffle_exchanges(back.groupBy("src").agg(F.count("*"))) == 0
        ranks = (
            g.vertices.select("vid", F.lit(0.1).alias("rank"))
            .repartition(8, "vid").localCheckpoint(eager=True)
        )
        j = back.join(ranks.hint("shuffle_hash"), back.src == ranks.vid)
        assert shuffle_exchanges(j) == 0
        # and the persisted rows are exactly the pipeline's edge set
        assert (
            back.select("src", "dst").exceptAll(g.edges.select("src", "dst")).count() == 0
            and g.edges.select("src", "dst").exceptAll(back.select("src", "dst")).count() == 0
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS pipeline_bucketed_edges_test")


def test_flat_checkpoint_bounds_stats_and_keeps_partitioning(spark):
    """plans/flat.flat_checkpoint (round 5): Dataset.checkpoint in pyspark
    4.1.2 carries originStats, so iterate-vs-iterate joins COMPOUND size
    estimates geometrically — by iteration ~20 the driver livelocks
    multiplying million-digit BigIntegers inside stats estimation
    (measured: a 7-vertex HITS run could not finish 40 iterations).
    Pins (a) the digit bound after 10 self-join checkpoint rounds, (b)
    that the reflection path works (no fallback RuntimeWarning), and
    (c) hash-partitioning preservation (exchange count of a co-partitioned
    join is identical to the plain localCheckpoint's)."""
    import re
    import warnings

    from pds_hw2_mpi_connected_components_spark.plans.flat import flat_checkpoint

    df = spark.createDataFrame([(i,) for i in range(8)], "vid long")

    def digits(d):
        s = d._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        return len(str(s))

    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)  # (b): no fallback
        x = flat_checkpoint(df.repartition(4, "vid"))
        base = digits(x)
        for _ in range(10):
            x = flat_checkpoint(
                x.join(x.withColumnRenamed("vid", "v2"), x.vid == F.col("v2"))
                .select("vid")
            )
        assert digits(x) == base  # (a): plain checkpoints double per round
        assert x.count() == 8

        def exchanges(mk):
            a = mk(df.repartition(4, "vid"))
            b = mk(df.repartition(4, "vid"))
            plan = (
                a.join(b.hint("shuffle_hash"), "vid")
                ._jdf.queryExecution().executedPlan().toString()
            )
            return len(re.findall(r"Exchange hashpartitioning", plan))

        # (c) — r7: stronger than the original ==plain assertion. Under AQE
        # (this suite's default session) Dataset.localCheckpoint captures
        # UnknownPartitioning, so the PLAIN checkpoint re-shuffles both
        # sides of a co-partitioned join; flat_checkpoint re-stamps the
        # repartition(n, cols) hash layout (REPARTITION_BY_NUM — AQE never
        # rewrites its partition count) and must stay exchange-free.
        assert exchanges(flat_checkpoint) == 0
        assert exchanges(flat_checkpoint) <= exchanges(
            lambda d: d.localCheckpoint(eager=True)
        )


def test_flat_checkpoint_strict_raises_on_reflection_failure(spark, monkeypatch):
    """The stats-strip fallback guards against a driver LIVELOCK, not a
    slowdown — strict mode (kwarg or $SPARK_GRAFT_FLAT_STRICT) must raise
    instead of silently reverting to the plain localCheckpoint (r5 ADVICE).
    A future-Spark LogicalRDD reshape is simulated by renaming the node
    class the helper looks for."""
    from pds_hw2_mpi_connected_components_spark.plans import flat

    df = spark.range(8)
    monkeypatch.setattr(flat, "_LOGICAL_RDD", "org.example.NotARealNode")
    with pytest.raises(RuntimeError, match="flat_checkpoint"):
        flat.flat_checkpoint(df, strict=True)
    monkeypatch.setenv("SPARK_GRAFT_FLAT_STRICT", "1")
    with pytest.raises(RuntimeError, match="flat_checkpoint"):
        flat.flat_checkpoint(df)  # strict=None -> env var
    # non-strict keeps the correctness-preserving fallback
    monkeypatch.setenv("SPARK_GRAFT_FLAT_STRICT", "0")
    assert flat.flat_checkpoint(df).count() == 8


def test_anf_jobs_per_hop(no_aqe):
    """The anf() docstring's action budget: each hop launches exactly ONE
    Spark job — the merged-mask flat-checkpoint materialization; the
    changed-count and the hop's N(h) estimate ride it as observed metrics.
    Measured as the job delta between max_hops=2 and max_hops=5 on a path
    too long to converge (setup jobs cancel out)."""
    from pds_hw2_mpi_connected_components_spark.operators.anf import anf

    spark = no_aqe
    sc = spark.sparkContext
    path = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "src long, dst long"
    ).localCheckpoint(eager=True)

    def jobs(group, max_hops):
        sc.setJobGroup(group, group)
        try:
            with pytest.warns(RuntimeWarning, match="max_hops"):
                anf(path, n_trials=4, max_hops=max_hops)
        finally:
            sc.setJobGroup("anf_audit_done", "")
        return len(sc.statusTracker().getJobIdsForGroup(group))

    assert jobs("anf_audit_5", 5) - jobs("anf_audit_2", 2) == 3


def test_scc_jobs_per_round(no_aqe):
    """The scc() docstring's action budget, executed: on a single directed
    L-cycle (forced onto the distributed path with local_threshold=0)
    EVERY inner round — trim, color (now with pointer jumping), gather —
    launches exactly ONE job (convergence scalars ride observe on the
    round's checkpoint materialization), so the job delta between two
    cycle lengths equals the metrics-round delta exactly. (r7 rewrite:
    pointer jumping makes color rounds O(log L), so the old fixed
    jobs-per-extra-vertex calibration no longer applies; the per-round
    budget — the thing worth pinning — is unchanged.)"""
    from pds_hw2_mpi_connected_components_spark.operators.scc import (
        strongly_connected_components,
    )

    spark = no_aqe
    sc = spark.sparkContext

    def jobs_and_rounds(L):
        cyc = spark.createDataFrame(
            [(i, (i + 1) % L) for i in range(L)], "src long, dst long"
        ).localCheckpoint(eager=True)
        group = f"scc_audit_{L}"
        sc.setJobGroup(group, group)
        try:
            out, metrics = strongly_connected_components(
                cyc, local_threshold=0)
            assert metrics[-1]["converged"] is True
        finally:
            sc.setJobGroup("scc_audit_done", "")
        return len(sc.statusTracker().getJobIdsForGroup(group)), len(metrics)

    j4, r4 = jobs_and_rounds(4)
    j8, r8 = jobs_and_rounds(8)
    j12, r12 = jobs_and_rounds(12)
    assert j8 - j4 == r8 - r4, (j4, r4, j8, r8)
    assert j12 - j8 == r12 - r8, (j8, r8, j12, r12)
