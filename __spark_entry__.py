"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (component-size profile of the sf0.001
document link graph: the reference's one query, "how many components", plus
per-component sizes).

``queries()`` — one entry per implemented operator (SURVEY.md §2 + the
training-data pipeline extensions). Each runs the engine's DataFrame-native
implementation.

``oracle_sql()`` — DuckDB-dialect SQL computing the same result from the
same parquet tables. Graph queries run over edge tables derived with
portable integer arithmetic (see
pds_hw2_mpi_connected_components_spark/sources/doc_edges.py) so both
engines see identical edges. Iterative queries are value-checked too:
PageRank's oracle is the fixed-iteration power method unrolled as chained
MATERIALIZED CTEs.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pds_hw2_mpi_connected_components_spark.functions.text import (
    STOPWORDS_EN,
    fingerprint_md5,
    lang_id,
    quality_score,
    stopword_hits,
    token_chars,
    token_count,
)
from pds_hw2_mpi_connected_components_spark.operators.cc import connected_components
from pds_hw2_mpi_connected_components_spark.operators.dedup import (
    MINHASH_PARAMS,
    P,
    exact_duplicates,
    jaccard_pairs,
    minhash_lsh_candidates,
    minhash_signatures,
    near_dup_clusters,
    simhash,
)
from pds_hw2_mpi_connected_components_spark.operators.degrees import degree_table
from pds_hw2_mpi_connected_components_spark.operators.labelprop import label_propagation
from pds_hw2_mpi_connected_components_spark.operators.pagerank import pagerank
from pds_hw2_mpi_connected_components_spark.operators.similarity import (
    _hyperplane,
    ann_topk_lsh,
    cosine_topk,
    embedding_near_dups,
)
from pds_hw2_mpi_connected_components_spark.operators.triangles import triangles_per_graph
from pds_hw2_mpi_connected_components_spark.sources.doc_edges import (
    EDGES_BLOCKED_SQL,
    EDGES_GLOBAL_SQL,
    SYM_BLOCKED_SQL,
    doc_edges_blocked,
    doc_edges_global,
    doc_vertices,
    load_documents,
)
from pds_hw2_mpi_connected_components_spark.sources.extract import extract_links_df
from pds_hw2_mpi_connected_components_spark.sources.graph_build import symmetrize
from pds_hw2_mpi_connected_components_spark.plans.flat import flat_checkpoint


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_documents(spark, sf_dir)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: connected components of the sf0.001 document link graph,
    returned as (label, size) — component count is the row count."""
    sf = "/root/testdata/sf0.001"
    edges = doc_edges_global(spark, sf).transform(flat_checkpoint)
    labels, _ = connected_components(edges, vertices=doc_vertices(spark, sf))
    return (
        labels.groupBy("label")
        .agg(F.count("*").alias("size"))
        .orderBy(F.desc("size"), F.asc("label"))
    )


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _q_cc_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    labels, _ = connected_components(
        doc_edges_blocked(spark, sf_dir), vertices=doc_vertices(spark, sf_dir)
    )
    return labels.select("vid", "label")


def _q_cc_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    labels, _ = connected_components(
        doc_edges_blocked(spark, sf_dir), vertices=doc_vertices(spark, sf_dir)
    )
    return labels.agg(F.countDistinct("label").alias("n_components"))


def _q_cc_labels_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Third CC execution mode (frontier-broadcast gather-scatter,
    operators/frontier.py) against the SAME label truth as
    cc_labels_blocked — threshold forces broadcast rounds after round 0 so
    the Arrow gather-scatter path is what the driver actually checks."""
    from pds_hw2_mpi_connected_components_spark.operators.frontier import (
        connected_components_frontier,
    )

    labels, _ = connected_components_frontier(
        doc_edges_blocked(spark, sf_dir),
        vertices=doc_vertices(spark, sf_dir),
        broadcast_threshold=10**9,
    )
    return labels.select("vid", "label")


def _q_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    return degree_table(doc_edges_global(spark, sf_dir))


def _q_symmetrize(spark: SparkSession, sf_dir: str) -> DataFrame:
    return symmetrize(doc_edges_blocked(spark, sf_dir))


def _q_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return triangles_per_graph(doc_edges_blocked(spark, sf_dir))


def _q_labelprop2(spark: SparkSession, sf_dir: str) -> DataFrame:
    sym = symmetrize(doc_edges_blocked(spark, sf_dir))
    labels, _ = label_propagation(sym, vertices=doc_vertices(spark, sf_dir), max_iter=2)
    return labels.select("vid", "label")


def _q_mtx_cc_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MatrixMarket roundtrip as a value-checked query: blocked doc
    edges -> symmetric .mtx file -> read_mtx (banner/comment/1-based/
    symmetric-expansion contract) -> connected components. The oracle is the
    same recursive-CTE component count as cc_count_blocked — any loss or
    corruption in the file roundtrip changes the count."""
    import tempfile

    from pds_hw2_mpi_connected_components_spark.sources.graph_io import (
        read_mtx,
        write_mtx,
    )

    import os

    docs_n = _docs(spark, sf_dir).count()
    fd, path = tempfile.mkstemp(suffix=".mtx", prefix="mtx_cc_")
    os.close(fd)
    try:
        write_mtx(doc_edges_blocked(spark, sf_dir), docs_n, path)
        # read_mtx materializes eagerly and connected_components checkpoints,
        # so the file is fully consumed before the finally-unlink runs.
        edges, _header = read_mtx(spark, path)
        labels, _ = connected_components(
            edges.transform(flat_checkpoint), vertices=doc_vertices(spark, sf_dir)
        )
    finally:
        os.unlink(path)
    return labels.agg(F.countDistinct("label").alias("n_components"))


def _q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal feature extraction value-checked end to end: the
    deterministic fake-rgb8 media table (pure integer arithmetic — so DuckDB
    can regenerate payload bytes exactly) through the batch-vectorized
    histogram featurizer, exploded to (media_id, idx, val_r). The oracle
    mirrors the float pipeline: integer counts -> exact float64 norm ->
    float32 quantization -> round(4)."""
    from pds_hw2_mpi_connected_components_spark.sources.multimodal import (
        extract_features,
        synth_media,
    )

    media = synth_media(spark, 64)
    feats = extract_features(media, n_bins=16)
    return feats.select(
        "media_id", F.posexplode("feature").alias("idx", "v")
    ).select("media_id", "idx", F.round(F.col("v").cast("double"), 4).alias("val_r"))


_PR_ITERS = 40  # fixed iteration count shared by the Spark query and the oracle


def _q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    # tol=0.0: exactly _PR_ITERS iterations, so the DuckDB oracle (the same
    # power method unrolled as chained CTEs) computes the identical value
    # sequence; round(8) absorbs float summation-order noise (~1e-14).
    ranks, _ = pagerank(
        doc_edges_global(spark, sf_dir),
        vertices=doc_vertices(spark, sf_dir),
        tol=0.0,
        max_iter=_PR_ITERS,
    )
    return ranks.select("vid", F.round("rank", 8).alias("rank_r"))


def _pagerank_oracle_sql(k: int = _PR_ITERS, alpha: float = 0.85) -> str:
    """Fixed-k power iteration unrolled as chained CTEs (plain ANSI SQL —
    no recursive-CTE aggregation restrictions). Mirrors operators/pagerank.py
    float-op-for-float-op: rank * (1.0/out_deg) (NOT rank/out_deg, which
    rounds differently), and base = ((1-a)/n + a*dang/n) + a*contrib with
    Python's left-associative evaluation order."""
    a = f"CAST({alpha!r} AS DOUBLE)"
    one = "CAST(1.0 AS DOUBLE)"
    # AS MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and the
    # r{i} chain references each level several times — inlining expands the
    # plan exponentially (observed: "Too many open files" from thousands of
    # re-opened parquet scans at k=40).
    parts = [f"""WITH e AS MATERIALIZED ({EDGES_GLOBAL_SQL}),
 deg AS MATERIALIZED (SELECT src, {one} / count(*) AS inv_deg FROM e GROUP BY src),
 v AS MATERIALIZED (SELECT doc_id AS vid FROM documents),
 nn AS MATERIALIZED (SELECT count(*) AS n FROM documents),
 r0 AS MATERIALIZED (SELECT vid, {one} / (SELECT n FROM nn) AS rank FROM v)"""]
    for i in range(k):
        parts.append(f""",
 d{i} AS MATERIALIZED (SELECT coalesce(sum(r.rank), CAST(0.0 AS DOUBLE)) AS dang
          FROM r{i} r LEFT JOIN deg ON r.vid = deg.src WHERE deg.src IS NULL),
 c{i} AS MATERIALIZED (SELECT e.dst AS vid, sum(r.rank * deg.inv_deg) AS contrib
          FROM r{i} r JOIN e ON e.src = r.vid JOIN deg ON deg.src = e.src
          GROUP BY e.dst),
 r{i + 1} AS MATERIALIZED (SELECT v.vid,
        (({one} - {a}) / (SELECT n FROM nn) + {a} * (SELECT dang FROM d{i}) / (SELECT n FROM nn))
        + {a} * coalesce(c.contrib, CAST(0.0 AS DOUBLE)) AS rank
        FROM v LEFT JOIN c{i} c ON v.vid = c.vid)""")
    parts.append(f"\nSELECT vid, round(rank, 8) AS rank_r FROM r{k}")
    return "".join(parts)


_PPR_ITERS = 20   # fixed iteration count shared by the Spark query and the oracle
_PPR_SEEDS = 64   # seed set: the global graph's hub documents (doc_id < 64)


def _q_ppr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Personalized PageRank (operators/pagerank.pagerank(reset=...)) seeded
    at the global graph's hub documents: teleport + dangling mass land on
    the seeds. tol=0.0 pins exactly _PPR_ITERS iterations so the unrolled
    DuckDB oracle computes the identical value sequence; round(8) absorbs
    summation-order noise."""
    seeds = doc_vertices(spark, sf_dir).where(F.col("vid") < _PPR_SEEDS)
    ranks, _ = pagerank(
        doc_edges_global(spark, sf_dir),
        vertices=doc_vertices(spark, sf_dir),
        tol=0.0,
        max_iter=_PPR_ITERS,
        reset=seeds,
    )
    return ranks.select("vid", F.round("rank", 8).alias("rank_r"))


def _ppr_oracle_sql(k: int = _PPR_ITERS, alpha: float = 0.85) -> str:
    """Seeded power iteration unrolled as chained CTEs; mirrors the seeded
    branch of operators/pagerank.py float-op-for-float-op:
    ((1-a) + a*dang) * p + a*contrib with p uniform over the seeds."""
    a = f"CAST({alpha!r} AS DOUBLE)"
    one = "CAST(1.0 AS DOUBLE)"
    parts = [f"""WITH e AS MATERIALIZED ({EDGES_GLOBAL_SQL}),
 deg AS MATERIALIZED (SELECT src, {one} / count(*) AS inv_deg FROM e GROUP BY src),
 ns AS MATERIALIZED (SELECT count(*) AS n FROM documents WHERE doc_id < {_PPR_SEEDS}),
 p AS MATERIALIZED (SELECT doc_id AS vid,
        CASE WHEN doc_id < {_PPR_SEEDS} THEN {one} / (SELECT n FROM ns)
             ELSE CAST(0.0 AS DOUBLE) END AS p
        FROM documents),
 r0 AS MATERIALIZED (SELECT vid, p AS rank FROM p)"""]
    for i in range(k):
        parts.append(f""",
 d{i} AS MATERIALIZED (SELECT coalesce(sum(r.rank), CAST(0.0 AS DOUBLE)) AS dang
          FROM r{i} r LEFT JOIN deg ON r.vid = deg.src WHERE deg.src IS NULL),
 c{i} AS MATERIALIZED (SELECT e.dst AS vid, sum(r.rank * deg.inv_deg) AS contrib
          FROM r{i} r JOIN e ON e.src = r.vid JOIN deg ON deg.src = e.src
          GROUP BY e.dst),
 r{i + 1} AS MATERIALIZED (SELECT p.vid,
        (({one} - {a}) + {a} * (SELECT dang FROM d{i})) * p.p
        + {a} * coalesce(c.contrib, CAST(0.0 AS DOUBLE)) AS rank
        FROM p LEFT JOIN c{i} c ON p.vid = c.vid)""")
    parts.append(f"\nSELECT vid, round(rank, 8) AS rank_r FROM r{k}")
    return "".join(parts)


_HITS_ITERS = 15  # fixed iteration count shared by the Spark query and the oracle


def _q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS hubs/authorities on the global doc graph; tol=0.0 pins exactly
    _HITS_ITERS iterations so the unrolled-CTE oracle computes the identical
    float sequence (same contract as pagerank_global); round(8) absorbs
    summation-order noise."""
    from pds_hw2_mpi_connected_components_spark.operators.hits import hits

    scores, _ = hits(
        doc_edges_global(spark, sf_dir),
        vertices=doc_vertices(spark, sf_dir),
        tol=0.0,
        max_iter=_HITS_ITERS,
    )
    return scores.select(
        "vid",
        F.round("auth", 8).alias("auth_r"),
        F.round("hub", 8).alias("hub_r"),
    )


def _hits_oracle_sql(k: int = _HITS_ITERS) -> str:
    """HITS power iteration unrolled as chained MATERIALIZED CTEs, mirroring
    operators/hits.py float-op-for-float-op: contributions sum
    score * (1/norm) (the lazy scale multiplier), norms are
    sqrt(sum(x*x)) of the UNNORMALIZED half-step output, h0 = 1/sqrt(n)."""
    zero = "CAST(0.0 AS DOUBLE)"
    one = "CAST(1.0 AS DOUBLE)"
    parts = [f"""WITH e AS MATERIALIZED ({EDGES_GLOBAL_SQL}),
 v AS MATERIALIZED (SELECT doc_id AS vid FROM documents),
 nn AS MATERIALIZED (SELECT count(*) AS n FROM documents),
 h0 AS MATERIALIZED (SELECT vid,
     {one} / sqrt(CAST((SELECT n FROM nn) AS DOUBLE)) AS hub FROM v),
 sh0 AS MATERIALIZED (SELECT {one} AS s)"""]
    for i in range(1, k + 1):
        parts.append(f""",
 a{i} AS MATERIALIZED (SELECT v.vid, coalesce(c.s, {zero}) AS auth
     FROM v LEFT JOIN (
       SELECT e.dst AS vid, sum(h.hub * (SELECT s FROM sh{i - 1})) AS s
       FROM e JOIN h{i - 1} h ON h.vid = e.src GROUP BY e.dst) c
     ON v.vid = c.vid),
 sa{i} AS MATERIALIZED (SELECT {one} / sqrt(sum(auth * auth)) AS s FROM a{i}),
 h{i} AS MATERIALIZED (SELECT v.vid, coalesce(c.s, {zero}) AS hub
     FROM v LEFT JOIN (
       SELECT e.src AS vid, sum(a.auth * (SELECT s FROM sa{i})) AS s
       FROM e JOIN a{i} a ON a.vid = e.dst GROUP BY e.src) c
     ON v.vid = c.vid),
 sh{i} AS MATERIALIZED (SELECT {one} / sqrt(sum(hub * hub)) AS s FROM h{i})""")
    parts.append(f"""
 SELECT a.vid, round(a.auth * (SELECT s FROM sa{k}), 8) AS auth_r,
        round(h.hub * (SELECT s FROM sh{k}), 8) AS hub_r
 FROM a{k} a JOIN h{k} h ON a.vid = h.vid""")
    return "".join(parts)


def _q_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vertex local clustering coefficient on the blocked doc graph
    (triangles are block-local, so the DuckDB 3-way-join oracle stays
    cheap at sf=0.01)."""
    from pds_hw2_mpi_connected_components_spark.operators.triangles import (
        clustering_coefficient,
    )

    return clustering_coefficient(doc_edges_blocked(spark, sf_dir))


_KCORE_K = 3
_KCORE_LEVELS = 18  # unroll depth; peel depth <= block size (16) on this graph


def _q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vertices of the 3-core of the blocked doc graph, computed as a FILTER
    of the full core decomposition (k-core == {v : coreness(v) >= k}) — so
    the driver checks the decomposition's consistency with the standalone
    peel oracle below; operators/kcore.k_core itself is oracle-checked in
    tests/test_linkstats.py (python peel + equality with this filter). The
    Spark side peels to a FIXPOINT; the oracle unrolls _KCORE_LEVELS peel
    rounds — peeling is monotone, so any unroll depth >= the fixpoint depth
    gives the same set (depth <= 16 here: each non-converged 16-doc block
    loses >= 1 vertex per round)."""
    from pds_hw2_mpi_connected_components_spark.operators.kcore import coreness

    out, _ = coreness(doc_edges_blocked(spark, sf_dir))
    return out.where(F.col("coreness") >= _KCORE_K).select("vid")


_CORENESS_T = 15   # blocked graph: 16-doc blocks => max degree (and coreness) <= 15
_CORENESS_R = 17   # peel depth per threshold <= 16 (>= 1 removal/round per block)


def _q_coreness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full core decomposition of the blocked doc graph: (vid, coreness) for
    every document (isolated docs -> 0). Spark side: the delta-peeling
    operators/kcore.coreness; oracle: nested unrolled peel — the t-core is
    computed from the (t-1)-core's edges (cores are nested), _CORENESS_R
    rounds per threshold (idempotent once converged), coreness = max level
    whose survivor set contains the vertex."""
    from pds_hw2_mpi_connected_components_spark.operators.kcore import coreness

    out, _ = coreness(
        doc_edges_blocked(spark, sf_dir), vertices=doc_vertices(spark, sf_dir)
    )
    return out


def _q_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS hop distance (operators/paths.bfs_hops) over the
    undirected blocked doc graph, seeded at every block-leader document
    (doc_id % 16 == 0): (vid, hops) for every reachable vertex. Hops are
    bounded by 15 (components live inside 16-doc blocks), so the DuckDB
    recursive-CTE oracle terminates at depth 16."""
    from pds_hw2_mpi_connected_components_spark.operators.paths import bfs_hops

    seeds = doc_vertices(spark, sf_dir).where(F.col("vid") % 16 == 0)
    out, _ = bfs_hops(doc_edges_blocked(spark, sf_dir), seeds)
    return out


def _q_scc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strongly connected components of the DIRECTED blocked doc graph
    (operators/scc.py, round 6): (vid, scc) with scc = the min vid of the
    component (isolated docs -> own vid). The blocked graph confines
    reachability to 16-doc blocks, so the oracle's transitive closure is
    tiny: reach = recursive closure of the directed edges; mutual(v,u) iff
    reach(v,u) AND reach(u,v) (v==u included exactly when v lies on a
    cycle); scc(v) = min mutual partner, else v itself."""
    from pds_hw2_mpi_connected_components_spark.operators.scc import (
        strongly_connected_components,
    )

    out, _ = strongly_connected_components(
        doc_edges_blocked(spark, sf_dir), vertices=doc_vertices(spark, sf_dir)
    )
    return out


def _q_bowtie(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broder bowtie decomposition of the DIRECTED blocked doc graph
    (operators/bowtie.py, round 6): (vid, region, core) with region in
    CORE/IN/OUT/TUBE/TENDRIL/DISC relative to the LARGEST SCC (ties ->
    smallest label). The blocked graph confines reachability to 16-doc
    blocks, so exactly one block's giant SCC is the core and every other
    block is DISC — a degenerate but fully deterministic bowtie that
    exercises all six region paths; the oracle recomputes the taxonomy
    from the recursive reach closure."""
    from pds_hw2_mpi_connected_components_spark.operators.bowtie import bowtie

    out, _ = bowtie(
        doc_edges_blocked(spark, sf_dir), vertices=doc_vertices(spark, sf_dir)
    )
    return out


_ANF_TRIALS = 8
_ANF_HOPS = 16  # >= any block's diameter (blocks are 16 docs), so the
#                 operator's early-stop + pad and the oracle's full unroll
#                 land on identical fixpoint rows


def _q_anf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate neighborhood function of the DIRECTED blocked doc graph
    (operators/anf.py, round 6): exactly _ANF_HOPS+1 rows (hop, n_est),
    n_est = the Flajolet-Martin estimate of #pairs within <= hop arcs.
    The sketch hash is deterministic and SQL-expressible on both engines
    (operator module docstring), so the oracle replays the EXACT masks —
    a full value oracle for an approximate operator."""
    from pds_hw2_mpi_connected_components_spark.operators.anf import anf

    out, _ = anf(
        doc_edges_blocked(spark, sf_dir),
        vertices=doc_vertices(spark, sf_dir),
        n_trials=_ANF_TRIALS,
        max_hops=_ANF_HOPS,
        directed=True,
    )
    return out


def _q_eff_diameter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated 90%-effective diameter of the blocked doc graph from
    the ANF curve (operators/anf.py effective_diameter — the standard ANF
    summary statistic): ONE row (eff_diameter double). The curve collect
    is O(max_hops) scalars; the interpolation is arithmetic on two
    bracketing doubles, identical on both engines."""
    from pds_hw2_mpi_connected_components_spark.operators.anf import (
        anf,
        effective_diameter,
    )

    curve_df, _ = anf(
        doc_edges_blocked(spark, sf_dir),
        vertices=doc_vertices(spark, sf_dir),
        n_trials=_ANF_TRIALS,
        max_hops=_ANF_HOPS,
        directed=True,
    )
    curve = [v for _, v in sorted((r["hop"], r["n_est"])
                                  for r in curve_df.collect())]
    return spark.createDataFrame(
        [(float(effective_diameter(curve, q=0.9)),)], "eff_diameter double"
    )


def _eff_diameter_oracle_sql() -> str:
    """SQL twin of operators/anf.py effective_diameter over the anf
    oracle's curve: target = 0.9 * N(max_hop); answer 0 when hop 0
    already meets it, else linear interpolation at the first crossing
    (the curve is monotone by construction — masks only gain bits)."""
    return f"""
        WITH curve AS ({_anf_oracle_sql()}),
        tgt AS (
            SELECT 0.9 * (SELECT n_est FROM curve WHERE hop = {_ANF_HOPS})
                   AS t
        ),
        x AS (
            SELECT hop, n_est,
                   lag(n_est) OVER (ORDER BY hop) AS prev
            FROM curve
        )
        SELECT CASE
            WHEN (SELECT n_est FROM curve WHERE hop = 0) >= (SELECT t FROM tgt)
                THEN 0.0
            ELSE (
                SELECT round(hop - 1 + ((SELECT t FROM tgt) - prev)
                                       / (n_est - prev), 6)
                FROM x
                WHERE n_est >= (SELECT t FROM tgt)
                  AND prev < (SELECT t FROM tgt)
                ORDER BY hop LIMIT 1
            )
        END AS eff_diameter
    """


def _anf_oracle_sql(n_trials: int = _ANF_TRIALS, hops: int = _ANF_HOPS) -> str:
    """DuckDB twin of operators/anf.py's sketch recursion, unrolled for
    ``hops`` rounds (the _coreness_oracle_sql pattern): masks live as
    (vid, t, m) rows, each round is self UNION ALL neighbor-gather ->
    bit_or GROUP BY, and each round's N(h) estimate is emitted as one
    (hop, n_est) row. DuckDB spells XOR as xor() and Spark as ^; all
    other bit ops are shared syntax."""
    x = f"(xor(d.doc_id % 2147483648, t.t * 12582917 + 2654435769) & 2147483647)"
    y = f"(({x} * 2654435761) >> 16) & 2147483647"
    z = f"((({y}) * 1597334677) >> 16) & 2147483647"
    b = (f"(CASE WHEN ({z}) = 0 THEN 30 "
         f"ELSE least(30, cast(round(log2(({z}) & -({z}))) as bigint)) END)")
    lzb = "cast(round(log2((~m) & (m + 1))) as bigint)"
    parts = [f"""WITH e AS MATERIALIZED ({EDGES_BLOCKED_SQL}),
 m0 AS MATERIALIZED (
   SELECT d.doc_id AS vid, t.t AS t, (1::BIGINT << {b}) AS m
   FROM documents d, (SELECT unnest(range({n_trials})) AS t) t
 )"""]
    for i in range(1, hops + 1):
        parts.append(f""" m{i} AS MATERIALIZED (
   SELECT vid, t, bit_or(m) AS m FROM (
     SELECT vid, t, m FROM m{i - 1}
     UNION ALL
     SELECT e.src AS vid, g.t, g.m FROM e JOIN m{i - 1} g ON g.vid = e.dst
   ) GROUP BY vid, t
 )""")
    ests = []
    for i in range(hops + 1):
        ests.append(f""" est{i} AS (
   SELECT {i}::BIGINT AS hop, round(sum(pow(2.0, mb) / 0.77351), 6) AS n_est
   FROM (
     SELECT vid, avg({lzb}) AS mb FROM m{i} GROUP BY vid
   )
 )""")
    union = "\n UNION ALL\n".join(f" SELECT hop, n_est FROM est{i}"
                                  for i in range(hops + 1))
    return ",\n".join(parts + ests) + "\n" + union


def _coreness_oracle_sql(t_max: int = _CORENESS_T, rounds: int = _CORENESS_R) -> str:
    parts = [f"""WITH e AS MATERIALIZED ({EDGES_BLOCKED_SQL}),
 c1 AS MATERIALIZED (
   SELECT src, dst FROM (SELECT src, dst FROM e
                         UNION SELECT dst AS src, src AS dst FROM e) z
   WHERE src <> dst)"""]
    # threshold 1 removes nobody from an edge-derived vertex set: the 1-core
    # edge table IS the symmetrized graph. Higher cores peel the previous
    # level's survivors (t-core is a subgraph of the (t-1)-core).
    level_final = {1: "c1"}
    last = "c1"
    for t in range(2, t_max + 1):
        for r in range(1, rounds + 1):
            parts.append(f""",
 v{t}_{r} AS MATERIALIZED (SELECT src AS vid FROM {last}
     GROUP BY src HAVING count(*) >= {t}),
 c{t}_{r} AS MATERIALIZED (SELECT x.src, x.dst FROM {last} x
     JOIN v{t}_{r} a ON x.src = a.vid JOIN v{t}_{r} b ON x.dst = b.vid)""")
            last = f"c{t}_{r}"
        level_final[t] = last
    union = "\n   UNION ALL ".join(
        f"SELECT DISTINCT src AS vid, {t} AS t FROM {tbl}"
        for t, tbl in level_final.items()
    )
    parts.append(f""",
 levels AS MATERIALIZED ({union})
 SELECT d.doc_id AS vid, CAST(coalesce(max(l.t), 0) AS BIGINT) AS coreness
 FROM documents d LEFT JOIN levels l ON l.vid = d.doc_id
 GROUP BY d.doc_id""")
    return "".join(parts)


def _kcore_oracle_sql(k: int = _KCORE_K, levels: int = _KCORE_LEVELS) -> str:
    parts = [f"""WITH e AS MATERIALIZED ({EDGES_BLOCKED_SQL}),
 s0 AS MATERIALIZED (
   SELECT src, dst FROM (SELECT src, dst FROM e
                         UNION SELECT dst AS src, src AS dst FROM e) z
   WHERE src <> dst)"""]
    for i in range(1, levels + 1):
        parts.append(f""",
 v{i} AS MATERIALIZED (SELECT src AS vid FROM s{i - 1}
     GROUP BY src HAVING count(*) >= {k}),
 s{i} AS MATERIALIZED (SELECT t.src, t.dst FROM s{i - 1} t
     JOIN v{i} a ON t.src = a.vid JOIN v{i} b ON t.dst = b.vid)""")
    parts.append(f"\n SELECT DISTINCT src AS vid FROM s{levels}")
    return "".join(parts)


def _q_extract_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-identical extraction check runnable against a SQL oracle: build
    HTML deterministically from the documents table, run the real
    mapInPandas extractor, compare the extracted text."""
    docs = _docs(spark, sf_dir)
    pages = docs.select(
        F.col("doc_id").cast("string").alias("url"),
        F.encode(
            F.concat(
                F.lit("<html><head><title>Doc "),
                F.col("doc_id").cast("string"),
                F.lit("</title></head><body><p>"),
                F.coalesce(F.col("text"), F.lit("")),
                F.lit("</p></body></html>"),
            ),
            "utf-8",
        ).alias("html"),
    )
    out = extract_links_df(pages)
    return out.select(F.col("url").cast("long").alias("doc_id"), F.col("text").alias("text_out"))


def _q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_duplicates(_docs(spark, sf_dir))


_JACCARD_MAX_DF = 100  # document-frequency cutoff, mirrored in the oracle


def _q_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return jaccard_pairs(
        _docs(spark, sf_dir), threshold=0.5, block_col="source", max_df=_JACCARD_MAX_DF
    )


def _q_jaccard_ngram2(spark: SparkSession, sf_dir: str) -> DataFrame:
    # word-2-gram shingle Jaccard; shingle df is naturally low (max 46 at
    # sf0.01) so no max_df cutoff is needed here
    return jaccard_pairs(_docs(spark, sf_dir), threshold=0.1, block_col="source", ngram=2)


def _q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pds_hw2_mpi_connected_components_spark.functions.text import (
        token_count,
        token_count_regex,
    )

    d = _docs(spark, sf_dir)
    t = F.coalesce(F.col("text"), F.lit(""))
    return d.select(
        "doc_id",
        token_count(t).alias("n_ws"),
        token_count_regex(t).alias("n_bpe"),
    )


def _q_minhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_signatures(_docs(spark, sf_dir))


def _q_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_lsh_candidates(_docs(spark, sf_dir), rows_per_band=2)


def _q_near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite dedup pipeline: LSH candidates -> exact-Jaccard verify ->
    connected components over the verified pair graph (operators/dedup.
    near_dup_clusters) — transitively-closed near-dup cluster per doc."""
    return near_dup_clusters(_docs(spark, sf_dir), threshold=0.8)


def _q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash(_docs(spark, sf_dir), bits=16)


def _q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    t = F.coalesce(F.col("text"), F.lit(""))
    return docs.select(
        "doc_id",
        token_count(t).alias("n_tokens"),
        token_chars(t).alias("tok_chars"),
        stopword_hits(t).alias("sw_hits"),
        quality_score(t).alias("quality_r"),
        lang_id(t).alias("lang_guess"),
    )


def _q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 5).select(F.col("vec_id").alias("id"), "embedding")
    c = emb.select(F.col("vec_id").alias("id"), "embedding")
    return cosine_topk(q, c, k=10)


def _q_ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 5).select("vec_id")
    # n_planes=6 => 64 buckets over 500 vecs: queries really get bucket-mates
    return ann_topk_lsh(emb, q, k=10, n_planes=6, seed=7)


def _q_ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pds_hw2_mpi_connected_components_spark.operators.similarity import ann_topk_ivf

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 5).select("vec_id")
    return ann_topk_ivf(emb, q, k=10, n_centroids=16, nprobe=2)


def _q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    # testdata embeddings are near-random (max cosine ~0.46): threshold 0.3
    # exercises bucketing + scoring + threshold on non-empty output
    return embedding_near_dups(emb, threshold=0.3, n_planes=6, seed=7)


def _lsh_bucket_sql(n_planes: int = 6, seed: int = 7, dim: int = 64) -> str:
    """DuckDB CTE text computing the same sign-LSH bucket as
    operators/similarity.lsh_signatures: the deterministic ±1 hyperplanes are
    emitted as literals (same _hyperplane arithmetic, evaluated here), the
    per-(id, plane) dot is a sum of w * component products. Assumes the
    testdata embedding dim (64, all sfs — asserted by the Spark side reading
    the same table)."""
    planes = _hyperplane(dim, n_planes, seed)
    vals = ", ".join(
        f"({p}, {d}, CAST({planes[p, d]:.1f} AS DOUBLE))"
        for p in range(n_planes) for d in range(dim)
    )
    return f"""
        planes(plane, dim_i, w) AS (VALUES {vals}),
        emb AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        comp AS (SELECT emb.id, p.plane, sum(p.w * emb.e[p.dim_i + 1]) AS dot
                 FROM emb CROSS JOIN planes p GROUP BY emb.id, p.plane),
        sig AS (SELECT id, CAST(sum(CASE WHEN dot > 0 THEN (CAST(1 AS BIGINT) << plane)
                                         ELSE 0 END) AS BIGINT) AS bucket
                FROM comp GROUP BY id),
        based AS (SELECT emb.id, emb.e, sig.bucket FROM emb JOIN sig USING (id))
    """


def _q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


def _q_orders_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w).cast("long"))
        .where(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.round("o_totalprice", 2).alias("price_r"), "rn")
    )


def _q_nation_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = spark.read.parquet(f"{sf_dir}/customer.parquet")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count("*").alias("n_cust"), F.round(F.sum("c_acctbal"), 2).alias("acctbal_r"))
    )


def _q_events_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    ws = (F.floor(F.unix_timestamp("ts") / 300) * 300).cast("long")
    return (
        ev.groupBy(ws.alias("ws"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("value_r"))
    )


def _q_events_tumbling_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME tumbling aggregation as events_tumbling, but computed by a
    real Structured Streaming query (file source, micro-batches, memory
    sink, complete mode) — so stream/batch parity is a driver-checked value
    contract, not just a pytest. Oracle: identical SQL to events_tumbling."""
    import shutil
    import tempfile
    import uuid

    from pds_hw2_mpi_connected_components_spark.streaming.events import (
        read_events_stream,
        run_stream_to_memory,
        tumbling_counts_stream,
    )

    src_dir = tempfile.mkdtemp(prefix="events_stream_")
    # FileStreamSource needs a directory; sf events.parquet is a single file
    shutil.copy(f"{sf_dir}/events.parquet", f"{src_dir}/part-0.parquet")
    stream = tumbling_counts_stream(read_events_stream(spark, src_dir))
    name = f"ev_tumbling_{uuid.uuid4().hex[:8]}"
    # complete mode: every window emitted regardless of watermark close, so
    # the bounded stream's final table equals the batch aggregation exactly
    q = run_stream_to_memory(stream, name, mode="complete")
    q.stop()
    out = spark.table(name)
    return out.select(
        F.unix_timestamp("window_start").cast("long").alias("ws"),
        "event_type",
        "n",
        F.round("value_sum", 2).alias("value_r"),
    )


def _q_events_dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked streaming dedup (streaming/events.dedup_stream): first
    arrival per (user_id, event_type, 5-min window) survives, re-deliveries
    drop. Output projects only the key columns, so the bounded stream's
    result is order-independent and equals the batch DISTINCT the oracle
    computes — a driver-checked value contract for streaming dedup state."""
    import shutil
    import tempfile
    import uuid

    from pds_hw2_mpi_connected_components_spark.streaming.events import (
        dedup_stream,
        read_events_stream,
        run_stream_to_memory,
    )

    src_dir = tempfile.mkdtemp(prefix="events_dedup_stream_")
    shutil.copy(f"{sf_dir}/events.parquet", f"{src_dir}/part-0.parquet")
    stream = dedup_stream(read_events_stream(spark, src_dir))
    name = f"ev_dedup_{uuid.uuid4().hex[:8]}"
    # append mode: dedup emits each first-seen key immediately — no
    # watermark close needed for a bounded replay
    q = run_stream_to_memory(stream, name, mode="append")
    q.stop()
    out = spark.table(name)
    return out.select(
        F.unix_timestamp("window_start").cast("long").alias("ws"),
        "user_id",
        "event_type",
    )


def _q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    return (
        ev.withColumn("new_sess", F.when(gap.isNull() | (gap > 1800), 1).otherwise(0))
        .groupBy("user_id")
        .agg(F.sum("new_sess").cast("long").alias("n_sessions"))
    )


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def _q_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (priority, status) — grouping-set aggregation the reference
    lacks (SURVEY.md §2.5 note). Null grouping keys coalesced to 'ALL' so the
    oracle comparison is null-free."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        o.cube("o_orderpriority", "o_orderstatus")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total_r"))
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("prio"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n", "total_r",
        )
    )


def _q_pivot_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot event_type into per-user count columns (fixed value list)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = (
        ev.groupBy("user_id").pivot("event_type", _EVENT_TYPES).count().na.fill(0)
    )
    return out.select("user_id", *[F.col(t).cast("long").alias(f"n_{t}") for t in _EVENT_TYPES])


def _q_hopping_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding (hopping) window: width 10 min, slide 5 min — each event lands
    in 2 windows. Window start reported as epoch seconds (BIGINT)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = F.window("ts", "10 minutes", "5 minutes")
    return (
        ev.groupBy(w.alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.unix_timestamp(F.col("w.start")).cast("long").alias("ws"),
            "event_type", "n",
        )
    )


def _q_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) per group — distinct aggregation (absent in the
    reference, SURVEY.md §2.5)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "cc_labels_blocked": _q_cc_labels,
        "cc_count_blocked": _q_cc_count,
        "mtx_cc_count": _q_mtx_cc_count,
        "cc_labels_frontier": _q_cc_labels_frontier,
        "degrees_global": _q_degrees,
        "symmetrize_blocked": _q_symmetrize,
        "triangles_blocked": _q_triangles,
        "labelprop2_blocked": _q_labelprop2,
        "pagerank_global": _q_pagerank,
        "ppr_hubs_global": _q_ppr,
        "hits_global": _q_hits,
        "clustering_coeff": _q_clustering,
        "kcore3_blocked": _q_kcore,
        "coreness_blocked": _q_coreness,
        "bfs_hops_blocked": _q_bfs_hops,
        "scc_blocked": _q_scc,
        "bowtie_blocked": _q_bowtie,
        "anf_blocked": _q_anf,
        "eff_diameter_blocked": _q_eff_diameter,
        "extract_text": _q_extract_text,
        "dedup_exact": _q_dedup_exact,
        "jaccard_pairs": _q_jaccard,
        "jaccard_ngram2": _q_jaccard_ngram2,
        "token_counts": _q_token_counts,
        "minhash_signatures": _q_minhash_sig,
        "minhash_lsh_candidates": _q_minhash_lsh,
        "near_dup_clusters": _q_near_dup_clusters,
        "simhash16": _q_simhash,
        "text_stats": _q_text_stats,
        "ann_topk": _q_ann_topk,
        "ann_topk_lsh": _q_ann_topk_lsh,
        "ann_topk_ivf": _q_ann_topk_ivf,
        "embedding_near_dups": _q_embedding_near_dups,
        "tpch_q1": _q_tpch_q1,
        "orders_top3": _q_orders_top3,
        "nation_rollup": _q_nation_rollup,
        "media_features": _q_media_features,
        "events_tumbling": _q_events_tumbling,
        "events_tumbling_stream": _q_events_tumbling_stream,
        "events_dedup_stream": _q_events_dedup_stream,
        "events_sessionize": _q_events_sessionize,
        "cube_orders": _q_cube_orders,
        "pivot_events": _q_pivot_events,
        "hopping_events": _q_hopping_events,
        "distinct_agg": _q_distinct_agg,
    }


# ---------------------------------------------------------------------------
# oracle SQL (DuckDB dialect; tables pre-registered as views)
# ---------------------------------------------------------------------------

_TOKS_SQL = """
  SELECT DISTINCT id, tok FROM (
    SELECT doc_id AS id, unnest(string_split(coalesce(text, ''), ' ')) AS tok
    FROM documents
  ) z WHERE tok <> ''
"""

_TOKH_SQL = f"""
  SELECT id, CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) % {P} AS h
  FROM ({_TOKS_SQL}) toks
"""

_MINHASH_PARAMS_SQL = ", ".join(f"({i}, {a}, {b})" for i, (a, b) in enumerate(MINHASH_PARAMS))

_MINHASH_SIG_SQL = f"""
  SELECT id, CAST(p.i AS INTEGER) AS i, min((p.a * th.h + p.b) % {P}) AS mh
  FROM ({_TOKH_SQL}) th CROSS JOIN (VALUES {_MINHASH_PARAMS_SQL}) AS p(i, a, b)
  GROUP BY 1, 2
"""

def _sw_hits_sql(expr: str) -> str:
    """Sum of ' <stopword> ' occurrence counts for a SQL string expression —
    mirrors functions.text.stopword_hits exactly."""
    return " + ".join(
        f"CAST((length({expr}) - length(replace({expr}, ' {w} ', ''))) / {len(w) + 2} AS BIGINT)"
        for w in STOPWORDS_EN
    )


def oracle_sql() -> dict[str, str]:
    return {
        "cc_labels_blocked": f"""
            WITH RECURSIVE e AS ({EDGES_BLOCKED_SQL}),
            sym AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
            walk(v, m) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT s.dst, w.m FROM walk w JOIN sym s ON s.src = w.v
            )
            SELECT v AS vid, min(m) AS label FROM walk GROUP BY v
        """,
        # same truth as cc_labels_blocked, computed by the frontier-broadcast
        # execution mode on the Spark side
        "cc_labels_frontier": f"""
            WITH RECURSIVE e AS ({EDGES_BLOCKED_SQL}),
            sym AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
            walk(v, m) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT s.dst, w.m FROM walk w JOIN sym s ON s.src = w.v
            )
            SELECT v AS vid, min(m) AS label FROM walk GROUP BY v
        """,
        "cc_count_blocked": f"""
            WITH RECURSIVE e AS ({EDGES_BLOCKED_SQL}),
            sym AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
            walk(v, m) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT s.dst, w.m FROM walk w JOIN sym s ON s.src = w.v
            )
            SELECT count(DISTINCT label) AS n_components
            FROM (SELECT v, min(m) AS label FROM walk GROUP BY v) z
        """,
        # same truth as cc_count_blocked: the Spark side roundtrips the edge
        # set through a MatrixMarket file first, so a parity failure here
        # isolates the file-format path.
        "mtx_cc_count": f"""
            WITH RECURSIVE e AS ({EDGES_BLOCKED_SQL}),
            sym AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
            walk(v, m) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT s.dst, w.m FROM walk w JOIN sym s ON s.src = w.v
            )
            SELECT count(DISTINCT label) AS n_components
            FROM (SELECT v, min(m) AS label FROM walk GROUP BY v) z
        """,
        "degrees_global": f"""
            WITH e AS ({EDGES_GLOBAL_SQL}),
            o AS (SELECT src AS vid, count(*) AS out_deg FROM e GROUP BY 1),
            i AS (SELECT dst AS vid, count(*) AS in_deg FROM e GROUP BY 1)
            SELECT coalesce(o.vid, i.vid) AS vid,
                   coalesce(out_deg, 0) AS out_deg,
                   coalesce(in_deg, 0) AS in_deg,
                   coalesce(out_deg, 0) + coalesce(in_deg, 0) AS deg
            FROM o FULL OUTER JOIN i ON o.vid = i.vid
        """,
        "symmetrize_blocked": SYM_BLOCKED_SQL,
        "triangles_blocked": f"""
            WITH e AS ({EDGES_BLOCKED_SQL}),
            c AS (SELECT DISTINCT least(src, dst) AS x, greatest(src, dst) AS y
                  FROM e WHERE src <> dst)
            SELECT e1.x AS a, e1.y AS b, e2.y AS c
            FROM c e1 JOIN c e2 ON e1.x = e2.x AND e1.y < e2.y
            JOIN c e3 ON e3.x = e1.y AND e3.y = e2.y
        """,
        "labelprop2_blocked": f"""
            WITH e AS ({SYM_BLOCKED_SQL}),
            v AS (SELECT doc_id AS vid FROM documents),
            l0 AS (SELECT vid, vid AS label FROM v),
            c1 AS (SELECT e.dst AS vid, l.label AS label, count(*) AS cnt
                   FROM e JOIN l0 l ON e.src = l.vid GROUP BY 1, 2),
            t1 AS (SELECT vid, label FROM (
                     SELECT vid, label,
                            row_number() OVER (PARTITION BY vid ORDER BY cnt DESC, label ASC) AS rn
                     FROM c1) z WHERE rn = 1),
            l1 AS (SELECT v.vid, coalesce(t1.label, v.vid) AS label
                   FROM v LEFT JOIN t1 ON v.vid = t1.vid),
            c2 AS (SELECT e.dst AS vid, l.label AS label, count(*) AS cnt
                   FROM e JOIN l1 l ON e.src = l.vid GROUP BY 1, 2),
            t2 AS (SELECT vid, label FROM (
                     SELECT vid, label,
                            row_number() OVER (PARTITION BY vid ORDER BY cnt DESC, label ASC) AS rn
                     FROM c2) z WHERE rn = 1)
            SELECT v.vid AS vid, coalesce(t2.label, l1.label) AS label
            FROM v LEFT JOIN l1 ON v.vid = l1.vid LEFT JOIN t2 ON v.vid = t2.vid
        """,
        "pagerank_global": _pagerank_oracle_sql(),
        "ppr_hubs_global": _ppr_oracle_sql(),
        "hits_global": _hits_oracle_sql(),
        "clustering_coeff": f"""
            WITH e AS MATERIALIZED ({EDGES_BLOCKED_SQL}),
            c AS MATERIALIZED (
              SELECT DISTINCT least(src, dst) AS x, greatest(src, dst) AS y
              FROM e WHERE src <> dst),
            tri AS MATERIALIZED (
              SELECT e1.x AS a, e1.y AS b, e2.y AS c3
              FROM c e1 JOIN c e2 ON e1.x = e2.x AND e1.y < e2.y
              JOIN c e3 ON e3.x = e1.y AND e3.y = e2.y),
            corners AS (SELECT a AS vid FROM tri
                        UNION ALL SELECT b FROM tri
                        UNION ALL SELECT c3 FROM tri),
            tv AS (SELECT vid, count(*) AS tri FROM corners GROUP BY vid),
            deg AS (SELECT vid, count(*) AS deg FROM (
                      SELECT x AS vid FROM c UNION ALL SELECT y FROM c) z
                    GROUP BY vid)
            SELECT d.vid, d.deg, coalesce(tv.tri, 0) AS tri,
                   round(CASE WHEN d.deg >= 2
                              THEN CAST(2.0 AS DOUBLE) * coalesce(tv.tri, 0)
                                   / (d.deg * (d.deg - 1))
                              ELSE CAST(0.0 AS DOUBLE) END, 8) AS lcc
            FROM deg d LEFT JOIN tv ON d.vid = tv.vid
        """,
        "kcore3_blocked": _kcore_oracle_sql(),
        "coreness_blocked": _coreness_oracle_sql(),
        # multi-source BFS: min hop distance from the block-leader seeds;
        # depth-bounded at 16 (components are confined to 16-doc blocks) so
        # the recursion terminates despite cycles
        "bfs_hops_blocked": f"""
            WITH RECURSIVE e AS ({EDGES_BLOCKED_SQL}),
            sym AS (SELECT src, dst FROM e UNION SELECT dst, src FROM e),
            walk(v, h) AS (
                SELECT doc_id, CAST(0 AS BIGINT) FROM documents
                WHERE doc_id % 16 = 0
                UNION
                SELECT s.dst, w.h + 1 FROM walk w JOIN sym s ON s.src = w.v
                WHERE w.h < 16
            )
            SELECT v AS vid, min(h) AS hops FROM walk GROUP BY v
        """,
        # SCC: transitive closure (block-confined, so tiny), mutual
        # reachability, component label = min mutual partner (v itself is a
        # mutual partner exactly when v lies on a cycle), else v
        "scc_blocked": f"""
            WITH RECURSIVE e AS ({EDGES_BLOCKED_SQL}),
            reach(a, b) AS (
                SELECT src, dst FROM e
                UNION
                SELECT r.a, e2.dst FROM reach r JOIN e e2 ON e2.src = r.b
            ),
            mutual AS (
                SELECT r1.a AS v, r1.b AS u
                FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a
            )
            SELECT d.doc_id AS vid,
                   coalesce(min(m.u), d.doc_id) AS scc
            FROM documents d LEFT JOIN mutual m ON m.v = d.doc_id
            GROUP BY d.doc_id
        """,
        # Bowtie: same reach closure; scc labels as in scc_blocked; core =
        # largest SCC (ties -> min label); IN/OUT = backward/forward reach
        # of the core; weak = undirected closure from the core; TUBE =
        # leftover weak members on an IN->OUT bypass; remaining weak
        # members TENDRIL; everything else DISC — mirrors
        # operators/bowtie.py's precedence exactly.
        "bowtie_blocked": f"""
            WITH RECURSIVE e AS ({EDGES_BLOCKED_SQL}),
            reach(a, b) AS (
                SELECT src, dst FROM e
                UNION
                SELECT r.a, e2.dst FROM reach r JOIN e e2 ON e2.src = r.b
            ),
            ue AS (SELECT * FROM
                (SELECT src, dst FROM e UNION SELECT dst, src FROM e)),
            wreach(a, b) AS (
                SELECT src, dst FROM ue
                UNION
                SELECT w.a, u.dst FROM wreach w JOIN ue u ON u.src = w.b
            ),
            scc AS (
                SELECT d.doc_id AS vid, coalesce(min(m.u), d.doc_id) AS scc
                FROM documents d LEFT JOIN (
                    SELECT r1.a AS v, r1.b AS u
                    FROM reach r1 JOIN reach r2
                      ON r1.a = r2.b AND r1.b = r2.a
                ) m ON m.v = d.doc_id
                GROUP BY d.doc_id
            ),
            core_pick AS (
                SELECT scc FROM (
                    SELECT scc, count(*) AS c FROM scc GROUP BY scc
                ) ORDER BY c DESC, scc ASC LIMIT 1
            ),
            core AS (
                SELECT vid FROM scc
                WHERE scc = (SELECT scc FROM core_pick)
            ),
            fwd AS (SELECT * FROM (
                SELECT vid FROM core
                UNION
                SELECT r.b FROM reach r JOIN core c ON r.a = c.vid
            )),
            bwd AS (SELECT * FROM (
                SELECT vid FROM core
                UNION
                SELECT r.a FROM reach r JOIN core c ON r.b = c.vid
            )),
            weak AS (SELECT * FROM (
                SELECT vid FROM core
                UNION
                SELECT w.b FROM wreach w JOIN core c ON w.a = c.vid
            )),
            in_set AS (
                SELECT b.vid FROM bwd b
                LEFT JOIN core c ON c.vid = b.vid WHERE c.vid IS NULL
            ),
            out_set AS (
                SELECT f.vid FROM fwd f
                LEFT JOIN core c ON c.vid = f.vid WHERE c.vid IS NULL
            ),
            from_in AS (SELECT * FROM (
                SELECT vid FROM in_set
                UNION
                SELECT r.b FROM reach r JOIN in_set i ON r.a = i.vid
            )),
            to_out AS (SELECT * FROM (
                SELECT vid FROM out_set
                UNION
                SELECT r.a FROM reach r JOIN out_set o ON r.b = o.vid
            ))
            SELECT d.doc_id AS vid,
                   CASE WHEN c.vid IS NOT NULL THEN 'CORE'
                        WHEN i.vid IS NOT NULL THEN 'IN'
                        WHEN o.vid IS NOT NULL THEN 'OUT'
                        WHEN w.vid IS NULL THEN 'DISC'
                        WHEN fi.vid IS NOT NULL AND t.vid IS NOT NULL
                             THEN 'TUBE'
                        ELSE 'TENDRIL' END AS region,
                   (SELECT scc FROM core_pick) AS core
            FROM documents d
            LEFT JOIN core c ON c.vid = d.doc_id
            LEFT JOIN in_set i ON i.vid = d.doc_id
            LEFT JOIN out_set o ON o.vid = d.doc_id
            LEFT JOIN weak w ON w.vid = d.doc_id
            LEFT JOIN from_in fi ON fi.vid = d.doc_id
            LEFT JOIN to_out t ON t.vid = d.doc_id
        """,
        "anf_blocked": _anf_oracle_sql(),
        "eff_diameter_blocked": _eff_diameter_oracle_sql(),
        "extract_text": r"""
            SELECT doc_id,
                   trim('Doc ' || CAST(doc_id AS VARCHAR) || ' ' ||
                        regexp_replace(trim(coalesce(text, '')), '\s+', ' ', 'g')) AS text_out
            FROM documents
        """,
        "dedup_exact": """
            SELECT md5(trim(coalesce(text, ''))) AS text_hash,
                   count(*) AS n_docs, min(doc_id) AS min_doc
            FROM documents GROUP BY 1
        """,
        "jaccard_pairs": f"""
            WITH toks0 AS ({_TOKS_SQL}),
            dfreq AS (SELECT tok FROM toks0 GROUP BY tok HAVING count(*) <= {_JACCARD_MAX_DF}),
            toks AS (SELECT t.id, t.tok FROM toks0 t JOIN dfreq USING (tok)),
            tb AS (SELECT t.id, t.tok, d.source AS blk
                   FROM toks t JOIN documents d ON t.id = d.doc_id),
            sizes AS (SELECT id, count(*) AS sz FROM toks GROUP BY id),
            pairs AS (
                SELECT x.id AS a, y.id AS b, count(*) AS inter
                FROM tb x JOIN tb y ON x.tok = y.tok AND x.blk = y.blk AND x.id < y.id
                GROUP BY 1, 2
            )
            SELECT a, b,
                   round(CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE), 4) AS jac_r
            FROM pairs JOIN sizes sa ON pairs.a = sa.id JOIN sizes sb ON pairs.b = sb.id
            WHERE round(CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE), 4) >= 0.5
        """,
        "jaccard_ngram2": """
            WITH toks AS (
              SELECT DISTINCT id, tok FROM (
                SELECT doc_id AS id,
                       unnest(list_transform(generate_series(1, greatest(len(t) - 1, 0)),
                              i -> array_to_string(t[i:i+1], ' '))) AS tok
                FROM (SELECT doc_id,
                             list_filter(string_split(coalesce(text, ''), ' '), x -> x <> '') AS t
                      FROM documents) z ) y
            ),
            tb AS (SELECT t.id, t.tok, d.source AS blk
                   FROM toks t JOIN documents d ON t.id = d.doc_id),
            sizes AS (SELECT id, count(*) AS sz FROM toks GROUP BY id),
            pairs AS (
                SELECT x.id AS a, y.id AS b, count(*) AS inter
                FROM tb x JOIN tb y ON x.tok = y.tok AND x.blk = y.blk AND x.id < y.id
                GROUP BY 1, 2
            )
            SELECT a, b,
                   round(CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE), 4) AS jac_r
            FROM pairs JOIN sizes sa ON pairs.a = sa.id JOIN sizes sb ON pairs.b = sb.id
            WHERE round(CAST(inter AS DOUBLE) / CAST(sa.sz + sb.sz - inter AS DOUBLE), 4) >= 0.1
        """,
        "token_counts": r"""
            SELECT doc_id,
                   CAST(len(list_filter(string_split(coalesce(text, ''), ' '), x -> x <> '')) AS BIGINT) AS n_ws,
                   CAST(len(regexp_extract_all(coalesce(text, ''), '\w+|[^\w\s]')) AS BIGINT) AS n_bpe
            FROM documents
        """,
        "minhash_signatures": _MINHASH_SIG_SQL,
        "minhash_lsh_candidates": f"""
            WITH sig AS ({_MINHASH_SIG_SQL}),
            bands AS (
                SELECT id, CAST(i // 2 AS INTEGER) AS band,
                       string_agg(CAST(i AS VARCHAR) || ':' || CAST(mh AS VARCHAR), ','
                                  ORDER BY CAST(i AS VARCHAR) || ':' || CAST(mh AS VARCHAR)) AS bkey
                FROM sig GROUP BY 1, 2
            ),
            -- hot-bucket guard parity: drop band buckets > max_bucket
            -- (operators/dedup.cap_hot_buckets default 10000)
            kept AS (
                SELECT id, band, bkey FROM (
                    SELECT id, band, bkey,
                           count(*) OVER (PARTITION BY band, bkey) AS bsz
                    FROM bands
                ) z WHERE bsz <= 10000
            )
            SELECT DISTINCT x.id AS a, y.id AS b
            FROM kept x JOIN kept y
              ON x.band = y.band AND x.bkey = y.bkey AND x.id < y.id
        """,
        # composite dedup pipeline: the same LSH-candidate CTEs as
        # minhash_lsh_candidates, exact-Jaccard verification on candidate
        # pairs only, then the recursive min-walk (same closure as the cc_*
        # oracles) over the verified pair graph
        "near_dup_clusters": f"""
            WITH RECURSIVE sig AS MATERIALIZED ({_MINHASH_SIG_SQL}),
            bands AS MATERIALIZED (
                SELECT id, CAST(i // 2 AS INTEGER) AS band,
                       string_agg(CAST(i AS VARCHAR) || ':' || CAST(mh AS VARCHAR), ','
                                  ORDER BY CAST(i AS VARCHAR) || ':' || CAST(mh AS VARCHAR)) AS bkey
                FROM sig GROUP BY 1, 2
            ),
            kept AS MATERIALIZED (
                SELECT id, band, bkey FROM (
                    SELECT id, band, bkey,
                           count(*) OVER (PARTITION BY band, bkey) AS bsz
                    FROM bands
                ) z WHERE bsz <= 10000
            ),
            cands AS MATERIALIZED (
                SELECT DISTINCT x.id AS a, y.id AS b
                FROM kept x JOIN kept y
                  ON x.band = y.band AND x.bkey = y.bkey AND x.id < y.id
            ),
            toks AS MATERIALIZED ({_TOKS_SQL}),
            sizes AS MATERIALIZED (SELECT id, count(*) AS sz FROM toks GROUP BY id),
            pinter AS MATERIALIZED (
                SELECT c.a, c.b, count(*) AS inter
                FROM cands c
                JOIN toks ta ON ta.id = c.a
                JOIN toks tb ON tb.id = c.b AND tb.tok = ta.tok
                GROUP BY 1, 2
            ),
            verified AS MATERIALIZED (
                SELECT p.a AS src, p.b AS dst
                FROM pinter p
                JOIN sizes sa ON p.a = sa.id JOIN sizes sb ON p.b = sb.id
                WHERE round(CAST(p.inter AS DOUBLE)
                            / CAST(sa.sz + sb.sz - p.inter AS DOUBLE), 4) >= 0.8
            ),
            sym AS MATERIALIZED (
                SELECT src, dst FROM verified UNION SELECT dst, src FROM verified
            ),
            walk(v, m) AS (
                SELECT doc_id, doc_id FROM documents
                UNION
                SELECT s.dst, w.m FROM walk w JOIN sym s ON s.src = w.v
            )
            SELECT v AS id, min(m) AS cluster FROM walk GROUP BY v
        """,
        "simhash16": f"""
            WITH th AS ({_TOKH_SQL}),
            bits AS (SELECT * FROM (VALUES {", ".join(f"({b})" for b in range(16))}) AS b(bit)),
            contrib AS (
                SELECT id, bit,
                       CAST(sum(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS tot
                FROM th CROSS JOIN bits GROUP BY 1, 2
            )
            SELECT id, CAST(sum(CASE WHEN tot > 0 THEN (CAST(1 AS BIGINT) << bit) ELSE 0 END) AS BIGINT) AS simhash
            FROM contrib GROUP BY id
        """,
        "text_stats": f"""
            SELECT doc_id,
                   CAST(len(list_filter(string_split(coalesce(text, ''), ' '), x -> x <> '')) AS BIGINT) AS n_tokens,
                   CAST(length(replace(coalesce(text, ''), ' ', '')) AS BIGINT) AS tok_chars,
                   sw_hits,
                   round(least(1.0, CASE WHEN n_tokens > 0 THEN CAST(sw_hits AS DOUBLE) / n_tokens ELSE 0.0 END * 5.0
                               + CASE WHEN n_tokens BETWEEN 10 AND 10000 THEN 0.5 ELSE 0.0 END), 4) AS quality_r,
                   CASE WHEN sw_hits > 0 THEN 'en' ELSE 'unknown' END AS lang_guess
            FROM (
                SELECT doc_id, text,
                       CAST(len(list_filter(string_split(coalesce(text, ''), ' '), x -> x <> '')) AS BIGINT) AS n_tokens,
                       {_sw_hits_sql("coalesce(text, '')")} AS sw_hits
                FROM documents
            ) z
        """,
        "ann_topk": """
            WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
                       FROM embeddings WHERE vec_id < 5),
            c AS (SELECT vec_id AS neighbor_id, CAST(embedding AS DOUBLE[]) AS ce FROM embeddings),
            s AS (SELECT query_id, neighbor_id,
                         round(list_cosine_similarity(qe, ce), 4) AS sim_r
                  FROM q CROSS JOIN c),
            r AS (SELECT query_id, neighbor_id, sim_r,
                         CAST(row_number() OVER (PARTITION BY query_id
                              ORDER BY sim_r DESC, neighbor_id ASC) AS BIGINT) AS rank
                  FROM s)
            SELECT query_id, neighbor_id, rank, sim_r FROM r WHERE rank <= 10
        """,
        "ann_topk_lsh": f"""
            WITH {_lsh_bucket_sql()},
            q AS (SELECT id AS qid, e AS qe, bucket FROM based WHERE id < 5),
            s AS (SELECT q.qid AS query_id, c.id AS neighbor_id,
                         round(list_cosine_similarity(q.qe, c.e), 4) AS sim_r
                  FROM q JOIN based c ON q.bucket = c.bucket),
            r AS (SELECT query_id, neighbor_id, sim_r,
                         CAST(row_number() OVER (PARTITION BY query_id
                              ORDER BY sim_r DESC, neighbor_id ASC) AS BIGINT) AS rank
                  FROM s)
            SELECT query_id, neighbor_id, sim_r, rank FROM r WHERE rank <= 10
        """,
        "ann_topk_ivf": """
            WITH emb AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
            cents AS (SELECT id AS cid, e AS centroid FROM emb ORDER BY id LIMIT 16),
            ascore AS (SELECT emb.id, c.cid,
                              round(list_cosine_similarity(emb.e, c.centroid), 6) AS sim
                       FROM emb CROSS JOIN cents c),
            assign AS (SELECT id, cid FROM (
                           SELECT id, cid,
                                  row_number() OVER (PARTITION BY id
                                       ORDER BY sim DESC, cid ASC) AS rn
                           FROM ascore) z WHERE rn = 1),
            probes AS (SELECT id AS qid, cid FROM (
                           SELECT id, cid,
                                  row_number() OVER (PARTITION BY id
                                       ORDER BY sim DESC, cid ASC) AS rn
                           FROM ascore WHERE id < 5) z WHERE rn <= 2),
            s AS (SELECT p.qid AS query_id, b.id AS neighbor_id,
                         round(list_cosine_similarity(q.e, b.e), 4) AS sim_r
                  FROM probes p
                  JOIN emb q ON q.id = p.qid
                  JOIN assign a ON a.cid = p.cid
                  JOIN emb b ON b.id = a.id),
            r AS (SELECT query_id, neighbor_id, sim_r,
                         CAST(row_number() OVER (PARTITION BY query_id
                              ORDER BY sim_r DESC, neighbor_id ASC) AS BIGINT) AS rank
                  FROM s)
            SELECT query_id, neighbor_id, sim_r, rank FROM r WHERE rank <= 10
        """,
        "embedding_near_dups": f"""
            WITH {_lsh_bucket_sql()},
            -- hot-bucket guard parity (cap_hot_buckets default 10000)
            kept AS (
                SELECT id, e, bucket FROM (
                    SELECT id, e, bucket,
                           count(*) OVER (PARTITION BY bucket) AS bsz
                    FROM based
                ) z WHERE bsz <= 10000
            )
            SELECT x.id AS a, y.id AS b,
                   round(list_cosine_similarity(x.e, y.e), 4) AS sim_r
            FROM kept x JOIN kept y ON x.bucket = y.bucket AND x.id < y.id
            WHERE round(list_cosine_similarity(x.e, y.e), 4) >= 0.3
        """,
        "tpch_q1": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 4) AS avg_qty,
                   count(*) AS count_order
            FROM lineitem GROUP BY 1, 2
        """,
        "orders_top3": """
            SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS price_r,
                   CAST(rn AS BIGINT) AS rn
            FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
                FROM orders
            ) z WHERE rn <= 3
        """,
        "nation_rollup": """
            SELECT r_name, n_name, count(*) AS n_cust,
                   round(sum(c_acctbal), 2) AS acctbal_r
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY 1, 2
        """,
        "events_tumbling": """
            SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 300) * 300 AS ws, event_type,
                   count(*) AS n, round(sum(value), 2) AS value_r
            FROM events GROUP BY 1, 2
        """,
        # regenerate the fake-rgb8 payload bytes ((k*(id+1)) % 251 at byte k,
        # w=8+id%8, h=8+3id%8 — sources/multimodal.synth_media) and the
        # histogram featurizer's exact float path
        "media_features": """
            WITH m AS (SELECT i AS media_id, 8 + i % 8 AS w, 8 + (i * 3) % 8 AS h
                       FROM range(64) t(i)),
            -- duckdb 1.0 generate_series can't take lateral column args:
            -- generate to the max payload size (15*15*3) and filter
            b AS (SELECT media_id, k % 3 AS ch, ((k * (media_id + 1)) % 251) // 16 AS bin
                  FROM m, generate_series(0, 674) s(k) WHERE k < w * h * 3),
            counts AS (SELECT media_id, ch, bin, count(*) AS c FROM b GROUP BY 1, 2, 3),
            slots AS (SELECT m.media_id, ch.ch, bin.bin
                      FROM m, range(3) ch(ch), range(16) bin(bin)),
            fullh AS (SELECT s.media_id, s.ch, s.bin, coalesce(c.c, 0) AS c
                      FROM slots s LEFT JOIN counts c
                        ON s.media_id = c.media_id AND s.ch = c.ch AND s.bin = c.bin),
            norms AS (SELECT media_id, sqrt(sum(CAST(c * c AS DOUBLE))) AS nrm
                      FROM fullh GROUP BY 1)
            SELECT f.media_id, CAST(f.ch * 16 + f.bin AS INTEGER) AS idx,
                   round(CAST(CAST(CASE WHEN n.nrm = 0 THEN f.c
                                        ELSE f.c / n.nrm END AS REAL) AS DOUBLE), 4) AS val_r
            FROM fullh f JOIN norms n ON f.media_id = n.media_id
        """,
        # the STREAMING execution of the same aggregation must match the
        # same batch truth
        "events_tumbling_stream": """
            SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 300) * 300 AS ws, event_type,
                   count(*) AS n, round(sum(value), 2) AS value_r
            FROM events GROUP BY 1, 2
        """,
        "cube_orders": """
            SELECT coalesce(o_orderpriority, 'ALL') AS prio,
                   coalesce(o_orderstatus, 'ALL') AS status,
                   count(*) AS n, round(sum(o_totalprice), 2) AS total_r
            FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
        """,
        "pivot_events": """
            SELECT user_id,
                   CAST(count(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT) AS n_click,
                   CAST(count(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT) AS n_error,
                   CAST(count(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT) AS n_purchase,
                   CAST(count(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT) AS n_signup,
                   CAST(count(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT) AS n_view
            FROM events GROUP BY user_id
        """,
        "hopping_events": """
            WITH e AS (
                SELECT event_type,
                       ((CAST(floor(epoch(ts)) AS BIGINT) - k.k * 300) // 600) * 600
                         + k.k * 300 AS ws
                FROM events CROSS JOIN (VALUES (0), (1)) AS k(k)
            )
            SELECT ws, event_type, count(*) AS n FROM e GROUP BY 1, 2
        """,
        "distinct_agg": """
            SELECT event_type, count(DISTINCT user_id) AS n_users,
                   count(*) AS n_events
            FROM events GROUP BY event_type
        """,
        "events_dedup_stream": """
            SELECT DISTINCT
                   (CAST(floor(epoch(ts)) AS BIGINT) // 300) * 300 AS ws,
                   user_id, event_type
            FROM events
        """,
        "events_sessionize": """
            WITH x AS (
                SELECT user_id, ts,
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
                FROM events
            )
            SELECT user_id,
                   CAST(sum(CASE WHEN prev IS NULL
                                 OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(prev)) AS BIGINT) > 1800
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
            FROM x GROUP BY user_id
        """,
    }
