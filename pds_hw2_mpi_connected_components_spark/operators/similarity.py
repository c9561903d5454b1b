"""Similarity search over an embedding column (array<float>).

- brute-force cosine top-k: the exact baseline. All scoring happens in
  JVM-side higher-order functions (zip_with/aggregate) — no Python.
- LSH-bucketed ANN (random-hyperplane signs): scale path #1. Hyperplanes
  are derived deterministically from (dim, plane) via an integer hash, so
  signatures are reproducible with no stored model. Candidates = bucket
  collisions; exact re-scoring only within buckets.
- IVF ANN (inverted file over a deterministic coarse quantizer): scale
  path #2 — queries probe their nprobe nearest centroid buckets and
  re-score exactly within them.
- embedding near-duplicate pairs: cosine >= threshold within LSH buckets.

At 10^12 rows the brute-force path is a cross join — only for small query
sets; LSH shuffles O(n * tables) rows and IVF scores ~nprobe/n_centroids of
the corpus per query instead. All paths are DuckDB-oracle-verified and
recall-tested against the exact baseline (tests/test_similarity.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity


def cosine_topk(
    queries: DataFrame,
    candidates: DataFrame,
    k: int = 10,
    query_id: str = "query_id",
    cand_id: str = "neighbor_id",
) -> DataFrame:
    """Exact top-k: (query_id, neighbor_id, rank, sim_r). Deterministic
    ordering: (round(sim,4) desc, neighbor_id asc). ``queries``/``candidates``
    must have (id, embedding) columns aliased appropriately."""
    q = queries.select(F.col("id").alias(query_id), F.col("embedding").alias("qe"))
    c = candidates.select(F.col("id").alias(cand_id), F.col("embedding").alias("ce"))
    # few queries x all candidates: broadcast the small query side
    scored = F.broadcast(q).crossJoin(c).select(
        query_id, cand_id,
        F.round(cosine_similarity(F.col("qe"), F.col("ce")), 4).alias("sim_r"),
    )
    w = Window.partitionBy(query_id).orderBy(F.col("sim_r").desc(), F.col(cand_id).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(query_id, cand_id, "rank", "sim_r")
    )


def _hyperplane(dim: int, n_planes: int, seed: int) -> np.ndarray:
    """Deterministic pseudo-random hyperplanes in {-1,+1}^dim (sign LSH)."""
    idx = np.arange(dim * n_planes, dtype=np.uint64).reshape(n_planes, dim)
    z = (idx + np.uint64(seed)) * np.uint64(0x9E3779B97F4A7C15)
    z ^= z >> np.uint64(29)
    z = z * np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(32)
    return np.where((z & np.uint64(1)).astype(bool), 1.0, -1.0)


def lsh_signatures(
    emb: DataFrame, n_planes: int = 16, seed: int = 7, id_col: str = "vec_id"
) -> DataFrame:
    """(id, bucket): random-hyperplane sign signature packed into a long.
    Vectorized pandas UDF (Arrow batches, numpy matmul per batch)."""
    dim = len(emb.select("embedding").first()["embedding"])
    planes = _hyperplane(dim, n_planes, seed)
    weights = np.uint64(1) << np.arange(n_planes, dtype=np.uint64)

    @F.pandas_udf("long")
    def bucket_of(v: pd.Series) -> pd.Series:
        m = np.stack(v.apply(np.asarray, dtype=np.float64))
        signs = (m @ planes.T) > 0
        return pd.Series((signs.astype(np.uint64) @ weights).astype(np.int64))

    return emb.select(F.col(id_col).alias("id"), bucket_of("embedding").alias("bucket"))


#: Seed stride between LSH tables: a large prime so per-table hyperplane
#: index streams (seed + t * stride + idx) never overlap for sane dims.
LSH_TABLE_SEED_STRIDE = 1_000_003


def lsh_signatures_tables(
    emb: DataFrame,
    n_planes: int = 12,
    seed: int = 7,
    n_tables: int = 4,
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, table, bucket): one sign-LSH signature per table, each table
    with independent deterministic hyperplanes (seed + t * stride). ALL
    tables' buckets come from ONE stacked matmul per Arrow batch — the
    per-row Python cost is identical to the single-table path."""
    dim = len(emb.select("embedding").first()["embedding"])
    stacked = np.concatenate(
        [
            _hyperplane(dim, n_planes, seed + t * LSH_TABLE_SEED_STRIDE)
            for t in range(n_tables)
        ]
    )  # (n_tables * n_planes, dim)
    weights = np.uint64(1) << np.arange(n_planes, dtype=np.uint64)

    @F.pandas_udf("array<long>")
    def buckets_of(v: pd.Series) -> pd.Series:
        m = np.stack(v.apply(np.asarray, dtype=np.float64))
        signs = ((m @ stacked.T) > 0).reshape(len(m), n_tables, n_planes)
        b = (signs.astype(np.uint64) @ weights).astype(np.int64)
        return pd.Series(list(b))

    return (
        emb.select(F.col(id_col).alias("id"), buckets_of("embedding").alias("bs"))
        .select("id", F.posexplode("bs").alias("table", "bucket"))
    )


def ann_topk_lsh(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_planes: int = 12,
    seed: int = 7,
    id_col: str = "vec_id",
    n_tables: int = 1,
) -> DataFrame:
    """Approximate top-k: score only candidates that share an LSH bucket
    with the query in at least one of ``n_tables`` independent tables — the
    production recall knob (each extra table is another chance for a true
    neighbor to collide; candidates are deduped before re-scoring, so cost
    grows with the UNION of collisions, not the sum). Returns (query_id,
    neighbor_id, sim_r, rank); recall against the exact cosine_topk is
    measured in tests/test_similarity.py on clustered embeddings (including
    monotone recall-vs-tables), and the driver contract value-checks the
    n_tables=1 result against a DuckDB oracle (__spark_entry__.py:
    ann_topk_lsh)."""
    if n_tables == 1:
        # single-table fast path: candidates carry their embeddings through
        # the bucket join, no dedup or re-join needed
        sig = lsh_signatures(emb, n_planes, seed, id_col)
        base = emb.select(F.col(id_col).alias("id"), "embedding").join(sig, "id")
        q = (
            queries.select(F.col(id_col).alias("qid"))
            .join(base.withColumnRenamed("id", "qid"), "qid")
            .select("qid", F.col("embedding").alias("qe"), "bucket")
        )
        c = base.select(F.col("id").alias("neighbor_id"), F.col("embedding").alias("ce"), "bucket")
        scored = q.join(c, "bucket").select(
            F.col("qid").alias("query_id"), "neighbor_id",
            F.round(cosine_similarity(F.col("qe"), F.col("ce")), 4).alias("sim_r"),
        )
    else:
        sig = lsh_signatures_tables(emb, n_planes, seed, n_tables, id_col)
        q_sig = (
            queries.select(F.col(id_col).alias("qid"))
            .join(sig.withColumnRenamed("id", "qid"), "qid")
        )
        cand = (
            q_sig.join(
                sig.withColumnRenamed("id", "neighbor_id"), ["table", "bucket"]
            )
            .select("qid", "neighbor_id")
            .distinct()  # union of per-table collisions, scored ONCE
        )
        qe = emb.select(F.col(id_col).alias("qid"), F.col("embedding").alias("qe"))
        ce = emb.select(
            F.col(id_col).alias("neighbor_id"), F.col("embedding").alias("ce")
        )
        scored = (
            cand.join(qe, "qid")
            .join(ce, "neighbor_id")
            .select(
                F.col("qid").alias("query_id"), "neighbor_id",
                F.round(cosine_similarity(F.col("qe"), F.col("ce")), 4).alias("sim_r"),
            )
        )
    w = Window.partitionBy("query_id").orderBy(F.col("sim_r").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def ivf_assign(
    emb: DataFrame,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    round_digits: int = 6,
) -> tuple[DataFrame, DataFrame]:
    """(assignments (id, cid), centroids (cid, centroid)): IVF coarse
    quantizer. Centroids are the vectors with the ``n_centroids`` smallest
    ids — deterministic, model-free (a k-means refinement would work the
    same way downstream; seeds keep the assignment reproducible and
    SQL-checkable). Assignment = argmax cosine, computed per (vector,
    centroid) with the similarity rounded to ``round_digits`` and ties
    broken by smaller cid — fully deterministic.

    Assignment is the textbook O(n * n_centroids) broadcast crossJoin, so
    ``n_centroids`` MUST stay broadcast-sized (thousands, not millions —
    each executor holds all centroid vectors); the corpus side streams and
    never shuffles."""
    cents = (
        emb.orderBy(id_col).limit(n_centroids)
        .select(F.col(id_col).alias("cid"), F.col("embedding").alias("centroid"))
    )
    scored = emb.select(F.col(id_col).alias("id"), "embedding").crossJoin(
        F.broadcast(cents)
    ).select(
        "id", "cid",
        F.round(cosine_similarity(F.col("embedding"), F.col("centroid")), round_digits).alias("sim"),
    )
    assign = (
        scored.groupBy("id")
        .agg(F.min(F.struct((-F.col("sim")).alias("ns"), F.col("cid"))).alias("s"))
        .select("id", F.col("s.cid").alias("cid"))
    )
    return assign, cents


def ann_topk_ivf(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 2,
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF ANN: score only candidates in the query's ``nprobe`` nearest
    centroid buckets (the inverted-file pattern — at 10^12 rows the scored
    set is ~nprobe/n_centroids of the corpus, and buckets are ordinary
    shuffle partitions). Returns (query_id, neighbor_id, sim_r, rank);
    recall vs exact measured in tests/test_similarity.py."""
    assign, cents = ivf_assign(emb, n_centroids, id_col)
    base = emb.select(F.col(id_col).alias("id"), "embedding").join(assign, "id")
    q_emb = queries.select(F.col(id_col).alias("qid")).join(
        emb.select(F.col(id_col).alias("qid"), "embedding"), "qid"
    )
    q_probe = (
        q_emb.crossJoin(F.broadcast(cents))
        .select(
            "qid", "embedding", "cid",
            F.round(cosine_similarity(F.col("embedding"), F.col("centroid")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("cid").asc())
    probes = (
        q_probe.withColumn("pr", F.row_number().over(w))
        .where(F.col("pr") <= nprobe)
        .select("qid", F.col("embedding").alias("qe"), "cid")
    )
    scored = probes.join(
        base.select(F.col("id").alias("neighbor_id"), F.col("embedding").alias("ce"), "cid"),
        "cid",
    ).select(
        F.col("qid").alias("query_id"), "neighbor_id",
        F.round(cosine_similarity(F.col("qe"), F.col("ce")), 4).alias("sim_r"),
    )
    # each vector lives in exactly one bucket, so (query, neighbor) pairs
    # are already unique across the nprobe probed buckets — no dedup needed
    w2 = Window.partitionBy("query_id").orderBy(F.col("sim_r").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w2).cast("long"))
        .where(F.col("rank") <= k)
    )


def embedding_near_dups(
    emb: DataFrame, threshold: float = 0.95, n_planes: int = 12, seed: int = 7,
    id_col: str = "vec_id",
    max_bucket: int | None = 10_000,
    stats: dict | None = None,
) -> DataFrame:
    """(a, b, sim_r) pairs with cosine >= threshold, candidate-limited to
    LSH bucket collisions (near-identical vectors collide with high prob).

    ``max_bucket`` (default 10k, ``None`` to opt out) drops LSH buckets
    larger than the cap before the within-bucket self-join — the skew guard
    for degenerate corpora (e.g. many zero/constant vectors collapsing into
    one bucket); see :func:`..operators.dedup.cap_hot_buckets`."""
    from .dedup import cap_hot_buckets

    sig = lsh_signatures(emb, n_planes, seed, id_col)
    sig = cap_hot_buckets(sig, ["bucket"], max_bucket, stats, "embedding_near_dups")
    base = emb.select(F.col(id_col).alias("id"), "embedding").join(sig, "id")
    x = base.select(F.col("id").alias("a"), F.col("embedding").alias("ea"), "bucket")
    y = base.select(F.col("id").alias("b"), F.col("embedding").alias("eb"), "bucket")
    return (
        x.join(y, "bucket")
        .where(F.col("a") < F.col("b"))
        .select("a", "b", F.round(cosine_similarity(F.col("ea"), F.col("eb")), 4).alias("sim_r"))
        .where(F.col("sim_r") >= threshold)
    )
