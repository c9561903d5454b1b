"""Deterministic edge tables derived from the ``documents`` table.

The driver's correctness harness compares our Spark queries against DuckDB
SQL over the *same* parquet tables. Graph queries therefore need an edge
table both engines derive identically. Everything here is integer
arithmetic (*, +, %) on (doc_id, n_chars) — bit-identical in Spark and
DuckDB (verified: both use int64 with the same % semantics on non-negative
operands).

Two graphs:

- **blocked**: links stay inside 16-document blocks => components and
  triangles are block-local, so the DuckDB recursive-CTE / 3-way-join
  oracles stay cheap at sf=0.01 while the structure is still non-trivial.
- **global**: ~1-5 out-links per doc across the whole id space with a hub
  bias (j==0 links land on the first 64 docs) => power-law-ish in-degree
  skew, the realistic shape for PageRank/degree queries and the bench.

The SQL constants are the *single source of truth* for the oracle side;
the DataFrame builders mirror them expression-for-expression (each engine
executes its native form; tests assert the edge sets are identical).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# -- shared SQL (DuckDB-dialect-compatible AND documented contract) --------

EDGES_BLOCKED_SQL = """
SELECT DISTINCT src, dst FROM (
  SELECT d.doc_id AS src,
         (d.doc_id - (d.doc_id % 16))
           + ((d.doc_id * 37 + j.j * 101 + d.n_chars) % 16) AS dst
  FROM documents d CROSS JOIN (VALUES (0), (1), (2)) AS j(j)
  WHERE j.j <= d.doc_id % 3
) t
WHERE src <> dst AND dst < (SELECT count(*) FROM documents)
"""

EDGES_GLOBAL_SQL = """
SELECT DISTINCT src, dst FROM (
  SELECT d.doc_id AS src,
         CASE WHEN j.j = 0
              THEN ((d.doc_id * 2654435761 + d.n_chars * 31)
                    % (SELECT count(*) FROM documents)) % 64
              ELSE (d.doc_id * 2654435761 + j.j * 40503 + d.n_chars * 31)
                    % (SELECT count(*) FROM documents)
         END AS dst
  FROM documents d CROSS JOIN (VALUES (0), (1), (2), (3), (4)) AS j(j)
  WHERE j.j <= d.doc_id % 5
) t
WHERE src <> dst
"""

SYM_BLOCKED_SQL = f"""
SELECT src, dst FROM ({EDGES_BLOCKED_SQL})
UNION
SELECT dst AS src, src AS dst FROM ({EDGES_BLOCKED_SQL})
"""


def load_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _doc_count(docs: DataFrame) -> int:
    return docs.count()


def doc_edges_blocked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src,dst) within 16-doc blocks; mirrors EDGES_BLOCKED_SQL exactly."""
    docs = load_documents(spark, sf_dir).select("doc_id", "n_chars")
    n = _doc_count(docs)
    j = F.explode(F.sequence(F.lit(0), F.col("doc_id") % 3)).alias("j")
    exploded = docs.select("doc_id", "n_chars", j)
    dst = (F.col("doc_id") - (F.col("doc_id") % 16)) + (
        (F.col("doc_id") * 37 + F.col("j") * 101 + F.col("n_chars")) % 16
    )
    return (
        exploded.select(F.col("doc_id").alias("src"), dst.alias("dst"))
        .where((F.col("src") != F.col("dst")) & (F.col("dst") < F.lit(n)))
        .distinct()
    )


def doc_edges_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src,dst) over the whole doc id space with hub bias; mirrors
    EDGES_GLOBAL_SQL exactly."""
    docs = load_documents(spark, sf_dir).select("doc_id", "n_chars")
    n = _doc_count(docs)
    j = F.explode(F.sequence(F.lit(0), F.col("doc_id") % 5)).alias("j")
    exploded = docs.select("doc_id", "n_chars", j)
    raw0 = (F.col("doc_id") * F.lit(2654435761) + F.col("n_chars") * 31) % F.lit(n)
    rawj = (
        F.col("doc_id") * F.lit(2654435761) + F.col("j") * 40503 + F.col("n_chars") * 31
    ) % F.lit(n)
    dst = F.when(F.col("j") == 0, raw0 % 64).otherwise(rawj)
    return (
        exploded.select(F.col("doc_id").alias("src"), dst.alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )


def doc_vertices(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_documents(spark, sf_dir).select(F.col("doc_id").alias("vid"))
