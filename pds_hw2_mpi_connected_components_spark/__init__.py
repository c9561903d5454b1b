"""PySpark-native link-graph analytics engine.

Brand-new engine with the query capabilities of the reference MPI+OpenMP
connected-components system (``/root/reference``, see SURVEY.md), re-expressed
Spark-first: DataFrame/SQL plans, Arrow-vectorized pandas UDFs on the slow
path, driver-side fixpoint loops with per-iteration checkpointing.

Layout
------
- ``sources``    : deterministic pages datagen, HTML link/text extraction,
                   pages -> (vertices, edges, degrees) graph build, portable
                   document-derived edge tables.
- ``operators``  : connected components (large-star/small-star), PageRank,
                   synchronous label propagation, triangle counting, degree
                   aggregation, dedup family (exact / jaccard / minhash-LSH /
                   simhash / embedding), similarity search (cosine top-k,
                   LSH-bucketed ANN).
- ``functions``  : scalar/text/vector column expressions (portable hashing,
                   token stats, language id, quality scores, fingerprints).
- ``plans``      : SparkSession factory, checkpoint store with manifest +
                   resume, convergence metrics.
- ``streaming``  : Structured Streaming over the events table (tumbling
                   windows, watermarks, sessionization parity).
"""

__version__ = "0.1.0"
