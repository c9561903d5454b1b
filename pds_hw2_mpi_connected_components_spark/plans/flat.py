"""Stats-safe eager localCheckpoint for iterative loops.

Every iterative operator here materializes its per-round state with
``repartition(key).localCheckpoint(eager=True)`` — the flat LogicalRDD
preserves hash partitioning (co-partitioned loop joins stay exchange-free)
and truncates RDD lineage (rationale in operators/pagerank.py).

Measured hazard (pyspark 4.1.2): ``Dataset.checkpoint`` builds the flat
LogicalRDD with ``originStats = Some(optimizedPlan.stats)`` — the
checkpoint INHERITS the origin plan's size estimate instead of resetting
it. Catalyst's ``SizeInBytesOnlyStatsPlanVisitor`` multiplies children's
``sizeInBytes`` at every inner/outer join, so when iteration i+1's plan
joins iteration i's checkpoint (always true for a fixpoint loop), the
inherited estimates COMPOUND: any round that references the previous
iterate more than once (HITS' convergence-delta join, BFS' frontier
expansion, coreness' victim/loss joins) makes the BigInteger's digit count
grow GEOMETRICALLY with the iteration number. Around iteration ~20 the
driver disappears into Karatsuba/Toom-Cook multiplications of
million-digit integers inside stats estimation — wall-clock explodes with
zero executor work (measured: a 7-vertex HITS run that cannot finish 40
iterations). At 100 TB this is a driver livelock on ANY long-running loop.

:func:`flat_checkpoint` closes the hazard: eager localCheckpoint, then
rebuild the LogicalRDD node with ``originStats = None`` (and
``originConstraints = None`` — constraint sets accumulate the same way) so
the checkpoint's size estimate falls back to the bounded leaf default.
The RDD, output attributes, partitioning, and ordering are copied
verbatim from the node the checkpoint just built — no recompute, no lost
co-partitioning, and observed metrics (``DataFrame.observe``) have already
fired on the materializing job.

The rebuild touches ``private[sql]`` constructors (public in bytecode,
reachable over py4j). If any reflection step fails — e.g. a future Spark
reshapes LogicalRDD — we fall back to the plain checkpoint: correctness
is unaffected, only the stats hazard returns, and a RuntimeWarning names
this module. tests/test_plan_audit.py pins both the digit-count bound and
the partitioning preservation.
"""

from __future__ import annotations

import warnings

from pyspark.sql import DataFrame

_LOGICAL_RDD = "org.apache.spark.sql.execution.LogicalRDD"
_warned = False


def flat_checkpoint(df: DataFrame) -> DataFrame:
    """``df.localCheckpoint(eager=True)`` with origin stats/constraints
    stripped (module docstring). Drop-in replacement for the call sites in
    iterative loops."""
    ck = df.localCheckpoint(eager=True)
    global _warned
    try:
        spark = df.sparkSession
        jvm = spark._jvm  # type: ignore[attr-defined]
        node = ck._jdf.queryExecution().analyzed()  # type: ignore[attr-defined]
        if node.getClass().getName() != _LOGICAL_RDD:
            return ck
        none = getattr(getattr(jvm.scala, "None$"), "MODULE$")
        stripped = jvm.org.apache.spark.sql.execution.LogicalRDD(
            node.output(),
            node.rdd(),
            node.outputPartitioning(),
            node.outputOrdering(),
            node.isStreaming(),
            node.stream(),
            spark._jsparkSession,  # type: ignore[attr-defined]
            none,  # originStats
            none,  # originConstraints
        )
        jdf = jvm.org.apache.spark.sql.classic.Dataset.ofRows(
            spark._jsparkSession, stripped  # type: ignore[attr-defined]
        )
        return DataFrame(jdf, spark)
    except Exception as exc:  # pragma: no cover - version-drift fallback
        if not _warned:
            _warned = True
            warnings.warn(
                "flat_checkpoint: could not strip origin stats from the "
                f"checkpointed plan ({exc!r}); falling back to the plain "
                "localCheckpoint — iterative loops with >20 rounds may hit "
                "the stats-compounding driver stall documented in "
                "pds_hw2_mpi_connected_components_spark/plans/flat.py",
                RuntimeWarning,
                stacklevel=2,
            )
        return ck
