"""SparkSession factory with scale-aware defaults.

Replaces the reference's hand-tuned MPI/OpenMP launch configuration
(/root/reference/run_slurm.sh:5-25, ranks-per-node tuning in
docs/performance.md:50-58) with Spark config: AQE + skew-join handle what
`schedule(guided)` did within a rank, Arrow handles what packed C arrays did.

On a real cluster the same code runs under ``spark-submit --py-files``; only
``master`` and the memory/executor knobs change. Everything here is safe for
local[N] testing *and* a 1000-executor deployment: shuffle partitions are an
explicit knob, AQE coalesces/re-splits at runtime from actual stats.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Sized for the driver-provided local[32] sandbox; on a cluster these are
# overridden by spark-submit --conf. AQE makes shuffle.partitions a ceiling,
# not a fixed fan-out.
_DEFAULTS = {
    "spark.sql.shuffle.partitions": "32",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.compression.codec": "zstd",
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"),
    # local mode: shuffle spills land on local disk; keep temp IO cheap.
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
}


def get_spark(
    master: str | None = None,
    app_name: str = "linkgraph-engine",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32).
    ``shuffle_partitions`` should track total cores locally; on a cluster,
    ~2-3x total executor cores.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    builder = SparkSession.builder.master(master).appName(app_name)
    conf = dict(_DEFAULTS)
    if shuffle_partitions is not None:
        conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
