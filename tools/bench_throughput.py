"""Absolute-throughput probe at full local parallelism.

One large JVM-generated graph (default 24M vertices, ~100M+ directed
edges), local[32], single shot per leg (the N-vs-4N efficiency story lives
in tools/bench_scaling.py; this reports the biggest edges/sec this sandbox
can demonstrate so the per-edge cost is amortized over a graph ~50x the
per-round fixed overhead).

Run: python tools/bench_throughput.py [n_vertices] -> one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pds_hw2_mpi_connected_components_spark.operators.cc import (  # noqa: E402
    cc_count,
    connected_components,
)
from pds_hw2_mpi_connected_components_spark.operators.csr import (  # noqa: E402
    connected_components_csr,
    pagerank_csr,
)
from pds_hw2_mpi_connected_components_spark.operators.pagerank import pagerank  # noqa: E402
from pds_hw2_mpi_connected_components_spark.plans.session import get_spark  # noqa: E402
from pds_hw2_mpi_connected_components_spark.sources.datagen import generate_edges  # noqa: E402
from pds_hw2_mpi_connected_components_spark.sources.graph_build import symmetrize  # noqa: E402

N_COMPONENTS = 64


def main() -> None:
    n_vertices = int(sys.argv[1]) if len(sys.argv) > 1 else 24_000_000
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # Spark-free CPU-quota probe first (fork-safe only before the JVM): the
    # shared host's effective cores contextualize every absolute number below.
    from tools.bench_scaling import hardware_probe  # repo root is on sys.path

    probe = hardware_probe()
    spark = get_spark(master=f"local[{cpus}]", app_name="throughput",
                      shuffle_partitions=cpus * 2,
                      extra_conf={"spark.driver.memory": "90g",
                                  # same heartbeat guard as the scaling
                                  # workers (tools/bench_scaling.py)
                                  "spark.executor.heartbeatInterval": "60s",
                                  "spark.network.timeout": "1200s"})
    edges = generate_edges(spark, n_vertices, n_components=N_COMPONENTS)
    from pds_hw2_mpi_connected_components_spark.plans.flat import flat_checkpoint

    edges = edges.transform(flat_checkpoint)
    n_edges = edges.count()
    n_sym = symmetrize(edges).count()
    out = {"n_vertices": n_vertices, "directed_edges": n_edges,
           "sym_edges": n_sym, "cpus": cpus, **probe}

    t0 = time.monotonic()
    labels, m = connected_components(edges)
    assert cc_count(labels) == N_COMPONENTS
    dt = time.monotonic() - t0
    out["cc_df_sec"] = round(dt, 1)
    out["cc_df_edges_per_sec"] = round(n_sym / dt)
    out["cc_rounds"] = len(m)
    h_df = labels.agg(F.bit_xor(F.xxhash64("vid", "label"))).collect()[0][0]

    t0 = time.monotonic()
    labels2, _ = connected_components_csr(edges)
    dt = time.monotonic() - t0
    out["cc_csr_sec"] = round(dt, 1)
    out["cc_csr_edges_per_sec"] = round(n_sym / dt)
    h_csr = labels2.agg(F.bit_xor(F.xxhash64("vid", "label"))).collect()[0][0]
    assert h_df == h_csr, "mode label mismatch"

    t0 = time.monotonic()
    pagerank(edges, tol=0.0, max_iter=5)
    dt = time.monotonic() - t0
    out["pagerank5_df_sec"] = round(dt, 1)
    out["pagerank5_df_edges_per_sec_per_iter"] = round(n_edges * 5 / dt / 5)

    t0 = time.monotonic()
    pagerank_csr(edges, tol=0.0, max_iter=5)
    dt = time.monotonic() - t0
    out["pagerank5_csr_sec"] = round(dt, 1)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
