"""Extra benchmarks / profiling for the optimization round (guide §1.4).

NOT part of the frozen driver contract (bench.py is the measured artifact);
this file exists so optimization work can time individual operators with
noop-sink isolation, per-phase metrics, and Spark job counts without
touching bench.py.

Usage:
    python bench_extra.py scc|bowtie|pagerank|... [--sf DIR] [--trials N]
    python bench_extra.py all
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from pds_hw2_mpi_connected_components_spark.plans.session import get_spark  # noqa: E402
from pds_hw2_mpi_connected_components_spark.plans.flat import flat_checkpoint  # noqa: E402
from pds_hw2_mpi_connected_components_spark.sources.doc_edges import (  # noqa: E402
    doc_edges_blocked,
    doc_edges_global,
    doc_vertices,
)


def _job_count(spark) -> int:
    t = spark.sparkContext.statusTracker()
    ids = t.getJobIdsForGroup(None)
    return max(ids) if ids else 0


def profile(name, fn, spark, summarize=None):
    j0 = _job_count(spark)
    t0 = time.monotonic()
    out = fn()
    dt = time.monotonic() - t0
    j1 = _job_count(spark)
    extra = summarize(out) if summarize else {}
    print(json.dumps({"leg": name, "sec": round(dt, 3),
                      "jobs": j1 - j0, **extra}))
    return out


def phase_rollup(metrics):
    agg: dict[str, dict] = {}
    for m in metrics:
        ph = m.get("phase", "iter")
        a = agg.setdefault(ph, {"rounds": 0, "sec": 0.0})
        a["rounds"] += 1
        a["sec"] += m.get("sec", 0.0)
    return {k: {"rounds": v["rounds"], "sec": round(v["sec"], 3)}
            for k, v in agg.items()}


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(master=f"local[{cpus}]", app_name="bench_extra",
                      shuffle_partitions=max(8, cpus))

    eb = doc_edges_blocked(spark, sf_dir).transform(flat_checkpoint)
    eg = doc_edges_global(spark, sf_dir).transform(flat_checkpoint)
    verts = doc_vertices(spark, sf_dir)
    print(json.dumps({"eb_edges": eb.count(), "eg_edges": eg.count(),
                      "verts": verts.count()}))

    if which in ("scc", "all"):
        from pds_hw2_mpi_connected_components_spark.operators.scc import (
            strongly_connected_components,
        )
        for t in range(2):
            out = profile(
                f"doc_scc[{t}]",
                lambda: strongly_connected_components(eb, vertices=verts),
                spark,
                summarize=lambda r: {"phases": phase_rollup(r[1])},
            )
            out[0].write.format("noop").mode("overwrite").save()

    if which in ("bowtie", "all"):
        from pds_hw2_mpi_connected_components_spark.operators.bowtie import bowtie
        from pds_hw2_mpi_connected_components_spark.operators.scc import (
            strongly_connected_components,
        )
        for t in range(2):
            out = profile(
                f"doc_bowtie[{t}]",
                lambda: bowtie(eb, vertices=verts),
                spark,
                summarize=lambda r: {"phases": [
                    {k: v for k, v in m.items() if k != "iter"}
                    for m in r[1]]},
            )
            out[0].write.format("noop").mode("overwrite").save()
        # VERDICT r6 #4: the bench's doc_bowtie leg re-runs SCC internally;
        # this variant times the pure composition cost with precomputed
        # labels (bench.py is frozen, so the variant lives here).
        scc_labels = strongly_connected_components(eb, vertices=verts)[0]
        scc_labels = scc_labels.transform(flat_checkpoint)
        for t in range(2):
            out = profile(
                f"doc_bowtie_precomputed[{t}]",
                lambda: bowtie(eb, vertices=verts, scc_labels=scc_labels),
                spark,
            )
            out[0].write.format("noop").mode("overwrite").save()

    if which in ("pagerank", "all"):
        from pds_hw2_mpi_connected_components_spark.operators.pagerank import pagerank
        for t in range(2):
            out = profile(
                f"doc_pagerank_20it[{t}]",
                lambda: pagerank(eg, vertices=verts, tol=0.0, max_iter=20),
                spark,
                summarize=lambda r: {"iters": len(r[1]),
                                     "sec_per_iter": round(sum(m["sec"] for m in r[1]) / max(1, len(r[1])), 3)},
            )
            out[0].write.format("noop").mode("overwrite").save()

    if which in ("hits", "all"):
        from pds_hw2_mpi_connected_components_spark.operators.hits import hits
        for t in range(2):
            out = profile(
                f"doc_hits_10it[{t}]",
                lambda: hits(eg, vertices=verts, tol=0.0, max_iter=10),
                spark,
                summarize=lambda r: {"iters": len(r[1])},
            )
            out[0].write.format("noop").mode("overwrite").save()

    if which in ("anf", "all"):
        from pds_hw2_mpi_connected_components_spark.operators.anf import anf
        for t in range(2):
            out = profile(
                f"doc_anf_16t[{t}]",
                lambda: anf(eg, vertices=verts, n_trials=16, max_hops=8),
                spark,
                summarize=lambda r: {"hops": len(r[1])},
            )
            out[0].write.format("noop").mode("overwrite").save()

    if which in ("coreness", "all"):
        from pds_hw2_mpi_connected_components_spark.operators.kcore import coreness, k_core
        for t in range(2):
            profile(f"doc_kcore3[{t}]", lambda: k_core(eb, k=3)[0].count(), spark)
            profile(
                f"doc_coreness[{t}]",
                lambda: coreness(eb)[0].count(),
                spark,
            )

    if which in ("labelprop", "all"):
        from pds_hw2_mpi_connected_components_spark.operators.labelprop import (
            label_propagation,
        )
        from pds_hw2_mpi_connected_components_spark.sources.graph_build import symmetrize
        for t in range(2):
            profile(
                f"doc_labelprop_5it[{t}]",
                lambda: label_propagation(symmetrize(eb), vertices=verts,
                                          max_iter=5)[0].count(),
                spark,
            )

    if which in ("cc", "all"):
        from pds_hw2_mpi_connected_components_spark.operators.cc import (
            connected_components,
        )
        from pds_hw2_mpi_connected_components_spark.operators.frontier import (
            connected_components_frontier,
        )
        for t in range(2):
            profile(
                f"doc_cc_global[{t}]",
                lambda: connected_components(eg, vertices=verts)[0].count(),
                spark,
                )
            profile(
                f"doc_cc_global_frontier[{t}]",
                lambda: connected_components_frontier(
                    eg, vertices=verts, broadcast_threshold=100_000)[0].count(),
                spark,
            )

    spark.stop()


if __name__ == "__main__":
    main()
