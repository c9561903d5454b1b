"""N-vs-4N scaling-efficiency benchmark (the north rule's two-cluster-size
criterion, evidenced at two parallelism levels — local[8] (N) vs local[32]
(4N) — as no real cluster exists in this sandbox; see BASELINE.md
"Interpretation").

Parent mode: pre-materializes a deterministic pages parquet once (input
creation excluded from timing, like the reference excludes matrix load,
/root/reference/src/main.c:56-76), then runs the identical job at both
parallelism levels in separate subprocesses (clean JVM each), computes
per-stage speedups and efficiency = (T_N / T_4N) / 4, and rewrites
BENCH/BASELINE.md.

Worker mode (--worker MASTER): times the full pipeline — read pages ->
extract links (mapInPandas) -> build vertex dictionary + deduped edge table
-> connected components — plus standalone CC / 5-iteration PageRank legs in
both execution modes (DataFrame and CSR), and emits one JSON line including
a label checksum (cross-parallelism determinism evidence, mirroring the
reference's trial-consistency check, /root/reference/src/benchmark.c:275-284).

Throughput definition: symmetric deduped edge count / wall seconds
(reference: nnz/mean_time, benchmark.c:308).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PAGES_PARQUET = "/tmp/spark_graft_bench/pages.parquet"
N_PAGES_DEFAULT = 250_000
N_COMPONENTS = 64
N_VERTICES_GRAPH = 2_000_000  # standalone CC/PR legs (JVM-generated edges)


def ensure_pages(n_pages: int) -> None:
    from pds_hw2_mpi_connected_components_spark.plans.session import get_spark
    from pds_hw2_mpi_connected_components_spark.sources.datagen import generate_pages

    marker = f"{PAGES_PARQUET}.meta.json"
    if os.path.exists(marker):
        with open(marker) as f:
            if json.load(f).get("n_pages") == n_pages:
                return
    spark = get_spark(master="local[32]", app_name="bench-datagen")
    generate_pages(spark, n_pages, n_components=N_COMPONENTS,
                   num_partitions=64).write.mode("overwrite").parquet(PAGES_PARQUET)
    spark.stop()
    with open(marker, "w") as f:
        json.dump({"n_pages": n_pages}, f)


def worker(master: str, n_pages: int) -> None:
    from pyspark.sql import functions as F

    from pds_hw2_mpi_connected_components_spark.operators.cc import (
        cc_count,
        connected_components,
    )
    from pds_hw2_mpi_connected_components_spark.operators.csr import (
        connected_components_csr,
        pagerank_csr,
    )
    from pds_hw2_mpi_connected_components_spark.operators.pagerank import pagerank
    from pds_hw2_mpi_connected_components_spark.plans.session import get_spark
    from pds_hw2_mpi_connected_components_spark.sources.datagen import generate_edges
    from pds_hw2_mpi_connected_components_spark.sources.graph_build import (
        build_graph,
        symmetrize,
    )

    cpus = int(master.split("[")[1].rstrip("]"))
    spark = get_spark(master=master, app_name=f"scaling-{cpus}",
                      shuffle_partitions=cpus * 2,
                      extra_conf={"spark.driver.memory": "48g"})
    t: dict[str, float] = {}
    info: dict = {"master": master, "cpus": cpus, "n_pages": n_pages}

    # ---- pipeline: pages parquet -> extract -> graph -> CC --------------
    t0 = time.monotonic()
    pages = spark.read.parquet(PAGES_PARQUET)
    g = build_graph(pages)
    edges = g.edges.localCheckpoint(eager=True)
    info["pipeline_edges"] = edges.count()
    t["pipeline_extract_build"] = time.monotonic() - t0

    t0 = time.monotonic()
    labels, m = connected_components(edges, vertices=g.vertices.select("vid"))
    n_comp = cc_count(labels)
    t["pipeline_cc"] = time.monotonic() - t0
    assert n_comp == N_COMPONENTS, n_comp
    row = labels.agg(F.bit_xor(F.xxhash64("vid", "label")).alias("h"),
                     F.count("*").alias("n")).collect()[0]
    info["pipeline_label_checksum"] = [row["n"], row["h"]]
    t["pipeline_total"] = t["pipeline_extract_build"] + t["pipeline_cc"]

    # ---- standalone graph legs on a larger JVM-generated graph ----------
    edges2 = generate_edges(spark, N_VERTICES_GRAPH, n_components=N_COMPONENTS)
    edges2 = edges2.localCheckpoint(eager=True)
    info["graph_edges"] = edges2.count()
    info["graph_sym_edges"] = symmetrize(edges2).count()

    t0 = time.monotonic()
    labels2, m2 = connected_components(edges2)
    assert cc_count(labels2) == N_COMPONENTS
    t["cc_dataframe"] = time.monotonic() - t0
    info["cc_rounds"] = len(m2)
    row = labels2.agg(F.bit_xor(F.xxhash64("vid", "label")).alias("h"),
                      F.count("*").alias("n")).collect()[0]
    info["graph_label_checksum"] = [row["n"], row["h"]]

    t0 = time.monotonic()
    labels3, _ = connected_components_csr(edges2)
    t["cc_csr"] = time.monotonic() - t0
    row = labels3.agg(F.bit_xor(F.xxhash64("vid", "label")).alias("h"),
                      F.count("*").alias("n")).collect()[0]
    assert row["h"] == info["graph_label_checksum"][1], "CSR/DataFrame label mismatch"

    t0 = time.monotonic()
    r1, _ = pagerank(edges2, tol=0.0, max_iter=5)
    r1.count()
    t["pr5_dataframe"] = time.monotonic() - t0

    t0 = time.monotonic()
    r2, _ = pagerank_csr(edges2, tol=0.0, max_iter=5)
    r2.count()
    t["pr5_csr"] = time.monotonic() - t0

    info["timings"] = {k: round(v, 3) for k, v in t.items()}
    info["cc_edges_per_sec_df"] = round(info["graph_sym_edges"] / t["cc_dataframe"], 1)
    info["cc_edges_per_sec_csr"] = round(info["graph_sym_edges"] / t["cc_csr"], 1)
    print(json.dumps(info))
    spark.stop()


def parent(n_pages: int) -> None:
    ensure_pages(n_pages)
    results = {}
    for master in ("local[8]", "local[32]"):
        cmd = [sys.executable, os.path.abspath(__file__), "--worker", master,
               "--n-pages", str(n_pages)]
        out = subprocess.run(cmd, capture_output=True, text=True,
                             cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
        if not lines:
            print(out.stdout[-3000:])
            print(out.stderr[-3000:])
            raise SystemExit(f"worker {master} failed")
        results[master] = json.loads(lines[-1])
        print(lines[-1])

    r8, r32 = results["local[8]"], results["local[32]"]
    assert r8["pipeline_label_checksum"] == r32["pipeline_label_checksum"]
    assert r8["graph_label_checksum"] == r32["graph_label_checksum"]

    effs = {}
    for k in r8["timings"]:
        effs[k] = round((r8["timings"][k] / r32["timings"][k]) / 4, 3)
    summary = {"efficiency_8_to_32": effs,
               "labels_identical_across_parallelism": True}
    print(json.dumps(summary))

    rows = []
    for k in r8["timings"]:
        rows.append(
            f"| {k} | {r8['timings'][k]:.2f} | {r32['timings'][k]:.2f} | "
            f"{r8['timings'][k]/r32['timings'][k]:.2f}x | **{effs[k]:.3f}** |"
        )
    table = "\n".join(rows)
    md = f"""# BENCH — scaling-efficiency evidence (N vs 4N)

Protocol: identical jobs at **local[8] (N)** and **local[32] (4N)**, fresh JVM
per config, input parquet pre-materialized (input creation excluded, as the
reference excludes matrix load from timing, /root/reference/src/main.c:56-76).
Efficiency = (T_N / T_4N) / 4. Determinism: CC label checksums identical
across parallelism (trial-consistency analog, benchmark.c:275-284).

Pipeline = read {r8['n_pages']:,} Common-Crawl-style pages -> mapInPandas link
extraction -> vertex dictionary + deduped edge table ({r8['pipeline_edges']:,}
edges) -> large-star/small-star CC ({N_COMPONENTS} components, verified).
Standalone legs: {r8['graph_edges']:,}-edge graph ({r8['graph_sym_edges']:,}
symmetrized), CC + 5 PageRank iterations in both execution modes
(DataFrame = shuffle-based, scales past node memory; CSR = Arrow/numpy
gather-scatter with a broadcast vector, the reference's physical shape).

| stage | local[8] s | local[32] s | speedup | efficiency |
|---|---:|---:|---:|---:|
{table}

CC throughput (sym edges/s): local[8] df {r8['cc_edges_per_sec_df']:,.0f} /
csr {r8['cc_edges_per_sec_csr']:,.0f}; local[32] df {r32['cc_edges_per_sec_df']:,.0f} /
csr {r32['cc_edges_per_sec_csr']:,.0f}.

Reference baselines (BASELINE.md): friendster 1-node best 125.6 Me/s,
scaling efficiency 0.893 (2x) / 0.774 (4x); mawi collapses to 0.069
(Allgatherv full-snapshot replication — the wall our DataFrame mode removes;
our CSR mode intentionally reproduces that design for per-node speed and is
benchmarked side by side).
"""
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(md)
    with open("BENCH/scaling_results.json", "w") as f:
        json.dump({"runs": results, "summary": summary}, f, indent=2)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", default=None)
    ap.add_argument("--n-pages", type=int, default=N_PAGES_DEFAULT)
    args = ap.parse_args()
    if args.worker:
        worker(args.worker, args.n_pages)
    else:
        parent(args.n_pages)
