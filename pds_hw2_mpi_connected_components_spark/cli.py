"""CLI — the reference's user surface, Spark-native.

Reference: ``mpirun -np N ./connected_components_mpi [-n trials] graph.bin``
(/root/reference/src/main.c:13, args at src/args.c:83-147) printing a nested
JSON benchmark report (src/json.c:13-70, src/benchmark.c:298-321).

Here:
    python -m pds_hw2_mpi_connected_components_spark.cli ingest --pages P --out DIR
    python -m pds_hw2_mpi_connected_components_spark.cli cc [-n TRIALS] --edges DIR [--mode auto|df|csr|frontier]
    python -m pds_hw2_mpi_connected_components_spark.cli pagerank --edges DIR [--alpha A] [--mode auto|df|csr]

``ingest`` replaces the mtx_to_bin converter (pages parquet -> vertices +
edges parquet); ``cc`` runs N barriered trials with a trial-consistency
check (exit code 2 on mismatch, exactly like src/benchmark.c:275-284) and
prints a JSON report with timing statistics and edges/sec (nnz/mean_time,
benchmark.c:308).
"""

from __future__ import annotations

import argparse
import json
import os
import platform
import statistics
import sys
import time

from pyspark.sql import functions as F

from .operators.cc import cc_count
from .operators.facade import cc, pagerank_auto
from .plans.session import get_spark
from .sources.graph_build import build_graph, symmetrize
from .sources.graph_io import GraphFormatError, read_bin_csc, read_mtx, write_bin_csc
from .plans.flat import flat_checkpoint


def _load_edges(spark, path: str):
    """Edge-table source dispatch — the reference's two file formats plus
    the engine's native parquet: .mtx (MatrixMarket, symmetric-expanded),
    .bin (reference binary CSC), anything else = parquet dir of (src,dst)."""
    if path.endswith(".mtx"):
        edges, _ = read_mtx(spark, path)
    elif path.endswith(".bin"):
        edges, _ = read_bin_csc(spark, path)
    else:
        edges = spark.read.parquet(path)
    return edges.transform(flat_checkpoint)


def _time_stats(times: list[float]) -> dict:
    """min/max/mean/median/stddev — mirrors calculate_time_statistics
    (/root/reference/src/benchmark.c:50-87)."""
    return {
        "min_s": min(times),
        "max_s": max(times),
        "mean_s": statistics.mean(times),
        "median_s": statistics.median(times),
        "stddev_s": statistics.stdev(times) if len(times) > 1 else 0.0,
    }


def cmd_ingest(args: argparse.Namespace) -> int:
    spark = get_spark(master=args.master, app_name="ingest")
    pages = spark.read.parquet(args.pages)
    g = build_graph(pages)
    g.edges.write.mode("overwrite").parquet(os.path.join(args.out, "edges.parquet"))
    g.vertices.write.mode("overwrite").parquet(os.path.join(args.out, "vertices.parquet"))
    g.degrees.write.mode("overwrite").parquet(os.path.join(args.out, "degrees.parquet"))
    n_e = spark.read.parquet(os.path.join(args.out, "edges.parquet")).count()
    n_v = spark.read.parquet(os.path.join(args.out, "vertices.parquet")).count()
    print(json.dumps({"edges": n_e, "vertices": n_v, "out": args.out}))
    return 0


def _sys_info(spark) -> dict:
    """Analog of print_sys_info (/root/reference/src/json.c) — what ran where."""
    return {
        "spark_version": spark.version,
        "master": spark.sparkContext.master,
        "default_parallelism": spark.sparkContext.defaultParallelism,
        "python": platform.python_version(),
        "node": platform.node(),
    }


def cmd_convert(args: argparse.Namespace) -> int:
    """MatrixMarket -> binary CSC, the reference's mtx_to_bin converter
    (/root/reference/src/converter/mtx_to_bin.c) Spark-side."""
    spark = get_spark(master=args.master, app_name="convert")
    edges, header = read_mtx(spark, args.infile)
    nnz = write_bin_csc(edges, header["nrows"], header["ncols"], args.outfile)
    print(json.dumps({"nrows": header["nrows"], "ncols": header["ncols"],
                      "nnz_expanded": nnz, "out": args.outfile}))
    return 0


def cmd_cc(args: argparse.Namespace) -> int:
    spark = get_spark(master=args.master, app_name="cc-cli")
    edges = _load_edges(spark, args.edges)
    n_edges = edges.count()
    n_sym = symmetrize(edges).count()

    times, counts, checksums = [], [], []
    rounds, mode_used = 0, args.mode
    for _ in range(args.n_trials):
        t0 = time.monotonic()
        result = cc(edges, mode=args.mode)
        n_comp = cc_count(result.labels)
        times.append(time.monotonic() - t0)
        counts.append(n_comp)
        rounds = len(result.metrics)
        mode_used = result.mode
        h = result.labels.agg(F.bit_xor(F.xxhash64("vid", "label"))).collect()[0][0]
        checksums.append(h)

    consistent = len(set(counts)) == 1 and len(set(checksums)) == 1
    report = {
        "system": _sys_info(spark),
        "graph": {"directed_edges": n_edges, "sym_edges_nnz": n_sym},
        "benchmark": {
            "n_trials": args.n_trials,
            "mode": mode_used,
            "rounds_to_convergence": rounds,
            **_time_stats(times),
        },
        "result": {
            "components": counts[0],
            "labels_checksum": checksums[0],
            "edges_per_sec": n_sym / statistics.mean(times),
            "trials_consistent": consistent,
        },
    }
    print(json.dumps(report, indent=2))
    # trial-consistency contract: exit 2 on mismatch (benchmark.c:275-284)
    return 0 if consistent else 2


def cmd_pagerank(args: argparse.Namespace) -> int:
    spark = get_spark(master=args.master, app_name="pr-cli")
    edges = _load_edges(spark, args.edges)
    t0 = time.monotonic()
    result = pagerank_auto(
        edges, mode=args.mode, alpha=args.alpha, tol=args.tol, max_iter=args.max_iter
    )
    ranks, metrics = result.ranks, result.metrics
    if args.out:
        ranks.write.mode("overwrite").parquet(args.out)
    top = ranks.orderBy(F.desc("rank"), F.asc("vid")).limit(10).collect()
    print(json.dumps({
        "system": _sys_info(spark),
        "mode": result.mode,
        "iterations": len(metrics),
        "final_l1_delta": metrics[-1]["l1_delta"] if metrics else None,
        "wall_s": time.monotonic() - t0,
        "top10": [{"vid": r["vid"], "rank": r["rank"]} for r in top],
    }, indent=2))
    return 0


def cmd_analyze(args: argparse.Namespace) -> int:
    """Directed link-graph analysis over any edge source (round-6 surface):
    scc (component count + checksum), bowtie (region histogram + core),
    anf (N(h) curve + interpolated 90%-effective diameter). Same JSON
    report shape as the cc benchmark command."""
    from .operators.anf import anf, effective_diameter
    from .operators.bowtie import bowtie
    from .operators.scc import strongly_connected_components

    spark = get_spark(master=args.master, app_name=f"{args.op}-cli")
    edges = _load_edges(spark, args.edges)
    t0 = time.monotonic()
    if args.op == "scc":
        labels, metrics = strongly_connected_components(edges)
        if args.out:
            labels.write.mode("overwrite").parquet(args.out)
        # bit_xor(xxhash64(...)) is the repo's overflow-free fingerprint
        # convention (operators/cc.py): vid * 2654435761 + scc overflows
        # bigint past vid ~3.47e9 and ANSI mode (Spark 4 default) would
        # throw ARITHMETIC_OVERFLOW at the 1e11-vertex design point.
        row = labels.agg(
            F.countDistinct("scc").alias("n"),
            F.bit_xor(F.xxhash64("vid", "scc")).alias("ck"),
        ).collect()[0]
        result = {"strongly_connected_components": row["n"],
                  "labels_checksum": row["ck"],
                  "converged": bool(metrics[-1]["converged"])}
    elif args.op == "bowtie":
        regions, metrics = bowtie(edges)
        if args.out:
            regions.write.mode("overwrite").parquet(args.out)
        hist = {r["region"]: r["count"]
                for r in regions.groupBy("region").count().collect()}
        result = {"regions": hist,
                  # empty graph: bowtie() emits no "core" phase entry ->
                  # core_label null instead of a bare-next StopIteration
                  "core_label": next((m["core"] for m in metrics
                                      if m["phase"] == "core"), None),
                  "converged": bool(metrics[-1]["converged"])}
    else:  # anf
        curve_df, metrics = anf(edges, n_trials=args.trials,
                                max_hops=args.hops)
        curve = [v for _, v in
                 sorted((r["hop"], r["n_est"]) for r in curve_df.collect())]
        result = {"n_est_curve": curve,
                  "effective_diameter_90": effective_diameter(curve, q=0.9),
                  "converged": bool(metrics[-1]["converged"])}
    print(json.dumps({
        "system": _sys_info(spark),
        "op": args.op,
        "wall_s": time.monotonic() - t0,
        "result": result,
    }, indent=2))
    return 0


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="pds_hw2_mpi_connected_components_spark")
    p.add_argument("--master", default=None, help="spark master (default local[$SPARK_GRAFT_CPUS])")
    sub = p.add_subparsers(dest="cmd", required=True)

    pi = sub.add_parser("ingest", help="pages parquet -> vertices/edges/degrees parquet")
    pi.add_argument("--pages", required=True)
    pi.add_argument("--out", required=True)
    pi.set_defaults(fn=cmd_ingest)

    pv = sub.add_parser("convert", help=".mtx -> .bin CSC (reference converter analog)")
    pv.add_argument("infile")
    pv.add_argument("outfile")
    pv.set_defaults(fn=cmd_convert)

    pc = sub.add_parser("cc", help="connected components benchmark (reference CLI analog)")
    pc.add_argument("-n", "--n-trials", type=int, default=3)  # default 3, args.c:83-147
    pc.add_argument("--edges", required=True,
                    help="edge source: parquet dir, .mtx, or .bin")
    pc.add_argument("--mode", choices=["auto", "df", "csr", "frontier"], default="df",
                    help="execution mode; auto picks by vertex count (operators/facade.py)")
    pc.set_defaults(fn=cmd_cc)

    pp = sub.add_parser("pagerank")
    pp.add_argument("--edges", required=True,
                    help="edge source: parquet dir, .mtx, or .bin")
    pp.add_argument("--alpha", type=float, default=0.85)
    pp.add_argument("--tol", type=float, default=1e-8)
    pp.add_argument("--max-iter", type=int, default=100)
    pp.add_argument("--mode", choices=["auto", "df", "csr"], default="df",
                    help="execution mode; auto picks by vertex count (operators/facade.py)")
    pp.add_argument("--out", default=None)
    pp.set_defaults(fn=cmd_pagerank)

    pa = sub.add_parser(
        "analyze", help="directed analysis: scc / bowtie / anf")
    pa.add_argument("--edges", required=True,
                    help="edge source: parquet dir, .mtx, or .bin")
    pa.add_argument("--op", choices=["scc", "bowtie", "anf"], required=True)
    pa.add_argument("--trials", type=int, default=32, help="anf: FM trials")
    pa.add_argument("--hops", type=int, default=32, help="anf: max hops")
    pa.add_argument("--out", default=None, help="scc/bowtie: parquet sink")
    pa.set_defaults(fn=cmd_analyze)

    args = p.parse_args(argv)
    try:
        return args.fn(args)
    except (GraphFormatError, FileNotFoundError) as exc:
        # user-input errors: one clear line, no traceback (reference prints
        # perror + message and exits 1, src/error.c)
        print(f"error: {exc}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    sys.exit(main())
