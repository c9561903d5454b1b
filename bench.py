"""Per-round benchmark harness.

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
on local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {name: sec}, ...}

Protocol (round 3 — regression-proof): the WHOLE suite runs
$SPARK_GRAFT_TRIALS times (default 3), interleaved at suite level so host
noise hits every leg, not one; per-leg medians go into "queries" (and sum
into "value"), with raw per-trial times in "trials" and stddev in "stddev"
so a cross-round delta can be adjudicated against within-run spread instead
of a single shot. Mirrors the reference's trialed protocol
(/root/reference/src/benchmark.c:50-87,242-288: -n trials + min/mean/stddev).

A Spark-free CPU probe (fixed sha256 work over 8 vs 32 processes, the
tools/bench_scaling.py hardware_probe) runs BEFORE the JVM starts and is
embedded in the output: this VM is a shared host whose effective CPU quota
varies run to run, and the probe lets a reader normalize cross-round
comparisons. CC throughput is edges/sec (reference definition: nnz /
mean_time, benchmark.c:308 — our nnz = deduped directed edge count of the
symmetrized graph, documented in BASELINE.md).

The scaling-efficiency evidence (same job at local[8] vs local[32]) lives in
tools/bench_scaling.py -> BENCH/BASELINE.md; this file is the per-round
fixed-parallelism probe.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from pds_hw2_mpi_connected_components_spark.operators.cc import connected_components, cc_count  # noqa: E402
from pds_hw2_mpi_connected_components_spark.operators.csr import (  # noqa: E402
    connected_components_csr,
    pagerank_csr,
)
from pds_hw2_mpi_connected_components_spark.operators.dedup import (  # noqa: E402
    exact_duplicates,
    jaccard_pairs,
    minhash_lsh_candidates,
    minhash_signatures,
)
from pds_hw2_mpi_connected_components_spark.operators.degrees import degree_table  # noqa: E402
from pds_hw2_mpi_connected_components_spark.operators.frontier import (  # noqa: E402
    connected_components_frontier,
)
from pds_hw2_mpi_connected_components_spark.operators.hits import hits  # noqa: E402
from pds_hw2_mpi_connected_components_spark.operators.kcore import coreness, k_core  # noqa: E402
from pds_hw2_mpi_connected_components_spark.operators.labelprop import label_propagation  # noqa: E402
from pds_hw2_mpi_connected_components_spark.operators.pagerank import pagerank  # noqa: E402
from pds_hw2_mpi_connected_components_spark.operators.anf import anf  # noqa: E402
from pds_hw2_mpi_connected_components_spark.operators.bowtie import bowtie  # noqa: E402
from pds_hw2_mpi_connected_components_spark.operators.scc import (  # noqa: E402
    strongly_connected_components,
)
from pds_hw2_mpi_connected_components_spark.operators.similarity import (  # noqa: E402
    ann_topk_lsh,
    cosine_topk,
)
from pds_hw2_mpi_connected_components_spark.operators.triangles import (  # noqa: E402
    clustering_coefficient,
    triangle_count,
)
from pds_hw2_mpi_connected_components_spark.plans.session import get_spark  # noqa: E402
from pds_hw2_mpi_connected_components_spark.sources.datagen import generate_pages  # noqa: E402
from pds_hw2_mpi_connected_components_spark.sources.doc_edges import (  # noqa: E402
    doc_edges_blocked,
    doc_edges_global,
    doc_vertices,
)
from pds_hw2_mpi_connected_components_spark.sources.graph_build import build_graph, symmetrize  # noqa: E402
from pds_hw2_mpi_connected_components_spark.plans.flat import flat_checkpoint


#: Quiet-window reference band for the pre-JVM CPU probe (the round-3
#: artifact, the last bench known to have run on a stable quota). A probe
#: outside PROBE_TOL of this band means the host quota is oscillating and
#: per-leg medians are NOT comparable across rounds (round-4 lesson: the
#: whole r4 suite ran 1.3-2.1x slow in such a window and its numbers had to
#: be discarded).
PROBE_BAND = {"probe_procs_8_sec": 0.64, "probe_procs_32_sec": 0.33}
PROBE_TOL = 0.20  # fractional deviation that marks a window degraded


def cpu_probe() -> dict:
    """Spark-free shared-host quota probe: delegates to the repo's single
    probe implementation (tools/bench_scaling.hardware_probe) with a
    trimmed 8-vs-32 workload. MUST run before the JVM exists (fork
    safety). Keys keep the probe_ prefix for artifact continuity."""
    from tools.bench_scaling import hardware_probe

    hw = hardware_probe(procs=(8, 32), units=96, unit_work=100_000)
    return {
        "probe_procs_8_sec": hw["procs_8_sec"],
        "probe_procs_32_sec": hw["procs_32_sec"],
        "probe_eff_8_to_32": hw["eff_8_to_32"],
    }


def probe_deviation(probe: dict) -> float:
    """Max fractional deviation of the probe legs from the quiet-window
    band (slower OR faster counts: any quota shift breaks comparability)."""
    devs = [
        abs(probe[k] / ref - 1.0)
        for k, ref in PROBE_BAND.items()
        if probe.get(k)
    ]
    return max(devs) if devs else float("inf")


def gated_probe(max_retries: int | None = None, retry_sleep: float = 75.0) -> dict:
    """Window-aware probe (round-5 protocol, VERDICT r4 #1): probe the host
    before the JVM starts; if the window deviates > PROBE_TOL from the
    quiet-window band, sleep and retry up to $SPARK_GRAFT_PROBE_RETRIES
    (default 8 — round 6 raised it from 2 after two consecutive rounds of
    one-shot attempts lost to the host's quota schedule; worst case ~10 min
    of waiting buys a comparable artifact) times, then run anyway but stamp
    the artifact ``window_degraded: true`` — a degraded artifact's per-leg
    medians must not be compared across rounds, and the regression gate of
    FUTURE rounds skips it as a baseline."""
    if max_retries is None:
        max_retries = int(os.environ.get("SPARK_GRAFT_PROBE_RETRIES", "8"))
    attempt = 0
    while True:
        probe = cpu_probe()
        dev = probe_deviation(probe)
        degraded = dev > PROBE_TOL
        if not degraded or attempt >= max_retries:
            return {
                **probe,
                "probe_deviation": round(dev, 3),
                "probe_attempts": attempt + 1,
                "window_degraded": degraded,
            }
        attempt += 1
        time.sleep(retry_sleep)


def run_suite(spark, sf_dir: str, cpus: int, timed) -> dict:
    """One full pass over every headline leg. ``timed(name, fn)`` records a
    leg; returns pass-invariant graph stats for the throughput extras."""
    # -- flagship end-to-end: pages -> extract -> graph -> CC ------------
    n_pages = 30_000
    pages = generate_pages(spark, n_pages, n_components=16, num_partitions=cpus)
    pages = timed("pipeline_pages_materialize", lambda: pages.transform(flat_checkpoint))

    def _build():
        g = build_graph(pages)
        g.edges.transform(flat_checkpoint)
        return g

    g = timed("pipeline_build_graph", _build)
    edges = g.edges.transform(flat_checkpoint)
    n_edges_sym = symmetrize(edges).count()

    def _cc():
        labels, m = connected_components(edges, vertices=g.vertices.select("vid"))
        assert cc_count(labels) == 16
        return m

    cc_metrics = timed("pipeline_cc", _cc)

    # -- document-graph queries at the sf dir ----------------------------
    eg = doc_edges_global(spark, sf_dir).transform(flat_checkpoint)
    eb = doc_edges_blocked(spark, sf_dir).transform(flat_checkpoint)
    verts = doc_vertices(spark, sf_dir)

    timed("doc_cc_global", lambda: connected_components(eg, vertices=verts)[0].count())
    timed("doc_cc_global_csr", lambda: connected_components_csr(eg, vertices=verts)[0].count())
    timed("doc_cc_global_frontier", lambda: connected_components_frontier(
        eg, vertices=verts, broadcast_threshold=100_000)[0].count())
    timed("doc_pagerank_20it", lambda: pagerank(eg, vertices=verts, tol=0.0, max_iter=20)[0].count())
    timed("doc_pagerank_20it_csr", lambda: pagerank_csr(eg, vertices=verts, tol=0.0, max_iter=20)[0].count())
    timed("doc_labelprop_5it", lambda: label_propagation(symmetrize(eb), vertices=verts, max_iter=5)[0].count())
    timed("doc_triangles", lambda: triangle_count(eb))
    timed("doc_degrees", lambda: degree_table(eg).count())
    timed("doc_hits_10it", lambda: hits(eg, vertices=verts, tol=0.0, max_iter=10)[0].count())
    timed("doc_kcore3", lambda: k_core(eb, k=3)[0].count())
    timed("doc_coreness", lambda: coreness(eb)[0].count())
    timed("doc_scc", lambda: strongly_connected_components(
        eb, vertices=verts)[0].count())
    timed("doc_bowtie", lambda: bowtie(eb, vertices=verts)[0].count())
    timed("doc_anf_16t", lambda: anf(
        eg, vertices=verts, n_trials=16, max_hops=8)[0].count())
    timed("doc_clustering", lambda: clustering_coefficient(eb).count())

    # -- training-data pipeline ops --------------------------------------
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    timed("dedup_exact", lambda: exact_duplicates(docs).count())
    timed("minhash_signatures", lambda: minhash_signatures(docs).count())
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 16).select(F.col("vec_id").alias("id"), "embedding")
    c = emb.select(F.col("vec_id").alias("id"), "embedding")
    timed("ann_topk", lambda: cosine_topk(q, c, k=10).count())
    timed("ann_topk_lsh", lambda: ann_topk_lsh(
        emb, emb.where(F.col("vec_id") < 16).select("vec_id"), k=10, n_planes=6).count())

    # -- skew guard: exact Jaccard on a corpus with a universal hot token --
    # Every doc shares token "the"; without the max_df cutoff the pair join
    # on that key alone is n^2/2 rows (~2e8 at n=20k: effectively a hang).
    # Runs with DEFAULT args since round 3: max_df is bounded by default, so
    # this leg proves the guard protects a naive caller, not just an expert.
    n_hot = 20_000
    hot = spark.range(n_hot).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("the common filler u"), F.col("id").cast("string"),
                 F.lit(" v"), (F.col("id") * 7 % 997).cast("string")).alias("text"),
        (F.col("id") % 8).cast("string").alias("source"),
    ).transform(flat_checkpoint)
    timed("jaccard_hot20k", lambda: jaccard_pairs(hot, threshold=0.3).count())

    # -- skew guard #2: LSH hot bucket. 20k near-identical docs collapse
    # into ONE band bucket; the within-bucket self-join would be ~2e8 pairs
    # (minutes-to-hang). Default max_bucket drops the degenerate bucket, so
    # this leg completes in seconds with DEFAULT args — the bucket-guard
    # analog of jaccard_hot20k.
    degen = spark.range(n_hot).select(
        F.col("id").alias("doc_id"), F.lit("boilerplate stub page").alias("text")
    ).transform(flat_checkpoint)
    timed("lsh_hot20k", lambda: minhash_lsh_candidates(degen).count())

    # -- relational legs ---------------------------------------------------
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    timed("tpch_q1", lambda: li.groupBy("l_returnflag", "l_linestatus")
          .agg(F.sum("l_quantity"), F.sum("l_extendedprice"), F.count("*")).collect())

    return {"cc_sym_edges": n_edges_sym, "cc_rounds": len(cc_metrics)}


def _load_bench_artifact(path: str) -> dict | None:
    """Best-effort parse of a driver-recorded BENCH_r*.json: the driver
    wraps our JSON line in {"parsed": ...}; when its own parse failed
    (parsed: null — the r4 artifact), recover the line from "tail"."""
    try:
        with open(path) as f:
            raw = json.load(f)
    except (OSError, ValueError):
        return None
    if not isinstance(raw, dict):
        return None
    prev = raw.get("parsed", raw)
    if isinstance(prev, dict):
        return prev
    tail = raw.get("tail", "")
    start = tail.find('{"metric"')
    if start < 0:
        return None
    try:
        out = json.loads(tail[start:])
        return out if isinstance(out, dict) else None
    except ValueError:
        return None


def _history_candidates(here: str) -> list[tuple[str, dict]]:
    """Self-recorded full results (BENCH/bench_history.jsonl, newest first).

    Round-6 fix for the ADVICE finding on _load_bench_artifact: the driver
    records only the last 2000 chars of stdout, and the full JSON line
    outgrew that in round 5 (BENCH_r05.json has parsed:null and no
    recoverable tail), so relying on driver artifacts alone permanently
    pins the gate's baseline at r3. bench.py now records every run itself
    (see ``record_run``) and the gate prefers those — they are never
    truncated."""
    path = os.path.join(here, "BENCH", "bench_history.jsonl")
    out: list[tuple[str, dict]] = []
    try:
        with open(path) as f:
            for ln in f:
                try:
                    e = json.loads(ln)
                except ValueError:
                    continue
                if isinstance(e, dict) and isinstance(e.get("result"), dict):
                    name = f"bench_history@{e.get('ts_iso', e.get('ts', '?'))}"
                    out.append((name, e))
    except OSError:
        pass
    out.sort(key=lambda t: t[1].get("ts", 0), reverse=True)
    return [(name, e["result"]) for name, e in out]


def record_run(here: str, result: dict) -> None:
    """Persist the full result dict where the driver's 2000-char stdout
    tail cannot lose it: append to BENCH/bench_history.jsonl (the gate's
    preferred baseline source) and overwrite BENCH_latest.json (human
    entry point). Best-effort — a read-only checkout must not break the
    bench output line."""
    import datetime
    import subprocess

    entry = {"ts": time.time(),
             "ts_iso": datetime.datetime.now(datetime.timezone.utc).isoformat(
                 timespec="seconds"),
             "result": result}
    try:
        entry["git"] = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"], capture_output=True,
            text=True, cwd=here, timeout=10).stdout.strip() or None
    except Exception:
        entry["git"] = None
    try:
        os.makedirs(os.path.join(here, "BENCH"), exist_ok=True)
        with open(os.path.join(here, "BENCH", "bench_history.jsonl"), "a") as f:
            f.write(json.dumps(entry) + "\n")
        with open(os.path.join(here, "BENCH_latest.json"), "w") as f:
            json.dump(entry, f, indent=1)
    except OSError:
        pass


def regression_gate(queries: dict, stddev: dict, sf: str, cpus: int) -> dict:
    """Cross-round regression adjudication (benchmark.c:275-284's trial
    consistency made round-over-round): compare each leg's median to the
    newest COMPARABLE, QUIET-WINDOW prior run — self-recorded history
    entries first (full dicts, never truncated), then driver-recorded
    BENCH_r*.json artifacts. Artifacts from a degraded host window
    (window_degraded, or a recorded probe outside the PROBE_TOL band: the
    r4 case) are skipped as baselines, because their uniform inflation
    would mask real regressions AND flag phantom improvements. A leg
    regresses only if it is BOTH >25% slower AND outside 3x the larger of
    the two runs' stddevs (floored at 0.05s) — the double condition is the
    shared-host noise band established in round 3. Skips silently when no
    comparable artifact exists."""
    import glob

    here = os.path.dirname(os.path.abspath(__file__))
    skipped = []
    candidates = _history_candidates(here)
    candidates += [
        (os.path.basename(p), _load_bench_artifact(p))
        for p in sorted(glob.glob(os.path.join(here, "BENCH_r*.json")), reverse=True)
    ]
    for name, prev in candidates:
        if prev is None:
            skipped.append({"artifact": name, "why": "unparseable"})
            continue
        if str(prev.get("sf")) != str(sf) or int(prev.get("cpus", -1)) != cpus:
            skipped.append({"artifact": name, "why": "sf/cpus differ"})
            continue
        if not any(k in prev for k in PROBE_BAND):
            skipped.append({"artifact": name, "why": "no probe recorded"})
            continue
        if prev.get("window_degraded") or probe_deviation(prev) > PROBE_TOL:
            skipped.append({"artifact": name, "why": "degraded host window"})
            continue
        pq, ps = prev.get("queries", {}), prev.get("stddev", {})
        regs = []
        for k, cur in queries.items():
            if k not in pq:
                continue
            band = 3 * max(ps.get(k, 0.0), stddev.get(k, 0.0), 0.05)
            if cur > pq[k] * 1.25 and cur - pq[k] > band:
                regs.append({"query": k, "prev": pq[k], "cur": cur,
                             "band": round(band, 3)})
        return {"baseline_bench": name, "regressions": regs,
                "baseline_skipped": skipped}
    return {"baseline_bench": None, "regressions": [],
            "baseline_skipped": skipped}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_trials = max(1, int(os.environ.get("SPARK_GRAFT_TRIALS", "3")))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    probe = gated_probe()  # before the JVM: fork-safe, measures the host bare,
    # and retries/flags when the quota window is degraded (round-5 protocol)

    spark = get_spark(master=f"local[{cpus}]", app_name="bench",
                      shuffle_partitions=max(8, cpus))
    trials: dict[str, list[float]] = {}
    stats: dict = {}
    for _ in range(n_trials):
        def timed(name: str, fn):
            t0 = time.monotonic()
            out = fn()
            trials.setdefault(name, []).append(round(time.monotonic() - t0, 3))
            return out

        stats = run_suite(spark, sf_dir, cpus, timed)
        spark.catalog.clearCache()

    queries = {k: round(statistics.median(v), 3) for k, v in trials.items()}
    stddev = {
        k: round(statistics.stdev(v), 3) if len(v) > 1 else 0.0
        for k, v in trials.items()
    }
    total = round(sum(queries.values()), 3)
    result = {
        "metric": "headline_suite_wall_sec",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "trials": trials,
        "stddev": stddev,
        "n_trials": n_trials,
        "sf": sf,
        "cpus": cpus,
        "cc_edges_per_sec": round(stats["cc_sym_edges"] / queries["pipeline_cc"], 1),
        "cc_rounds": stats["cc_rounds"],
        "cc_sym_edges": stats["cc_sym_edges"],
        **regression_gate(queries, stddev, sf, cpus),  # gate runs BEFORE this
        # run is recorded, so it never compares a run against itself
        **probe,
    }
    record_run(os.path.dirname(os.path.abspath(__file__)), result)
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()
