"""Round-4 pipeline-scale scaling evidence (closes VERDICT r3 "What's
wrong" #2): the r3 addendum showed `pipeline_cc` at 0.546 raw / 0.691
normalized and ATTRIBUTED it to small-input per-round fixed costs (the
pipeline's CC leg ran on only 3.76M edges) — an argument, not a
measurement. This tool measures it two ways:

1. The SAME pipeline (pages parquet -> extract links -> build graph -> CC)
   at N_PAGES_R4 = 6x the r3 input, local[2] vs local[8] (the honest 4x
   span, see tools/bench_scaling.py), pinned cores, fresh JVM per run,
   interleaved trials, per-stage MIN. If the attribution is right, the CC
   leg's efficiency must rise toward the standalone `cc_dataframe` curve
   (0.728 raw / 0.922 normalized at 70M sym edges) as the graph grows.
2. A per-round fixed-vs-variable cost fit: each CC round reports
   (edges, sec); a least-squares fit sec = a + b*edges across the rounds of
   both runs makes the Amdahl claim checkable — `a` is the parallelism-
   independent per-round floor (stage barriers + job launches), `b*edges`
   is the part extra cores can shrink.

APPENDS an addendum to BENCH/BASELINE.md (never rewrites — same contract
as tools/bench_scaling_r3.py).

Run: python tools/bench_scaling_r4.py [trials] [n_pages]
Worker: python tools/bench_scaling_r4.py --worker 'local[2]' --n-pages N
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.bench_scaling import (  # noqa: E402
    MASTERS,
    N_COMPONENTS,
    PAGES_PARQUET,
    ensure_pages,
    hardware_probe,
)

N_PAGES_R4 = 6_000_000  # 6x the r3 pipeline input => ~23M directed edges


def worker(master: str, n_pages: int) -> None:
    from pyspark.sql import functions as F

    from pds_hw2_mpi_connected_components_spark.operators.cc import (
        cc_count,
        connected_components,
    )
    from pds_hw2_mpi_connected_components_spark.plans.session import get_spark
    from pds_hw2_mpi_connected_components_spark.sources.graph_build import build_graph

    cpus = int(master.split("[")[1].rstrip("]"))
    spark = get_spark(master=master, app_name=f"scaling-r4-{cpus}",
                      shuffle_partitions=cpus * 2,
                      extra_conf={
                          "spark.driver.memory": "48g",
                          "spark.driver.extraJavaOptions":
                              f"-XX:ParallelGCThreads={max(2, cpus)} -XX:ConcGCThreads=1",
                          # pinned-core local mode: with every core saturated
                          # by long CC stages, the in-JVM executor heartbeat
                          # thread can starve past the 120s default and Spark
                          # kills its own executor (observed at local[2] on
                          # the 6M-page run: "no recent heartbeats: 198s").
                          # Generous timeouts change no measured work.
                          "spark.executor.heartbeatInterval": "60s",
                          "spark.network.timeout": "1200s",
                      })
    t: dict[str, float] = {}
    info: dict = {"master": master, "cpus": cpus, "n_pages": n_pages}

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
    info["cc_rounds"] = [
        {"round": r["round"], "edges": r["edges"], "sec": round(r["sec"], 3)}
        for r in m
    ]

    # direct fixed-floor probe: CC on a 1k-edge graph is ~pure per-round
    # floor (stage barriers + job launches, no data work). If the floor is
    # ~equal at local[2] and local[8], it is the Amdahl term the r3
    # attribution blamed for pipeline_cc's sub-0.8 efficiency.
    tiny = spark.createDataFrame(
        [(i, (i + 1) % 500) for i in range(1000)], "src long, dst long"
    ).localCheckpoint(eager=True)
    t0 = time.monotonic()
    _, m_tiny = connected_components(tiny)
    t["cc_floor_1k_edges"] = time.monotonic() - t0
    info["cc_floor_rounds"] = len(m_tiny)
    info["cc_floor_sec_per_round"] = round(t["cc_floor_1k_edges"] / len(m_tiny), 3)

    info["timings"] = {k: round(v, 3) for k, v in t.items()}
    print(json.dumps(info))
    spark.stop()


def _run_worker(master: str, n_pages: int) -> dict:
    # pin the process tree to exactly N cores (rationale in
    # tools/bench_scaling._run_worker — unpinned local[2] under-reports)
    cpus = int(master.split("[")[1].rstrip("]"))
    cmd = ["taskset", "-c", f"0-{cpus - 1}",
           sys.executable, os.path.abspath(__file__), "--worker", master,
           "--n-pages", str(n_pages)]
    out = subprocess.run(cmd, capture_output=True, text=True,
                         cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        print(out.stdout[-3000:])
        print(out.stderr[-3000:])
        raise SystemExit(f"worker {master} failed")
    return json.loads(lines[-1])


def _fixed_variable_fit(rounds: list[dict]) -> dict:
    """Least-squares sec = a + b*edges over the per-round (edges, sec)
    samples. Returns a (fixed per-round floor, sec) and b (sec per edge)."""
    n = len(rounds)
    if n < 2:
        return {"fixed_sec": None, "sec_per_medge": None}
    xs = [r["edges"] for r in rounds]
    ys = [r["sec"] for r in rounds]
    mx, my = sum(xs) / n, sum(ys) / n
    sxx = sum((x - mx) ** 2 for x in xs)
    # near-constant per-round edge counts make the fit ill-conditioned —
    # the direct cc_floor probe is the primary floor evidence in that case
    if sxx == 0 or (max(xs) - min(xs)) < 0.2 * max(xs):
        return {"fixed_sec": None, "sec_per_medge": None}
    b = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sxx
    a = my - b * mx
    return {"fixed_sec": round(a, 3), "sec_per_medge": round(b * 1e6, 4)}


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("trials", nargs="?", type=int, default=2)
    p.add_argument("n_pages_pos", nargs="?", type=int, default=N_PAGES_R4)
    p.add_argument("--worker", default=None)
    p.add_argument("--n-pages", type=int, default=N_PAGES_R4)
    args = p.parse_args()
    if args.worker:
        worker(args.worker, args.n_pages)
        return

    trials, n_pages = args.trials, args.n_pages_pos
    hw = hardware_probe()
    print(json.dumps({"hardware_probe": hw}), flush=True)
    ensure_pages(n_pages)
    results: dict[str, dict] = {}
    for trial in range(trials):
        for master in MASTERS:
            r = _run_worker(master, n_pages)
            print(json.dumps({"trial": trial, **r}), flush=True)
            if master not in results:
                results[master] = r
            else:
                prev = results[master]
                assert r["pipeline_label_checksum"] == prev["pipeline_label_checksum"]
                for k, v in r["timings"].items():
                    if v < prev["timings"][k]:
                        prev["timings"][k] = v
                        if k == "pipeline_cc":
                            prev["cc_rounds"] = r["cc_rounds"]

    rn, r4n = results[MASTERS[0]], results[MASTERS[1]]
    assert rn["pipeline_label_checksum"] == r4n["pipeline_label_checksum"]
    ceiling = hw["eff_2_to_8"]
    effs, effs_norm, rows = {}, {}, []
    for k in rn["timings"]:
        effs[k] = round((rn["timings"][k] / r4n["timings"][k]) / 4, 3)
        effs_norm[k] = round(effs[k] / ceiling, 3)
        rows.append(
            f"| {k} | {rn['timings'][k]:.2f} | {r4n['timings'][k]:.2f} | "
            f"{rn['timings'][k]/r4n['timings'][k]:.2f}x | **{effs[k]:.3f}** | "
            f"{effs_norm[k]:.3f} |"
        )
    fit_n = _fixed_variable_fit(rn["cc_rounds"])
    fit_4n = _fixed_variable_fit(r4n["cc_rounds"])
    sym_edges = 2 * rn["pipeline_edges"]  # build_graph edges are directed-deduped
    summary = {
        "n_pages": n_pages,
        "pipeline_edges": rn["pipeline_edges"],
        f"efficiency_{MASTERS[0]}_to_{MASTERS[1]}": effs,
        "efficiency_ceiling_normalized": effs_norm,
        "cc_round_fit_n": fit_n,
        "cc_round_fit_4n": fit_4n,
        "hardware_probe": hw,
        "labels_identical_across_parallelism": True,
    }
    print(json.dumps(summary), flush=True)

    round_rows = "\n".join(
        f"| {a['round']} | {a['edges']:,} | {a['sec']:.2f} | {b['sec']:.2f} |"
        for a, b in zip(rn["cc_rounds"], r4n["cc_rounds"])
    )
    md = f"""

## Addendum: round-4 pipeline-scale measurement (VERDICT r3 #2)

The r3 `pipeline_cc` 0.546 attribution (small-input per-round fixed costs)
measured, not argued: the SAME pipeline at {n_pages:,} pages
({rn['pipeline_edges']:,} directed edges — {rn['pipeline_edges'] / 3.76e6:.1f}x
the r3 pipeline graph), {trials} interleaved trials, per-stage MIN, pinned
cores, fresh JVM per run. Hardware probe for this window: {json.dumps(hw)}.

| stage | local[2] s (min) | local[8] s (min) | speedup | raw eff | ceiling-normalized |
|---|---:|---:|---:|---:|---:|
{chr(10).join(rows)}

Per-round CC cost at both levels (MIN-trial rounds; the shrinking star-
contraction edge set exposes the fixed floor):

| round | edges in round | local[2] s | local[8] s |
|---|---:|---:|---:|
{round_rows}

Least-squares sec = fixed + rate * edges across rounds (None when per-round
edge counts are too uniform to condition the fit):
local[2] fixed {fit_n['fixed_sec']}s, {fit_n['sec_per_medge']} s/M-edges;
local[8] fixed {fit_4n['fixed_sec']}s, {fit_4n['sec_per_medge']} s/M-edges.

Direct fixed-floor probe (CC on a 1k-edge graph = pure per-round floor, no
data work): local[2] {rn['cc_floor_sec_per_round']}s/round vs local[8]
{r4n['cc_floor_sec_per_round']}s/round over
{rn['cc_floor_rounds']}/{r4n['cc_floor_rounds']} rounds. A floor that does
not shrink 4x with 4x cores is the Amdahl term the r3 attribution blamed;
the pipeline_cc efficiency above shows what remains of it once the graph is
{rn['pipeline_edges'] / 3.76e6:.1f}x bigger. Label checksums identical
across parallelism levels and trials.
"""
    base = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "BENCH", "BASELINE.md")
    with open(base, "a") as f:
        f.write(md)
    print(f"appended addendum to {base}", flush=True)


if __name__ == "__main__":
    main()
