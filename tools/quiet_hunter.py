"""Opportunistic quiet-window scheduler for the round-6 performance evidence.

Rounds 4 and 5 both tried to land clean-window benchmarks with ONE-SHOT
attempts at an arbitrary time and lost to the shared host's quota schedule
(r5: 4/4 scaling windows rejected, BENCH_r05.json stamped degraded). This
tool inverts the strategy (VERDICT r5 task 1): run for hours, probing the
host with the cheap Spark-free sha256 probe every --interval seconds, and
the MOMENT the probe sits inside the r3 quiet band, fire the next pending
evidence job. Every probe (quiet or not) is appended to
BENCH/hunter_r6_probes.jsonl — if the host simply never quiets, that log IS
the evidence.

Priority-ordered jobs, each with an on-disk done-check so the tool can be
killed and relaunched freely:

1. ``bench``      — bench.py at sf0.1/local[32]; done when
   BENCH/bench_history.jsonl gains an entry with window_degraded false at
   that shape (bench.py records every run there itself).
2. ``scaling``    — tools/bench_scaling_r5.py --tag r6 --settle-sleep 30
   (pre/mid/post-bracketed local[2]-vs-local[8] pair); done when
   BENCH/scaling_results_r6.json exists.
3. ``throughput`` — tools/bench_throughput.py (absolute edges/sec refresh,
   VERDICT r5 task 6); done when BENCH/throughput_r6.json exists (written
   here from the tool's JSON line, plus bracketing probes).

Coordination with an interactive session sharing the box:
- if /tmp/spark_graft_selfload.lock exists (the session is running its own
  heavy work), the hunter neither probes nor fires;
- while firing a job the hunter holds /tmp/spark_graft_hunter_running.lock
  so the session can wait instead of colliding.

Run: nohup python tools/quiet_hunter.py >> BENCH/hunter_r6.log 2>&1 &
"""

from __future__ import annotations

import argparse
import datetime
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

from tools.bench_scaling import hardware_probe  # noqa: E402

SESSION_LOCK = "/tmp/spark_graft_selfload.lock"
HUNTER_LOCK = "/tmp/spark_graft_hunter_running.lock"
PROBES_LOG = os.path.join(HERE, "BENCH", "hunter_r6_probes.jsonl")

#: bench.py's quiet band (r3 artifact) for the cheap 8/32 probe; the scaling
#: tool re-checks its own fuller band (incl. procs_2) before committing.
BAND = {"procs_8_sec": 0.64, "procs_32_sec": 0.33}
TOL = 0.20


def quick_probe() -> tuple[dict, float]:
    p = hardware_probe(procs=(8, 32), units=96, unit_work=100_000)
    dev = max(abs(p[k] / ref - 1.0) for k, ref in BAND.items())
    return p, round(dev, 3)


def log_probe(rec: dict) -> None:
    rec["ts"] = time.time()
    rec["ts_iso"] = datetime.datetime.now(datetime.timezone.utc).isoformat(
        timespec="seconds")
    with open(PROBES_LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")


# ---------------------------------------------------------------------------
# jobs
# ---------------------------------------------------------------------------

def bench_done() -> bool:
    path = os.path.join(HERE, "BENCH", "bench_history.jsonl")
    try:
        with open(path) as f:
            for ln in f:
                try:
                    e = json.loads(ln)
                except ValueError:
                    continue
                r = e.get("result", {})
                if (r.get("window_degraded") is False
                        and str(r.get("sf")) == "0.1"
                        and int(r.get("cpus", 0)) == 32):
                    return True
    except OSError:
        pass
    return False


def run_bench() -> None:
    env = {**os.environ,
           "SPARK_GRAFT_SF_DIR": "/root/testdata/sf0.1",
           "SPARK_GRAFT_CPUS": "32",
           # the hunter already gated the window; one in-bench retry only
           "SPARK_GRAFT_PROBE_RETRIES": "1"}
    with open(os.path.join(HERE, "BENCH", "hunter_r6_bench.log"), "a") as log:
        log.write(f"\n=== bench fired {datetime.datetime.now()} ===\n")
        log.flush()
        subprocess.run([sys.executable, os.path.join(HERE, "bench.py")],
                       stdout=log, stderr=log, env=env, cwd=HERE)


def scaling_done() -> bool:
    return os.path.exists(os.path.join(HERE, "BENCH", "scaling_results_r6.json"))


def run_scaling() -> None:
    # window_mode=stability: the scaling RATIO only needs the regime to
    # hold STILL across the pair (the tool's three bracketing probes must
    # mutually agree within --stability-tol, default 25% since 699d84c);
    # the host's idle floor has drifted off the absolute r3 band (probes
    # log), which a ratio doesn't care about.
    with open(os.path.join(HERE, "BENCH", "hunter_r6_scaling.log"), "a") as log:
        log.write(f"\n=== scaling fired {datetime.datetime.now()} ===\n")
        log.flush()
        subprocess.run(
            [sys.executable, os.path.join(HERE, "tools", "bench_scaling_r5.py"),
             "--tag", "r6", "--max-attempts", "1", "--settle-sleep", "30",
             "--window-mode", "stability"],
            stdout=log, stderr=log, cwd=HERE)


def throughput_done() -> bool:
    return os.path.exists(os.path.join(HERE, "BENCH", "throughput_r6.json"))


def run_throughput() -> None:
    p_pre, dev_pre = quick_probe()
    logpath = os.path.join(HERE, "BENCH", "hunter_r6_throughput.log")
    with open(logpath, "a") as log:
        log.write(f"\n=== throughput fired {datetime.datetime.now()} ===\n")
        log.flush()
        out = subprocess.run(
            [sys.executable, os.path.join(HERE, "tools", "bench_throughput.py")],
            capture_output=True, text=True, cwd=HERE)
        log.write(out.stdout)
        log.write(out.stderr[-5000:])
    lines = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    if not lines:
        return  # failed; will retry in a later window
    p_post, dev_post = quick_probe()
    result = {"result": json.loads(lines[-1]),
              "probe_pre": {**p_pre, "dev": dev_pre},
              "probe_post": {**p_post, "dev": dev_post},
              "window_degraded": max(dev_pre, dev_post) > TOL,
              "ts_iso": datetime.datetime.now(datetime.timezone.utc).isoformat(
                  timespec="seconds")}
    # keep only a CLEAN-bracketed run as the done-artifact; a degraded one
    # still has its raw line in the log for later inspection
    if not result["window_degraded"]:
        with open(os.path.join(HERE, "BENCH", "throughput_r6.json"), "w") as f:
            json.dump(result, f, indent=1)


#: (name, done-check, runner, max probe deviation to fire). bench and
#: throughput need a band-quiet window (their ABSOLUTE numbers are the
#: artifact); scaling self-brackets stability, so any non-storm window
#: (dev <= 0.6) is worth an attempt.
JOBS = [("bench", bench_done, run_bench, TOL),
        ("scaling", scaling_done, run_scaling, 0.6),
        ("throughput", throughput_done, run_throughput, TOL)]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--interval", type=float, default=150.0,
                    help="seconds between probes while the host is busy")
    ap.add_argument("--max-hours", type=float, default=5.0)
    args = ap.parse_args()

    os.makedirs(os.path.join(HERE, "BENCH"), exist_ok=True)
    deadline = time.monotonic() + args.max_hours * 3600
    print(json.dumps({"hunter": "start", "interval": args.interval,
                      "max_hours": args.max_hours}), flush=True)
    while time.monotonic() < deadline:
        pending = [(n, d, r, g) for n, d, r, g in JOBS if not d()]
        if not pending:
            log_probe({"event": "all jobs done"})
            print(json.dumps({"hunter": "done"}), flush=True)
            return
        if os.path.exists(SESSION_LOCK):
            log_probe({"event": "session busy, skipped"})
            time.sleep(args.interval)
            continue
        p, dev = quick_probe()
        firable = [(n, r) for n, _, r, gate in pending if dev <= gate]
        quiet = bool(firable)
        rec = {"probe": p, "dev": dev, "quiet": quiet,
               "pending": [n for n, _, _, _ in pending]}
        if quiet:
            name, run = firable[0]
            rec["fired"] = name
            log_probe(rec)
            print(json.dumps(rec), flush=True)
            open(HUNTER_LOCK, "w").write(name)
            try:
                t0 = time.monotonic()
                run()
                log_probe({"event": f"{name} finished",
                           "sec": round(time.monotonic() - t0, 1)})
            finally:
                try:
                    os.remove(HUNTER_LOCK)
                except OSError:
                    pass
            time.sleep(10)  # let the JVM teardown settle before re-probing
        else:
            log_probe(rec)
            time.sleep(args.interval)
    left = [n for n, d, _, _ in JOBS if not d()]
    log_probe({"event": "deadline reached", "pending": left})
    print(json.dumps({"hunter": "deadline", "pending": left}), flush=True)


if __name__ == "__main__":
    main()
