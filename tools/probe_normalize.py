"""Probe-normalized cross-round bench adjudication (VERDICT r5 task 1's
fallback, made a first-class tool).

Two consecutive rounds ended perf-unadjudicated because the shared host's
CPU quota never sat still long enough for a same-regime comparison. This
tool compares two bench runs ANYWAY by dividing out the regime: the
Spark-free sha256 probe recorded next to every run measures the host's
instantaneous throughput, so

    normalized_ratio(leg) = (median_new / median_old)
                            / (probe_new / probe_old)

cancels a uniform quota shift to first order. It is strictly WEAKER
evidence than a quiet-window pair (the probe can't see memory-bandwidth
or scheduler-jitter asymmetries, and a mid-run regime flip still skews
individual legs — the per-leg trial spread is reported for exactly that
reason) — use it when the probe log proves no quiet window existed, and
say which kind of evidence a number is.

Inputs: any mix of
- driver artifacts (BENCH_r*.json) — parsed whole when possible, else
  recovered from the 2000-char stdout ``tail`` (trials/stddev/probe land
  in the tail even when the medians dict is cut off; medians are then
  recomputed from the trials),
- self-recorded history entries (BENCH/bench_history.jsonl, never
  truncated) — addressed as ``history:<ts_iso>`` or ``latest``.

Usage:
    python tools/probe_normalize.py <new> <old> [--probe-key procs_32]
    python tools/probe_normalize.py latest BENCH_r05.json
Writes BENCH/probe_normalized_<new>_vs_<old>.json and prints a summary.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import statistics
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _balanced(s: str, start: int) -> str | None:
    """The {...} object starting at s[start] (balanced braces), or None."""
    depth = 0
    for i in range(start, len(s)):
        if s[i] == "{":
            depth += 1
        elif s[i] == "}":
            depth -= 1
            if depth == 0:
                return s[start:i + 1]
    return None


def _from_tail(tail: str) -> dict | None:
    """Recover what the truncated driver tail still holds."""
    out: dict = {}
    m = re.search(r'"trials":\s*{', tail)
    if m:
        obj = _balanced(tail, tail.index("{", m.start() + 8))
        if obj:
            try:
                trials = json.loads(obj)
                out["queries"] = {k: round(statistics.median(v), 3)
                                  for k, v in trials.items() if v}
                out["trials"] = trials
            except ValueError:
                pass
    m = re.search(r'"stddev":\s*{', tail)
    if m:
        obj = _balanced(tail, tail.index("{", m.start() + 8))
        if obj:
            try:
                out["stddev"] = json.loads(obj)
            except ValueError:
                pass
    for key, cast in [("sf", str), ("cpus", int),
                      ("probe_procs_8_sec", float),
                      ("probe_procs_32_sec", float),
                      ("probe_deviation", float)]:
        m = re.search(rf'"{key}":\s*"?([0-9.]+)"?', tail)
        if m:
            out[key] = cast(m.group(1))
    m = re.search(r'"window_degraded":\s*(true|false)', tail)
    if m:
        out["window_degraded"] = m.group(1) == "true"
    return out if out.get("queries") else None


def _history_entries() -> list[dict]:
    entries = []
    try:
        with open(os.path.join(HERE, "BENCH", "bench_history.jsonl")) as f:
            for ln in f:
                try:
                    e = json.loads(ln)
                except ValueError:
                    continue
                if isinstance(e.get("result"), dict):
                    entries.append(e)
    except OSError:
        pass
    return entries


def _history_rescue(tail: str) -> tuple[str, dict] | None:
    """r7 (VERDICT r6 #3): a driver artifact whose 2000-char tail truncates
    BEFORE the trials dict cannot be tail-recovered — but bench.py has
    self-recorded every run since r6, so find the history entry that IS
    this run: same sf/cpus and the same probe scalars (the probe lands at
    the very end of the JSON line, so it survives any truncation that
    leaves the tail non-empty)."""
    frag = {}
    for key in ("probe_procs_8_sec", "probe_procs_32_sec", "cc_edges_per_sec"):
        m = re.search(rf'"{key}":\s*([0-9.]+)', tail)
        if m:
            frag[key] = float(m.group(1))
    m = re.search(r'"sf":\s*"?([0-9.]+)"?', tail)
    sf = m.group(1) if m else None
    m = re.search(r'"cpus":\s*([0-9]+)', tail)
    cpus = int(m.group(1)) if m else None
    if not frag:
        return None
    for e in sorted(_history_entries(), key=lambda e: e.get("ts", 0),
                    reverse=True):
        r = e["result"]
        if sf is not None and str(r.get("sf")) != sf:
            continue
        if cpus is not None and r.get("cpus") != cpus:
            continue
        if all(abs(float(r.get(k, -1)) - v) < 1e-9 for k, v in frag.items()):
            return f"history:{e.get('ts_iso')}", r
    return None


def load_run(name: str) -> tuple[str, dict]:
    """Resolve a run by name: 'latest', 'history:<ts prefix>', or a
    BENCH_r*.json / BENCH_latest.json path/basename."""
    if name == "latest" or name.startswith("history:"):
        want = None if name == "latest" else name.split(":", 1)[1]
        entries = _history_entries()
        if want is not None:
            entries = [e for e in entries
                       if str(e.get("ts_iso", "")).startswith(want)]
        if not entries:
            raise SystemExit(f"no history entry matches {name!r}")
        e = max(entries, key=lambda e: e.get("ts", 0))
        return f"history:{e.get('ts_iso')}", e["result"]
    path = name if os.path.exists(name) else os.path.join(HERE, name)
    with open(path) as f:
        d = json.load(f)
    if isinstance(d.get("queries"), dict):
        return os.path.basename(path), d
    # BENCH_latest.json wrapper: {"ts": ..., "git": ..., "result": {...}}
    if isinstance(d.get("result"), dict) and \
            isinstance(d["result"].get("queries"), dict):
        return os.path.basename(path), d["result"]
    if isinstance(d.get("parsed"), dict) and d["parsed"] is not None:
        return os.path.basename(path), d["parsed"]
    rec = _from_tail(d.get("tail", ""))
    if rec is None:
        hit = _history_rescue(d.get("tail", ""))
        if hit is not None:
            name_h, r = hit
            return f"{os.path.basename(path)}~{name_h}", r
        raise SystemExit(f"{name}: neither parseable nor tail-recoverable")
    rec["recovered_from_tail"] = True
    return os.path.basename(path), rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("new")
    ap.add_argument("old")
    ap.add_argument("--probe-key", default=None,
                    help="probe dimension to normalize by (procs_8 or "
                         "procs_32); default: procs_<cpus> of the runs")
    args = ap.parse_args()

    name_a, a = load_run(args.new)
    name_b, b = load_run(args.old)
    if str(a.get("sf")) != str(b.get("sf")) or a.get("cpus") != b.get("cpus"):
        raise SystemExit(
            f"not comparable: {name_a} is sf={a.get('sf')}/cpus={a.get('cpus')}"
            f", {name_b} is sf={b.get('sf')}/cpus={b.get('cpus')}")
    pk = args.probe_key or f"procs_{a.get('cpus', 32)}"
    key = f"probe_{pk}_sec"
    if key not in a or key not in b:
        raise SystemExit(f"missing {key} in one of the runs")
    factor = a[key] / b[key]

    legs = []
    for q in sorted(set(a["queries"]) & set(b["queries"])):
        raw = a["queries"][q] / b["queries"][q]
        norm = raw / factor
        spread = max(a.get("stddev", {}).get(q, 0.0),
                     b.get("stddev", {}).get(q, 0.0))
        band = 3 * max(spread, 0.05) / b["queries"][q]
        legs.append({"query": q, "old": b["queries"][q],
                     "new": a["queries"][q], "raw_ratio": round(raw, 3),
                     "normalized_ratio": round(norm, 3),
                     "noise_band_ratio": round(1 + band, 3),
                     "flag": ("regression" if norm > max(1.25, 1 + band)
                              else "improvement" if norm < min(0.8, 1 - band)
                              else "within-noise")})
    out = {
        "new": {"name": name_a, "probe": a[key],
                "window_degraded": a.get("window_degraded"),
                "probe_deviation": a.get("probe_deviation")},
        "old": {"name": name_b, "probe": b[key],
                "window_degraded": b.get("window_degraded"),
                "probe_deviation": b.get("probe_deviation")},
        "probe_key": key, "probe_factor": round(factor, 4),
        "evidence_class": "probe-normalized (weaker than quiet-window; "
                          "see module docstring)",
        "legs": legs,
        "flagged": [l["query"] for l in legs if l["flag"] != "within-noise"],
    }
    dst = os.path.join(
        HERE, "BENCH",
        f"probe_normalized_{re.sub(r'[^A-Za-z0-9_.-]', '_', name_a)}"
        f"_vs_{re.sub(r'[^A-Za-z0-9_.-]', '_', name_b)}.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    for leg in legs:
        print(f"{leg['query']:32s} {leg['old']:8.3f} -> {leg['new']:8.3f} "
              f"raw {leg['raw_ratio']:6.3f}  norm {leg['normalized_ratio']:6.3f}"
              f"  [{leg['flag']}]")
    print(f"\nprobe factor ({key}): {out['probe_factor']}  -> {dst}")


if __name__ == "__main__":
    main()
