"""tools/probe_normalize input-form coverage (r7; VERDICT r6 #3).

The tool exists to rescue degraded/truncated bench artifacts, so it must
accept every artifact form the repo actually produces:

1. a plain bench result dict (``{"queries": ...}``),
2. a driver artifact with a parsed dict (``{"parsed": {...}}``),
3. the BENCH_latest.json wrapper (``{"git", "ts", "result": {...}}``),
4. a driver artifact whose 2000-char tail truncates BEFORE the trials
   dict — unrecoverable from the tail alone, rescued by matching the
   tail's probe scalars against BENCH/bench_history.jsonl.
"""

from __future__ import annotations

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools import probe_normalize  # noqa: E402


RESULT = {
    "metric": "headline_suite_wall_sec", "value": 10.0, "unit": "sec",
    "queries": {"leg_a": 2.0, "leg_b": 8.0},
    "trials": {"leg_a": [2.0, 2.1], "leg_b": [8.0, 7.9]},
    "stddev": {"leg_a": 0.05, "leg_b": 0.05},
    "sf": "0.1", "cpus": 32,
    "cc_edges_per_sec": 12345.6,
    "probe_procs_8_sec": 0.64, "probe_procs_32_sec": 0.32,
    "probe_deviation": 0.05, "window_degraded": False,
}


@pytest.fixture()
def repo(tmp_path, monkeypatch):
    monkeypatch.setattr(probe_normalize, "HERE", str(tmp_path))
    os.makedirs(tmp_path / "BENCH", exist_ok=True)
    with open(tmp_path / "BENCH" / "bench_history.jsonl", "w") as f:
        f.write(json.dumps({"ts": 1.0, "ts_iso": "2026-08-21T00:00:00+00:00",
                            "result": RESULT}) + "\n")
    return tmp_path


def test_plain_result_dict(repo):
    p = repo / "plain.json"
    p.write_text(json.dumps(RESULT))
    name, d = probe_normalize.load_run(str(p))
    assert d["queries"] == RESULT["queries"]


def test_driver_parsed_wrapper(repo):
    p = repo / "BENCH_rX.json"
    p.write_text(json.dumps({"rc": 0, "parsed": RESULT, "tail": "..."}))
    name, d = probe_normalize.load_run(str(p))
    assert d["queries"] == RESULT["queries"]


def test_latest_wrapper(repo):
    p = repo / "BENCH_latest.json"
    p.write_text(json.dumps({"ts": 1.0, "git": "abc", "result": RESULT}))
    name, d = probe_normalize.load_run(str(p))
    assert d["queries"] == RESULT["queries"]


def test_truncated_tail_rescued_from_history(repo):
    # tail cut before the trials dict: only the trailing scalars survive
    tail = ('..., "cc_edges_per_sec": 12345.6, "sf": "0.1", "cpus": 32, '
            '"probe_procs_8_sec": 0.64, "probe_procs_32_sec": 0.32, '
            '"window_degraded": false}')
    p = repo / "BENCH_rY.json"
    p.write_text(json.dumps({"rc": 0, "parsed": None, "tail": tail}))
    name, d = probe_normalize.load_run(str(p))
    assert "history:" in name
    assert d["queries"] == RESULT["queries"]


def test_unrescuable_is_loud(repo):
    p = repo / "BENCH_rZ.json"
    p.write_text(json.dumps({"rc": 0, "parsed": None, "tail": "garbage"}))
    with pytest.raises(SystemExit, match="neither parseable"):
        probe_normalize.load_run(str(p))
