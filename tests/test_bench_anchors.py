"""bench.py helper mechanics (no Spark): the multi-round anchor table
and its source-preference rules (VERDICT r6 #4 — a round with a
complete builder-side BENCH_LOCAL artifact must never be scraped out
of the driver wrapper's truncated tail)."""

from __future__ import annotations

import importlib.util
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

spec = importlib.util.spec_from_file_location("bench", str(REPO / "bench.py"))
bench = importlib.util.module_from_spec(spec)
sys.modules["bench"] = bench
spec.loader.exec_module(bench)


def _write(tmp_path, name, payload):
    (tmp_path / name).write_text(json.dumps(payload))


def test_local_artifact_preferred_over_wrapper(tmp_path, monkeypatch):
    """When a round has BOTH a driver wrapper and a builder-side
    BENCH_LOCAL artifact, only the local one contributes (one source
    per round) — here the wrapper carries a bogus tail value that
    would poison the min if both were read."""
    _write(tmp_path, "BENCH_r01.json",
           {"sf": "0.1", "parsed": None,
            "tail": '"queries": {"q": 0.0001}, "sf": 0.1}'})
    _write(tmp_path, "BENCH_LOCAL_r01.json",
           {"sf": 0.1, "queries": {"q": 2.0}})
    _write(tmp_path, "BENCH_r02.json",
           {"sf": 0.1, "parsed": {"sf": 0.1, "queries": {"q": 3.0}}})
    monkeypatch.setattr(bench.os.path, "dirname", lambda _: str(tmp_path))
    anchors = bench._anchor_mins("0.1")
    assert anchors == {"q": 2.0}  # min(2.0, 3.0); 0.0001 never read


def test_anchor_window_bounds_history(tmp_path, monkeypatch):
    """Only the LAST `window` rounds anchor — an obsolete-plan round
    outside the window cannot flag the query forever (the q9 lesson)."""
    for i, v in enumerate([0.1, 5.0, 6.0, 7.0], start=1):
        _write(tmp_path, f"BENCH_LOCAL_r0{i}.json",
               {"sf": 0.1, "queries": {"q": v}})
    monkeypatch.setattr(bench.os.path, "dirname", lambda _: str(tmp_path))
    assert bench._anchor_mins("0.1", window=3) == {"q": 5.0}


def test_other_sf_rounds_ignored(tmp_path, monkeypatch):
    _write(tmp_path, "BENCH_LOCAL_r01.json",
           {"sf": 0.01, "queries": {"q": 1.0}})
    _write(tmp_path, "BENCH_LOCAL_r02.json",
           {"sf": 0.1, "queries": {"q": 4.0}})
    monkeypatch.setattr(bench.os.path, "dirname", lambda _: str(tmp_path))
    assert bench._anchor_mins("0.1") == {"q": 4.0}


def test_sys_snapshot_and_steal_pct():
    a = bench._sys_snapshot()
    assert len(a["loadavg"]) == 3
    if "cpu_ticks_total" in a:
        b = dict(a)
        b["cpu_ticks_total"] = a["cpu_ticks_total"] + 1000
        b["cpu_ticks_steal"] = a["cpu_ticks_steal"] + 100
        assert bench._steal_pct(a, b) == 10.0
    assert bench._steal_pct({}, {}) is None
