"""Cross-session bench spread audit (VERDICT r3 #7, automated).

Runs ``python bench.py`` N times, each in a FRESH process (new JVM, so
JIT/codegen/footer caches start cold every time), parses the one-line
JSON outputs, and prints per-query and total min/median/max plus the
max/min−1 spread — the table BENCH_SPREAD_r04.md was assembled from.

Usage:
    python tools/bench_spread.py            # 3 sessions, sf0.1
    python tools/bench_spread.py 5          # 5 sessions
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/bench_spread.py
"""

from __future__ import annotations

import json
import statistics
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    runs: list[dict] = []
    for i in range(n):
        try:
            # timeout: a hung session must fail the audit, not stall it
            # forever (a full sf0.1 suite runs in ~3-5 min; 20 min is
            # pathological on any box state)
            out = subprocess.run(
                [sys.executable, str(REPO / "bench.py")],
                capture_output=True,
                text=True,
                cwd=REPO,
                timeout=1200,
            )
        except subprocess.TimeoutExpired:
            print(f"session {i + 1}: bench timed out after 1200 s")
            return 1
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
        if out.returncode != 0 or not line:
            print(f"session {i + 1}: bench failed rc={out.returncode}")
            print(out.stderr[-2000:])
            return 1
        parsed = json.loads(line[-1])
        runs.append(parsed)
        print(
            f"session {i + 1}/{n}: total {parsed['value']:.2f} s "
            f"({len(parsed['queries'])} queries)",
            flush=True,
        )

    # Aggregate over the INTERSECTION of query sets: a bench that adds
    # or drops a query mid-audit must degrade to a warning, not a
    # KeyError half-way through the table.
    common = set(runs[0]["queries"])
    for r in runs[1:]:
        common &= set(r["queries"])
    skipped = {q for r in runs for q in r["queries"]} - common
    if skipped:
        print(
            f"WARNING: query sets differ across sessions; skipping "
            f"{sorted(skipped)}"
        )
    names = [q for q in runs[0]["queries"] if q in common]
    rows = []
    for q in names:
        vals = sorted(r["queries"][q] for r in runs)
        med = statistics.median(vals)
        spread = vals[-1] / vals[0] - 1 if vals[0] > 0 else 0.0
        rows.append((q, vals[0], med, vals[-1], spread))
    rows.sort(key=lambda r: -r[4])

    totals = sorted(r["value"] for r in runs)
    print()
    print("| query | min | med | max | max/min-1 |")
    print("|---|---|---|---|---|")
    for q, lo, med, hi, spread in rows:
        print(f"| {q} | {lo:.3f} | {med:.3f} | {hi:.3f} | {spread:.1%} |")
    print(
        f"\nTOTALS: min {totals[0]:.2f} / med "
        f"{statistics.median(totals):.2f} / max {totals[-1]:.2f} s "
        f"({totals[-1] / totals[0] - 1:.1%} spread, {n} sessions)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
