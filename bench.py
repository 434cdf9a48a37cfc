#!/usr/bin/env python
"""Benchmark harness: times the headline queries and prints ONE JSON line.

Usage: python bench.py
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
       SPARK_GRAFT_CPUS   (default 32)

Each query is fully materialized via a count-style action
(``df.write.format("noop")``) so timing covers the whole plan without
driver-side collect overhead. A warmup run of the first query absorbs
JVM/session startup so per-query numbers reflect steady state.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time


def _sys_snapshot() -> dict:
    """Host-contention evidence captured with the numbers (VERDICT r6
    #4): 1/5/15-min loadavg plus the kernel's cumulative steal ticks,
    so a contended window is adjudicable from the committed artifact
    instead of reconstructed from memory."""
    snap: dict = {"loadavg": list(os.getloadavg())}
    try:
        with open("/proc/stat") as f:
            parts = f.readline().split()
        vals = [int(x) for x in parts[1:]]
        snap["cpu_ticks_total"] = sum(vals)
        snap["cpu_ticks_steal"] = vals[7] if len(vals) > 7 else 0
    except (OSError, ValueError):
        pass
    return snap


def _steal_pct(start: dict, end: dict) -> float | None:
    try:
        dt = end["cpu_ticks_total"] - start["cpu_ticks_total"]
        ds = end["cpu_ticks_steal"] - start["cpu_ticks_steal"]
        return round(100.0 * ds / dt, 3) if dt > 0 else None
    except KeyError:
        return None


def _committed(path: str) -> bool:
    """True iff ``path`` is tracked AND unmodified in git. The anchor
    contract is 'committed rounds' (ADVICE r7 #1): a bench re-run
    within the same round writes SPARK_GRAFT_LOCAL_OUT into the repo
    dir, and without this check the glob would ingest that in-flight
    artifact, displacing an older committed round from the 3-round
    window. Fail open (treat as committed) if git is unavailable —
    the driver's own BENCH_r*.json wrappers are always committed."""
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    try:
        out = subprocess.run(
            ["git", "status", "--porcelain", "--", os.path.basename(path)],
            cwd=here, capture_output=True, text=True, timeout=10,
        )
    except (OSError, subprocess.TimeoutExpired):
        return True
    if out.returncode != 0:
        return True
    # Untracked ("??") or modified-since-commit entries are in-flight.
    return out.stdout.strip() == ""


def _anchor_mins(sf: str, window: int = 3,
                 valid: set[str] | None = None) -> dict[str, float]:
    """Per-query minimum over the LAST ``window`` committed
    BENCH_r*.json rounds that recorded the query at this SF — the
    absolute anchor the internal-spread guard lacks (VERDICT r5 #3): a
    contention burst spanning all runs of one query shows a
    tight-but-uniformly-high triple that no within-sample test can
    see, but it cannot beat a time this plan recently posted on this
    box. A multi-round window keeps the anchor immune to ONE contended
    prior round (BENCH_r05 was taken inside a steal window — 26 of 28
    queries read +3-81%); bounding it to recent rounds keeps it from
    anchoring to an obsolete plan (q9's round-1 value predates its
    round-2 de-vacuation and is 4-5x below anything the real plan can
    post — an all-time min would flag q9 forever)."""
    per_round: dict[str, list[float]] = {}
    here = os.path.dirname(os.path.abspath(__file__))
    # Builder-side artifacts (BENCH_LOCAL_r*.json, complete and
    # structured — VERDICT r6 #4) take precedence over the driver
    # wrapper for the same round: the wrapper's "tail" fragment is
    # truncated and needs regex scraping. A round contributes from
    # exactly one source.
    rounds: dict[str, str] = {}
    for path in sorted(glob.glob(os.path.join(here, "BENCH_r*.json"))):
        rounds[os.path.basename(path)[len("BENCH_"):-len(".json")]] = path
    in_flight = os.environ.get("SPARK_GRAFT_LOCAL_OUT")
    for path in sorted(glob.glob(os.path.join(here, "BENCH_LOCAL_r*.json"))):
        # Skip the artifact THIS run is about to (re)write and any
        # git-uncommitted local artifact: only committed rounds anchor.
        if in_flight and os.path.basename(path) == in_flight:
            continue
        if not _committed(path):
            continue
        rounds[os.path.basename(path)[len("BENCH_LOCAL_"):-len(".json")]] = path
    for _tag, path in sorted(rounds.items()):
        try:
            rec = json.loads(open(path).read())
        except (json.JSONDecodeError, OSError):
            continue
        # The driver wraps the bench line: {"sf": ..., "parsed": {line}}.
        wrapper, rec = rec, (rec.get("parsed") or rec)
        if str(rec.get("sf")) != sf:
            continue
        queries = dict(rec.get("queries") or {})
        if not queries and isinstance(wrapper.get("tail"), str):
            # Some rounds' wrappers carry an empty "parsed" and only a
            # truncated "tail" fragment of the bench line (BENCH_r05);
            # scrape name:number pairs out of it. "runs" triples in the
            # fragment don't match (their values are lists).
            import re

            # Whitelist scraped names against the CURRENT bench-query
            # set (ADVICE r7 #4): a blacklist of known meta keys would
            # mint anchor entries for any future scalar meta field
            # (steal_pct, total, ...) appearing in a truncated tail.
            for m in re.finditer(r'"(\w+)":\s*([0-9.]+)', wrapper["tail"]):
                if valid is None or m.group(1) in valid:
                    queries.setdefault(m.group(1), float(m.group(2)))
        for name, t in queries.items():
            if isinstance(t, (int, float)) and t > 0:
                per_round.setdefault(name, []).append(float(t))
    return {name: min(vals[-window:]) for name, vals in per_round.items()}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # This is a timing harness, not an oracle gate: at corpus sizes
    # beyond the pinned-oracle scale the derive-parameter queries
    # (dd_embedding_cosine_pairs, dd_semantic_prune) raise unless told
    # their caller accepts scale-derived configs (ADVICE r7 #2).
    os.environ.setdefault("CQDG_SCALE_DERIVE", "1")
    from cqdg_etl_spark.queries import REGISTRY
    from cqdg_etl_spark.session import get_spark

    spark = get_spark(app_name="cqdg-etl-spark-bench")

    bench_queries = {n: q for n, q in REGISTRY.items() if q.bench}

    # Session-level warmup: the first query's own single warmup pass
    # was not enough to absorb JVM JIT + whole-stage-codegen compile +
    # parquet footer caching for the largest-scan query — measured
    # cross-session best-of-3 spread of 57% on q1 (r04 spread audit)
    # while every later query stayed under ~20%. Two untimed passes of
    # the first query push the session to steady state before any
    # timing starts.
    first = next(iter(bench_queries.values()))
    for _ in range(2):
        first.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    anchors = _anchor_mins(sf, valid=set(bench_queries))
    sys_start = _sys_snapshot()
    timings: dict[str, float] = {}
    colds: dict[str, float] = {}
    spreads: dict[str, list[float]] = {}
    contended: dict[str, dict[str, float]] = {}
    errors: dict[str, str] = {}
    for name, q in bench_queries.items():
        # Steady-state measurement: one untimed warmup run per query
        # absorbs one-time costs (Catalyst analysis cache, whole-stage
        # codegen compile, parquet footer cache, JVM JIT) that would
        # otherwise dominate at small SF, then time the best of 3 runs.
        # Between queries, drop dead Py4J refs and force a JVM GC so the
        # ContextCleaner reclaims finished broadcasts — accumulated
        # broadcast blocks otherwise bleed GC pauses into later queries
        # (measured: up to 60x swings on broadcast-heavy queries).
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()
        # One guard trip (or any per-query failure) must not kill the
        # whole artifact mid-loop (ADVICE r7 #2): record and move on.
        try:
            df = q.fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
        except Exception as exc:  # noqa: BLE001 — harness boundary
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            spark.catalog.clearCache()
            continue
        # Cold-cache visibility (VERDICT r11 #3): the warmup above
        # populates every .persist() built inside q.fn, so the timed
        # triple below reads warm for in-query persists and the bench
        # over-credits persist-shaped changes. Additive fix: drop the
        # cache the warmup built and time ONE recorded cold run (the
        # persist build cost is inside it), which re-populates the
        # cache for the warm triple. "queries"/"runs" keep their
        # historical warm-best-of-3 semantics so round-over-round
        # comparisons stay valid; the new "cold" map carries the
        # number the old discipline never saw.
        spark.catalog.clearCache()
        start = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        colds[name] = round(time.perf_counter() - start, 4)
        runs = []
        for _ in range(3):
            start = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - start)
        # Contention guard (BENCH_SPREAD_r05.md): this host shows
        # hypervisor CPU-steal bursts (measured 6-11% in 2-s windows)
        # that starve the JVM to ~2-of-32-core parallelism with
        # unchanged total CPU-seconds — a burst spanning all 3 runs
        # inflated dd_tfidf_cosine_pairs to 4.77 s in BENCH_r04. When
        # the triple itself shows a >2x internal spread, take up to 2
        # extra runs so one burst can't own the whole sample.
        extra = 0
        while extra < 2 and max(runs) > 2 * min(runs):
            start = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - start)
            extra += 1
        # Absolute anchor (VERDICT r5 #3): a steal burst spanning the
        # whole window produces a tight-high triple the internal-spread
        # guard cannot see. Compare the sample min against the best
        # time any committed round ever posted for this query at this
        # SF; while it reads >2x that anchor, take up to 2 more runs,
        # and if it STILL does, flag the query as contended in the
        # artifact rather than publishing the number as if clean.
        anc = anchors.get(name)
        extra = 0
        while anc and extra < 2 and min(runs) > 2 * anc:
            start = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - start)
            extra += 1
        if anc and min(runs) > 2 * anc:
            contended[name] = {"anchor_min": anc,
                               "ratio": round(min(runs) / anc, 2)}
        runs.sort()
        timings[name] = round(runs[0], 4)
        spreads[name] = [round(t, 4) for t in runs]  # sorted; min..max
        # Cache isolation (VERDICT r4 #1): drop THIS query's persisted
        # subtrees (built inside q.fn) before the next query runs.
        # CacheManager entries are keyed by logical plan, not by Python
        # refs, so without this every bench query's cache survives the
        # whole suite — an uncontrolled cross-query interaction and the
        # source of the "Asked to cache already cached data" warnings.
        spark.catalog.clearCache()

    total = round(sum(timings.values()), 4)
    line = {
        "metric": "headline_queries_total_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        # every timed run per query, sorted — makes a contended
        # outlier diagnosable from the official artifact itself (a
        # clean query shows a tight set; sustained box contention
        # shows all runs high)
        "runs": spreads,
        # queries whose best run never got within 2x of their
        # best committed historical time at this SF, even after
        # extra runs — read those numbers as box contention,
        # not plan drift (anchor_min = historical best).
        "contended": contended,
        # one timed run per query taken right after clearCache (in-query
        # persists rebuilt inside it) — the cost the warm triple in
        # "queries"/"runs" excludes. Additive since r12; see
        # OPTIMIZATION_r12.md.
        "cold": colds,
        "sf": float(sf) if sf else sf_dir,
    }
    if errors:
        line["errors"] = errors
    print(json.dumps(line))
    # Builder-side artifact (VERDICT r6 #4): the COMPLETE record — the
    # anchors every comparison used, all runs, and host-contention
    # snapshots — written next to the repo so it can be committed as
    # BENCH_LOCAL_r{N}.json. The driver wrapper's truncated "tail" then
    # never has to be scraped for this round's numbers: _anchor_mins
    # prefers the local artifact for any round that has one.
    out_name = os.environ.get("SPARK_GRAFT_LOCAL_OUT")
    if out_name:
        sys_end = _sys_snapshot()
        full = dict(line)
        full.update(
            {
                "anchors": {k: round(v, 4) for k, v in sorted(anchors.items())},
                "sys_start": sys_start,
                "sys_end": sys_end,
                "steal_pct": _steal_pct(sys_start, sys_end),
                "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
                "notes": [],
            }
        )
        here = os.path.dirname(os.path.abspath(__file__))
        with open(os.path.join(here, out_name), "w") as f:
            json.dump(full, f, indent=1, sort_keys=True)
            f.write("\n")


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
