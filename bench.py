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

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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

    timings: dict[str, float] = {}
    spreads: dict[str, list[float]] = {}
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
        df = q.fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
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
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                # per-query [min, median, max] of the 3 timed runs —
                # makes a contended outlier diagnosable from the
                # official artifact itself (a clean query shows a tight
                # triple; sustained box contention shows all three high)
                "runs": spreads,
                "sf": float(sf) if sf else sf_dir,
            }
        )
    )


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
