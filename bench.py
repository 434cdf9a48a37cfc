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

    timings: dict[str, float] = {}
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
        best = float("inf")
        for _ in range(3):
            start = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - start)
        timings[name] = round(best, 4)

    total = round(sum(timings.values()), 4)
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else sf_dir,
            }
        )
    )


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    main()
