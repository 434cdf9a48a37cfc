"""Ad-hoc per-query timer for A/B probes (optimization rounds).

Times ONLY the named queries with the same methodology as bench.py
(noop sink, per-query warmup, best of 3, cache cleared between), in a
fresh session per invocation so alternating old/new processes give an
interleaved A/B without needing both code versions in one JVM.

Usage: python tools/time_queries.py name1 name2 ...
Env:   SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as bench.py.
Prints one JSON line {"queries": {name: best_sec}, "runs": {...}}.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("CQDG_SCALE_DERIVE", "1")
    from cqdg_etl_spark.queries import REGISTRY
    from cqdg_etl_spark.session import get_spark

    spark = get_spark(app_name="cqdg-etl-spark-ab")
    # Session warmup: two untimed passes of the first named query.
    for _ in range(2):
        REGISTRY[names[0]].fn(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    spark.catalog.clearCache()
    timings: dict[str, float] = {}
    runs_out: dict[str, list[float]] = {}
    for name in names:
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        df = REGISTRY[name].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warmup
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        runs.sort()
        timings[name] = round(runs[0], 4)
        runs_out[name] = [round(t, 4) for t in runs]
        spark.catalog.clearCache()
    print(json.dumps({"queries": timings, "runs": runs_out}))


if __name__ == "__main__":
    main()
