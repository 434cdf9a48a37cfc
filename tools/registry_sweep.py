"""Time EVERY registry query once (noop sink) at a given SF.

The optimization-round coverage tool: the bench times the 38 headline
queries; this sweeps all registered names so slow NON-bench operators
can't hide. One pass each (not best-of-3 — ranking, not anchoring),
same session, cache cleared between queries.

Usage: python tools/registry_sweep.py [out.json]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    os.environ.setdefault("CQDG_SCALE_DERIVE", "1")
    from cqdg_etl_spark.queries import REGISTRY
    from cqdg_etl_spark.session import get_spark

    spark = get_spark(app_name="cqdg-etl-spark-sweep")
    # Absorb session startup on an arbitrary query before timing.
    warm = next(iter(REGISTRY.values()))
    warm.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.catalog.clearCache()

    out: dict[str, float] = {}
    errs: dict[str, str] = {}
    for name, q in sorted(REGISTRY.items()):
        gc.collect()
        spark.sparkContext.setJobDescription(f"sweep: {name}")
        t0 = time.perf_counter()
        try:
            q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            out[name] = round(time.perf_counter() - t0, 4)
        except Exception as exc:  # noqa: BLE001 — sweep boundary
            errs[name] = f"{type(exc).__name__}: {exc}"[:200]
        spark.catalog.clearCache()
        spark.sparkContext.setJobDescription(None)
    rec = {"sf_dir": sf_dir, "n": len(out), "queries": out, "errors": errs}
    dest = sys.argv[1] if len(sys.argv) > 1 else None
    if dest:
        with open(dest, "w") as f:
            json.dump(rec, f, indent=1, sort_keys=True)
    for name, t in sorted(out.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{t:8.3f}  {name}")
    if errs:
        print("ERRORS:", json.dumps(errs))


if __name__ == "__main__":
    main()
