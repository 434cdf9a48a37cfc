#!/usr/bin/env python
"""Dump .explain("formatted") for bench queries to plans/r11/<name>_<tag>.txt.

Usage: python tools/dump_plans.py <tag> [name ...]
With no names, dumps every bench query. SPARK_GRAFT_SF_DIR selects the
data dir (default /root/testdata/sf0.1).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("CQDG_SCALE_DERIVE", "1")
    from cqdg_etl_spark.queries import REGISTRY
    from cqdg_etl_spark.session import get_spark

    spark = get_spark(app_name="plan-dump")
    here = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "plans", os.environ.get("CQDG_PLANS_DIR", "r11"))
    os.makedirs(here, exist_ok=True)
    if not names:
        names = [n for n, q in REGISTRY.items() if q.bench]
    for name in names:
        q = REGISTRY[name]
        try:
            df = q.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"))
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR: {type(exc).__name__}: {exc}"
        with open(os.path.join(here, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        print(name, "ok" if not plan.startswith("ERROR") else plan[:120])
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
