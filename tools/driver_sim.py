"""Executable driver-contract simulation — the verify recipe as one
command.

Runs exactly what the per-round driver gate does, strictly:
- ``entry(spark)`` smoke at sf0.001;
- every ``oracle_sql()`` query vs DuckDB at the given SF with
  column-set, stringified-dtype AND order-insensitive value
  comparison (stricter than tests/oracle_harness.py, which
  canonicalizes floats — DuckDB HUGEINT → float64 drift is a real
  driver failure mode even when values match).

Usage:
    python tools/driver_sim.py                  # sf0.01 (driver scale)
    python tools/driver_sim.py /root/testdata/sf0.1
    python tools/driver_sim.py sf0.001 tx_ q9   # filter by name prefix

Exit code 0 iff every query matches. Prints one OK/FAIL line per query
and a DONE summary (grep "DONE; failures: 0").
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.01"
    prefixes: list[str] = []
    for a in args:
        if "/" in a:
            sf_dir = a
        elif a.startswith("sf"):
            sf_dir = f"/root/testdata/{a}"
        else:
            prefixes.append(a)

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", str(REPO / "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    from cqdg_etl_spark.session import get_spark

    spark = get_spark()
    print("entry rows:", len(mod.entry(spark).collect()))

    qs, osql = mod.queries(), mod.oracle_sql()
    assert set(osql) <= set(qs)

    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    names = sorted(
        n for n in osql
        if not prefixes or any(n.startswith(p) for p in prefixes)
    )
    failures = []
    for name in names:
        try:
            a = qs[name](spark, sf_dir).toPandas()
            e = con.execute(osql[name]).df()
            cols = sorted(a.columns)
            assert cols == sorted(e.columns), f"columns {cols} vs {sorted(e.columns)}"
            dt = [
                (c, str(a[c].dtype), str(e[c].dtype))
                for c in cols
                if str(a[c].dtype) != str(e[c].dtype)
            ]
            assert not dt, f"dtype drift {dt}"
            sa = sorted(a[cols].astype(str).apply("|".join, axis=1))
            se = sorted(e[cols].astype(str).apply("|".join, axis=1))
            assert sa == se, f"values differ ({len(sa)} vs {len(se)} rows)"
            print("OK", name, flush=True)
        except Exception as ex:  # noqa: BLE001 — report and continue
            failures.append((name, str(ex)[:300]))
            print("FAIL", name, str(ex)[:300], flush=True)
    print(f"DONE; failures: {len(failures)} / {len(names)}")
    for n, m in failures:
        print("  ", n, m)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
