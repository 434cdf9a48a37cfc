"""Physical-plan introspection for performance-regression testing.

The reference engine delegates all physical planning to Catalyst
(reference: absence of any custom optimizer — see
`/root/reference/src/main/scala/ca/cqdg/etl/` passim, SURVEY.md §4), so
the *quality* of our engine at 100 TB hinges on the plans Catalyst
produces from our DataFrame programs.  These helpers turn the formatted
explain output into assertable facts so tests can lock in:

- **pushdown**: predicates reach the parquet scan (``PushedFilters``),
  projections prune the read schema (``ReadSchema``);
- **broadcastability**: dimension joins run as BroadcastHashJoin, never
  a shuffled sort-merge join;
- **shuffle budget**: an operator performs exactly the number of data
  exchanges its semantics require — a regression that adds an Exchange
  shows up as a test failure long before it shows up as a 100 TB
  slowdown;
- **codegen**: the hot path stays inside WholeStageCodegen spans.

Everything is derived from the public ``df.explain`` output, so it works
on any Spark ≥ 3.0 without touching JVM internals.
"""

from __future__ import annotations

import contextlib
import io
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

__all__ = [
    "explain_str",
    "count_shuffles",
    "count_broadcast_joins",
    "count_sort_merge_joins",
    "scan_reports",
    "ScanReport",
    "codegen_span_count",
    "assert_plan",
]


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """Return ``df.explain(mode=...)`` output as a string (public API only)."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


def count_shuffles(df: DataFrame, plan: str | None = None) -> int:
    """Number of *data* exchanges (shuffles) in the physical plan.

    BroadcastExchange is excluded: broadcasting a dimension table is the
    cheap alternative to a shuffle, which is exactly what these tests
    want to encourage.  AQE wrapper nodes (AQEShuffleRead) are not
    counted either — they reuse an Exchange already counted.
    """
    plan = plan or explain_str(df, mode="formatted")
    # Formatted mode lists each node once as "(N) Exchange" in the detail
    # section (the tree section repeats it as "+- Exchange (N)").
    numbered = re.findall(r"^\(\d+\) Exchange\b", plan, re.M)
    if numbered or re.search(r"^\(\d+\) ", plan, re.M):
        return len(numbered)
    # Simple/extended mode: one line per node, partitioning spec inline.
    return len(
        re.findall(
            r"\bExchange (hashpartitioning|rangepartitioning|SinglePartition"
            r"|RoundRobinPartitioning)",
            plan,
        )
    )


def count_broadcast_joins(df: DataFrame, plan: str | None = None) -> int:
    plan = plan or explain_str(df)
    return len(re.findall(r"BroadcastHashJoin|BroadcastNestedLoopJoin", plan))


def count_sort_merge_joins(df: DataFrame, plan: str | None = None) -> int:
    plan = plan or explain_str(df)
    return len(re.findall(r"SortMergeJoin", plan))


@dataclass
class ScanReport:
    """One parquet (or other file-source) scan in the physical plan."""

    location: str = ""
    pushed_filters: list[str] = field(default_factory=list)
    read_columns: list[str] = field(default_factory=list)


_STRUCT_FIELD = re.compile(r"(\w+):")


def scan_reports(df: DataFrame, plan: str | None = None) -> list[ScanReport]:
    """Parse every ``Scan parquet`` block of a *formatted* explain output."""
    plan = plan or explain_str(df, mode="formatted")
    reports: list[ScanReport] = []
    # Formatted mode prints one "(N) Scan parquet" block per source with
    # Location / PushedFilters / ReadSchema attribute lines.
    blocks = re.split(r"\n\(\d+\) ", plan)
    for block in blocks:
        if not block.startswith(("Scan parquet", "BatchScan", "Scan csv", "Scan json")):
            continue
        rep = ScanReport()
        m = re.search(r"Location:.*?\[(.*?)\]", block)
        if m:
            rep.location = m.group(1)
        m = re.search(r"PushedFilters: \[(.*?)\]", block, re.S)
        if m:
            rep.pushed_filters = [
                f.strip() for f in m.group(1).split(",") if f.strip()
            ]
        m = re.search(r"ReadSchema: struct<(.*?)>\n", block, re.S)
        if m:
            rep.read_columns = _STRUCT_FIELD.findall(m.group(1))
        reports.append(rep)
    return reports


def codegen_span_count(df: DataFrame, plan: str | None = None) -> int:
    """Number of distinct WholeStageCodegen spans in the plan.

    Under AQE the plan of an *unexecuted* frame hides codegen stages
    (``isFinalPlan=false`` → "Found 0 subtrees"); run an action on the
    frame first so the adaptive plan is finalized, then call this.
    """
    if plan is None or "WholeStageCodegen subtrees" not in plan:
        plan = explain_str(df, mode="codegen")
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", plan)
    if m:
        return int(m.group(1))
    ids = set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
    ids |= set(re.findall(r"\*\((\d+)\)", plan))
    return len(ids)


def assert_plan(
    df: DataFrame,
    *,
    max_shuffles: int | None = None,
    min_broadcast_joins: int | None = None,
    max_sort_merge_joins: int | None = None,
    pushed_filter_on: list[str] | None = None,
    max_scan_columns: dict[str, int] | None = None,
) -> str:
    """Assert structural facts about a DataFrame's physical plan.

    Returns the formatted plan so failures can embed it.  ``max_scan_columns``
    maps a substring of the scan location (e.g. ``"lineitem"``) to the
    maximum number of columns that scan may read — the column-pruning check.
    """
    plan = explain_str(df, mode="formatted")
    problems: list[str] = []
    if max_shuffles is not None:
        n = count_shuffles(df, plan)
        if n > max_shuffles:
            problems.append(f"shuffles={n} > max {max_shuffles}")
    if min_broadcast_joins is not None:
        n = count_broadcast_joins(df, plan)
        if n < min_broadcast_joins:
            problems.append(f"broadcast joins={n} < min {min_broadcast_joins}")
    if max_sort_merge_joins is not None:
        n = count_sort_merge_joins(df, plan)
        if n > max_sort_merge_joins:
            problems.append(f"sort-merge joins={n} > max {max_sort_merge_joins}")
    scans = scan_reports(df, plan)
    if pushed_filter_on:
        for colname in pushed_filter_on:
            if not any(
                colname in f for rep in scans for f in rep.pushed_filters
            ):
                problems.append(f"no pushed filter mentions column {colname!r}")
    if max_scan_columns:
        for loc_substr, max_cols in max_scan_columns.items():
            matching = [r for r in scans if loc_substr in r.location]
            if not matching:
                problems.append(f"no scan matching location {loc_substr!r}")
            for rep in matching:
                if len(rep.read_columns) > max_cols:
                    problems.append(
                        f"scan {loc_substr!r} reads {len(rep.read_columns)} cols "
                        f"({rep.read_columns}) > max {max_cols}"
                    )
    if problems:
        raise AssertionError(
            "plan regression:\n- " + "\n- ".join(problems) + "\n\n" + plan
        )
    return plan
