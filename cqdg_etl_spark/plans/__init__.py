"""Plan introspection & performance-regression assertions (SURVEY.md §4).

The engine has no custom optimizer — Catalyst is the optimizer — so this
package's job is to *verify* that the plans Catalyst produces from our
DataFrame programs have the properties that matter at 100 TB: pushdown,
pruning, broadcast dimension joins, and a minimal shuffle budget.
"""

from cqdg_etl_spark.plans.introspect import (
    ScanReport,
    assert_plan,
    codegen_span_count,
    count_broadcast_joins,
    count_shuffles,
    count_sort_merge_joins,
    explain_str,
    scan_reports,
)

__all__ = [
    "ScanReport",
    "assert_plan",
    "codegen_span_count",
    "count_broadcast_joins",
    "count_shuffles",
    "count_sort_merge_joins",
    "explain_str",
    "scan_reports",
]
