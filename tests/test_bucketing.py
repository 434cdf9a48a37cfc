"""Bucketed co-located join: the write-time shuffle pays for itself.

Writes lineitem and orders bucketed by order key into a temp external
location, then asserts (1) the join result equals the plain join and
(2) the physical plan contains ZERO exchanges — the property that makes
repeated fact-fact joins viable at 100 TB.
"""

from __future__ import annotations

import pytest

from cqdg_etl_spark.plans import count_shuffles, explain_str
from cqdg_etl_spark.queries.registry import load
from cqdg_etl_spark.sources.bucketing import read_bucketed, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders")
    write_bucketed(
        li, "li_b", 8, ["l_orderkey"], ["l_orderkey"], path=str(base / "li")
    )
    write_bucketed(
        orders,
        "orders_b",
        8,
        ["o_orderkey"],
        ["o_orderkey"],
        path=str(base / "orders"),
    )
    yield "li_b", "orders_b"
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")


def test_bucketed_join_is_shuffle_free(spark, sf_dir, bucketed_tables):
    li_t, o_t = bucketed_tables
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = read_bucketed(spark, li_t)
        orders = read_bucketed(spark, o_t)
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy(
            "o_orderpriority"
        ).count()
        plan = explain_str(joined, mode="formatted")
        # join itself must not exchange; only the priority agg shuffles
        assert "SortMergeJoin" in plan, plan
        assert count_shuffles(joined, plan) <= 1, plan
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    li_t, o_t = bucketed_tables
    li = read_bucketed(spark, li_t)
    orders = read_bucketed(spark, o_t)
    bucketed = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .count()
    )
    li_p = load(spark, sf_dir, "lineitem")
    orders_p = load(spark, sf_dir, "orders")
    plain = (
        li_p.join(orders_p, li_p.l_orderkey == orders_p.o_orderkey)
        .groupBy("o_orderpriority")
        .count()
    )
    assert sorted(bucketed.collect()) == sorted(plain.collect())


def test_range_sorted_parquet_rowgroup_stats(spark, sf_dir, tmp_path):
    """Range-sorted layout: per-file key ranges are disjoint and footer
    min/max stats are tight — the property scan pruning relies on."""
    import glob

    import pyarrow.parquet as pq

    from cqdg_etl_spark.queries.registry import load
    from cqdg_etl_spark.sources.writers import write_range_sorted_parquet

    orders = load(spark, sf_dir, "orders")
    target = str(tmp_path / "orders_sorted")
    write_range_sorted_parquet(orders, target, ["o_orderdate"], num_files=4)

    spans = []
    for f in glob.glob(f"{target}/*.parquet"):
        meta = pq.ParquetFile(f).metadata
        idx = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        col = idx["o_orderdate"]
        lo = min(
            meta.row_group(g).column(col).statistics.min
            for g in range(meta.num_row_groups)
        )
        hi = max(
            meta.row_group(g).column(col).statistics.max
            for g in range(meta.num_row_groups)
        )
        spans.append((lo, hi))
    spans.sort()
    assert len(spans) >= 2
    for (_, prev_hi), (nxt_lo, _) in zip(spans, spans[1:]):
        assert prev_hi <= nxt_lo  # disjoint file ranges

    # content survives the rewrite
    assert spark.read.parquet(target).count() == orders.count()
