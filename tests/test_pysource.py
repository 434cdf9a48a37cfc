"""Custom Python DataSource (sources/pysource.py): partition-parallel
generation, filter pushdown INTO the source, determinism. The
generation itself is value-checked against the SQL oracle through
``src_pysource_docs_stats`` in test_correctness.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module", autouse=True)
def _registered(spark):
    from cqdg_etl_spark.sources.pysource import register

    register(spark)


def _read(spark, n=500, parts=8):
    return (
        spark.read.format("synthetic_docs")
        .option("n_docs", n)
        .option("partitions", parts)
        .load()
    )


def test_row_count_and_schema(spark):
    df = _read(spark)
    assert df.count() == 500
    assert df.columns == ["doc_id", "lang", "n_tokens", "text", "part_lo"]
    ids = sorted(r["doc_id"] for r in df.select("doc_id").collect())
    assert ids == list(range(500))


def test_generation_is_partition_parallel(spark):
    # every requested partition produced its own id range
    df = _read(spark, n=500, parts=8)
    assert df.select("part_lo").distinct().count() == 8


def test_range_filter_pushes_into_generation(spark):
    rows = _read(spark).filter(F.col("doc_id") >= 400).collect()
    assert sorted(r["doc_id"] for r in rows) == list(range(400, 500))
    # part_lo is each row's partition LOWER BOUND: with pushdown the
    # source never generates a partition starting below the predicate
    assert min(r["part_lo"] for r in rows) >= 400


def test_equality_filter_prunes_to_single_row(spark):
    rows = _read(spark).filter(F.col("doc_id") == 123).collect()
    assert len(rows) == 1 and rows[0]["part_lo"] == 123


def test_unsupported_filter_still_correct(spark):
    # lang predicates are NOT pushable; Spark must post-filter correctly
    df = _read(spark)
    by_filter = {r["doc_id"] for r in df.filter(F.col("lang") == "fr").collect()}
    by_python = {
        r["doc_id"] for r in df.collect() if r["lang"] == "fr"
    }
    assert by_filter == by_python and by_filter


def test_deterministic_across_reads(spark):
    a = sorted(map(tuple, _read(spark).collect()))
    b = sorted(map(tuple, _read(spark).collect()))
    assert a == b
