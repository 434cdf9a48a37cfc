"""Input-spread helper (operators/spread.py): results must be invariant
to the spreadInputs knob, and the knob must actually gate the exchange.

The helper exists purely for plan-shape (parallelize per-row Python
work over a 1-partition scan); any result difference under the knob
would mean an operator wrongly assumed partition-dependence was safe.
"""

from __future__ import annotations

import pandas as pd
import pytest

from cqdg_etl_spark.operators.spread import spread_to_parallelism

SF_DIR = "/root/testdata/sf0.001"


def _sorted_pdf(df) -> pd.DataFrame:
    pdf = df.toPandas()
    cols = sorted(pdf.columns)
    return (
        pdf[cols].sort_values(cols).reset_index(drop=True)
    )


@pytest.fixture()
def knob(spark):
    yield
    spark.conf.set("spark.cqdg.spreadInputs", "true")


def test_knob_off_is_noop(spark, knob):
    docs = spark.range(10).toDF("doc_id")
    spark.conf.set("spark.cqdg.spreadInputs", "false")
    assert spread_to_parallelism(docs) is docs


def test_knob_on_repartitions(spark, knob):
    docs = spark.range(10).coalesce(1).toDF("doc_id")
    spark.conf.set("spark.cqdg.spreadInputs", "true")
    out = spread_to_parallelism(docs)
    assert out is not docs
    target = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert out.rdd.getNumPartitions() == target


@pytest.mark.parametrize(
    "build",
    [
        pytest.param(
            lambda spark: __import__(
                "cqdg_etl_spark.operators.quality", fromlist=["q"]
            ).repetition_metrics(
                _docs(spark), "text", "doc_id"
            ),
            id="repetition_metrics",
        ),
        pytest.param(
            lambda spark: __import__(
                "cqdg_etl_spark.operators.textstats", fromlist=["t"]
            ).winnowing_fingerprints(
                _docs(spark), "text", "doc_id"
            ),
            id="winnowing_fingerprints",
        ),
    ],
)
def test_results_invariant_under_knob(spark, knob, build):
    spark.conf.set("spark.cqdg.spreadInputs", "true")
    on = _sorted_pdf(build(spark))
    spark.conf.set("spark.cqdg.spreadInputs", "false")
    off = _sorted_pdf(build(spark))
    pd.testing.assert_frame_equal(on, off)


def _docs(spark):
    from cqdg_etl_spark.queries.registry import load

    return load(spark, SF_DIR, "documents")
