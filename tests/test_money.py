"""The long-micro-unit money fast path must equal the decimal path
bit-for-bit (same quantization grid + exact accumulation — see
cqdg_etl_spark/functions/money.py docstring for the argument)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cqdg_etl_spark.functions.money import micro_agg, micro_sum
from cqdg_etl_spark.queries.registry import dec_avg, dec_sum, load

SF = "/root/testdata/sf0.01"


def test_micro_sum_equals_dec_sum(spark):
    li = load(spark, SF, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    fast = {
        tuple(r[:1]): tuple(r[1:])
        for r in li.groupBy("l_returnflag")
        .agg(micro_sum(disc).alias("a"), micro_sum(disc * (1 + F.col("l_tax"))).alias("b"))
        .collect()
    }
    ref = {
        tuple(r[:1]): tuple(r[1:])
        for r in li.groupBy("l_returnflag")
        .agg(dec_sum(disc).alias("a"), dec_sum(disc * (1 + F.col("l_tax"))).alias("b"))
        .collect()
    }
    assert fast == ref


def test_micro_agg_equals_dec_path(spark):
    li = load(spark, SF, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    fast = {
        tuple(r[:2]): tuple(r[2:])
        for r in micro_agg(
            li,
            ["l_returnflag", "l_linestatus"],
            sums={"s": disc},
            avgs={"av": F.col("l_extendedprice")},
            count_star="n",
        ).collect()
    }
    ref = {
        tuple(r[:2]): tuple(r[2:])
        for r in li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum(disc).alias("s"),
            dec_avg(F.col("l_extendedprice")).alias("av"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    assert fast == ref


def test_micro_agg_global_group(spark):
    li = load(spark, SF, "lineitem")
    fast = micro_agg(
        li, [], sums={"s": F.col("l_quantity")}, count_star="n"
    ).collect()[0]
    ref = (
        li.agg(dec_sum(F.col("l_quantity")).alias("s"), F.count("*").alias("n"))
        .collect()[0]
    )
    assert tuple(fast) == tuple(ref)


def test_micro_agg_two_shuffles_but_tiny_second(spark):
    """The phase-2 exchange must carry only (#partitions x #groups) rows —
    assert the plan has the partial/final split and the phase-1 group
    includes the partition id (map-side locality)."""
    li = load(spark, SF, "lineitem")
    df = micro_agg(li, ["l_returnflag"], sums={"s": F.col("l_quantity")})
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SPARK_PARTITION_ID" in plan.upper() or "_pid" in plan
