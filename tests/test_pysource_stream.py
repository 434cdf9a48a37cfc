"""Custom Python streaming DataSource: micro-batch offsets, bounded
drain, deterministic generation, exactly-once replay contract.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from cqdg_etl_spark.sources.pysource_stream import (
    SyntheticEventsStreamReader,
    make_event,
    register,
)


def test_stream_drains_exact_rows(spark):
    register(spark)
    stream = (
        spark.readStream.format("synthetic_events")
        .option("batch_size", 128)
        .option("max_rows", 600)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("pysrc_stream")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            if spark.table("pysrc_stream").count() >= 600:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    got = sorted(map(tuple, spark.table("pysrc_stream").collect()))
    want = sorted(make_event(i) for i in range(600))
    assert got == want


def test_stream_aggregate_matches_generation(spark):
    register(spark)
    stream = (
        spark.readStream.format("synthetic_events")
        .option("batch_size", 250)
        .option("max_rows", 500)
        .load()
    )
    q = (
        stream.groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .writeStream.format("memory")
        .queryName("pysrc_stream_agg")
        .outputMode("complete")
        .start()
    )
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            rows = spark.table("pysrc_stream_agg").collect()
            if sum(r["n"] for r in rows) >= 500:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    got = {r["event_type"]: r["n"] for r in spark.table("pysrc_stream_agg").collect()}
    want: dict[str, int] = {}
    for i in range(500):
        t = make_event(i)[2]
        want[t] = want.get(t, 0) + 1
    assert got == want


def test_replay_reproduces_committed_batch():
    # the exactly-once contract, checked directly on the reader
    r = SyntheticEventsStreamReader({"batch_size": 100, "max_rows": 1000})
    first, off = r.read({"pos": 300})
    replay = list(r.readBetweenOffsets({"pos": 300}, off))
    assert list(first) == replay == [make_event(i) for i in range(300, 400)]


def test_drained_feed_returns_empty_batches():
    r = SyntheticEventsStreamReader({"batch_size": 100, "max_rows": 150})
    rows, off = r.read({"pos": 150})
    assert list(rows) == [] and off == {"pos": 150}
