"""transformWithStateInPandas (Spark 4 arbitrary-state API) — gated on
google.protobuf, which the state-server protocol needs at runtime and
this build environment lacks. Where protobuf exists, the running-max
processor's drained final state must equal the batch aggregate.
"""

from __future__ import annotations

import importlib.util

import pytest

def _has_protobuf() -> bool:
    try:  # find_spec raises when the 'google' namespace itself is absent
        return importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        return False


needs_protobuf = pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithState state protocol requires google.protobuf",
)


@needs_protobuf
def test_tws_running_max_equals_batch(spark, sf_dir):
    from pyspark.sql import functions as F

    from cqdg_etl_spark.streaming import read_event_stream
    from cqdg_etl_spark.streaming.stateful_v2 import running_user_max

    q = (
        running_user_max(read_event_stream(spark, sf_dir))
        .writeStream.format("memory")
        .queryName("tws_max")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    final = (
        spark.table("tws_max")
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("max_value").alias("max_value"),
        )
    )
    from cqdg_etl_spark.queries.registry import load

    batch = (
        load(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_events"),
            F.max("value").alias("max_value"),
        )
    )
    assert sorted(map(tuple, final.collect())) == sorted(
        map(tuple, batch.collect())
    )
