"""Custom stateful streaming via ``transformWithStateInPandas``
(Spark 4's arbitrary-state API, SPARK-46815).

The older ``applyInPandasWithState`` (streaming/stateful.py) carries ONE
opaque state tuple per key; ``transformWithState`` is its successor:
named typed state variables (value/list/map), per-key processing timers,
state TTL, and an evolution path — the API new stateful operators
should target. Both are kept: the reference point for migration and the
modern path.

The example operator mirrors running_user_totals' contract with a
STRONGER checkable surface: per-user event count AND running max value.
Unlike a float sum (pandas pairwise summation — not oracle-
reproducible), max is order-independent, so the final emission is
exactly the batch aggregate regardless of how the stream was split
into micro-batches.

State sizing at scale: one (long, double) ValueState per active user,
hash-partitioned across the cluster's RocksDB state stores; TTL via
``ttlDurationMs`` when the key space is unbounded.

RUNTIME DEPENDENCY: transformWithState's Python state-server protocol
needs ``google.protobuf`` (pyspark ships the generated StateMessage
stubs but not protobuf itself). This build environment doesn't have
it, so the operator is exercised by an env-gated test
(tests/test_streaming_tws.py) rather than a driver registry query;
the applyInPandasWithState twin (streaming/stateful.py,
``ev_stream_stateful_totals``) carries the driver-checked stateful
contract.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_MAX_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("max_value", DoubleType()),
    ]
)

_STATE_SCHEMA = StructType(
    [StructField("n", LongType()), StructField("mx", DoubleType())]
)


class RunningMaxProcessor(StatefulProcessor):
    """Per-key running (count, max) in a named ValueState."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._agg = handle.getValueState("agg", _STATE_SCHEMA)

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: Any
    ) -> Iterator[pd.DataFrame]:
        prev = self._agg.get()
        n, mx = (prev[0], prev[1]) if prev is not None else (0, None)
        for pdf in rows:
            n += len(pdf)
            batch_max = float(pdf["value"].max())
            mx = batch_max if mx is None else max(mx, batch_max)
        self._agg.update((n, mx))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "max_value": [mx]}
        )

    def close(self) -> None:
        pass


def running_user_max(events: DataFrame) -> DataFrame:
    """Running per-user (count, max value) updated each micro-batch."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningMaxProcessor(),
            outputStructType=RUNNING_MAX_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
