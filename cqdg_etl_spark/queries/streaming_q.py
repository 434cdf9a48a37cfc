"""Streaming queries surfaced through the batch registry.

Each entry drains a bounded stream (``trigger(availableNow=True)``) into
a memory sink and returns the sink contents as a DataFrame — so the
driver's DuckDB oracle checks the *streaming* operator's output exactly
like a batch query. This is the strongest correctness statement the
incremental path can make: identical answers to the declarative batch
SQL.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame, SparkSession

from cqdg_etl_spark.queries.registry import query
from cqdg_etl_spark.streaming import read_event_stream, tumbling_hourly

_run_counter = itertools.count()


def _drain(stream_df, name: str, output_mode: str, spark: SparkSession) -> DataFrame:
    sink = f"{name}_{next(_run_counter)}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(sink)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(600)
    return spark.table(sink)


@query(
    "ev_tumbling_hourly_stream",
    tags=("streaming", "window-agg"),
    oracle="""
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
               event_type,
               count(*) AS n_events,
               CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_value,
               count(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY hour_start, event_type
    """,
)
def ev_tumbling_hourly_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ev_tumbling_hourly, checked against the SAME
    DuckDB oracle: readStream → watermark → windowed agg → availableNow
    drain. Proves the incremental plan computes the batch answer."""
    return _drain(
        tumbling_hourly(read_event_stream(spark, sf_dir)),
        "ev_tumbling_stream",
        "complete",
        spark,
    )


@query(
    "ev_stream_dedup_keys",
    tags=("streaming", "dedup"),
    oracle="""
        SELECT user_id, event_type, CAST(1 AS BIGINT) AS n
        FROM events GROUP BY user_id, event_type
    """,
)
def ev_stream_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup, projected to its deterministic contract:
    exactly one row per (user_id, event_type) key. (Which physical row
    survives is arrival-order dependent — see streaming/dedup_stream.py —
    so the oracle checks the key set + multiplicity, the property dedup
    promises.)"""
    from pyspark.sql import functions as F

    from cqdg_etl_spark.streaming import first_occurrence_stream, read_event_stream

    deduped = first_occurrence_stream(
        read_event_stream(spark, sf_dir), ["user_id", "event_type"]
    )
    drained = _drain(deduped, "ev_stream_dedup", "append", spark)
    return drained.groupBy("user_id", "event_type").agg(F.count("*").alias("n"))


@query(
    "ev_stream_view_purchase_join",
    tags=("streaming", "stream-stream-join"),
    oracle="""
        SELECT p.user_id,
               p.event_id AS purchase_id,
               v.event_id AS view_id,
               CAST(epoch_us(p.ts) - epoch_us(v.ts) AS BIGINT) AS gap_us
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON p.user_id = v.user_id
         AND v.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
    """,
)
def ev_stream_view_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream inner join: every view within the hour
    preceding a purchase by the same user. Both sides carry watermarks
    and the join condition bounds event-time distance, so join state is
    evicted once the watermark passes — the required shape for an
    unbounded stream-stream join. Drained with availableNow and checked
    against the identical batch interval join in DuckDB."""
    from pyspark.sql import functions as F

    from cqdg_etl_spark.streaming import read_event_stream

    ev = read_event_stream(spark, sf_dir)
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", "2 hours")
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("v_ts"),
        )
        .withWatermark("v_ts", "2 hours")
    )
    joined = purchases.join(
        views,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("v_ts") <= F.col("p_ts")),
        "inner",
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        "view_id",
        (F.unix_micros("p_ts") - F.unix_micros("v_ts")).alias("gap_us"),
    )
    return _drain(joined, "ev_stream_ssjoin", "append", spark)


@query(
    "ev_stream_enrich_static",
    tags=("streaming", "stream-static-join"),
    oracle="""
        SELECT c_mktsegment, event_type,
               count(*) AS n_events,
               CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
                 AS total_value
        FROM events JOIN customer ON c_custkey = user_id
        GROUP BY c_mktsegment, event_type
    """,
)
def ev_stream_enrich_static(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: the event stream joins a static
    dimension (customer) broadcast to every micro-batch — no state, no
    watermark needed for the join itself (the static side is re-read
    per batch, so a dimension refresh is picked up mid-stream). The
    downstream aggregate runs in complete mode; DuckDB checks the
    identical batch join."""
    from pyspark.sql import functions as F

    from cqdg_etl_spark.queries.registry import load
    from cqdg_etl_spark.streaming import read_event_stream

    ev = read_event_stream(spark, sf_dir)
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    enriched = ev.join(F.broadcast(cust), ev["user_id"] == cust["c_custkey"])
    agg = enriched.groupBy("c_mktsegment", "event_type").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
        .cast("double")
        .alias("total_value"),
    )
    return _drain(agg, "ev_stream_enrich", "complete", spark)


@query(
    "ev_stream_hopping_halfhour",
    tags=("streaming", "window-agg", "sliding"),
    oracle="""
        WITH slots AS (
          SELECT to_timestamp(CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800)
                   AS hop_start, event_type, value FROM events
          UNION ALL
          SELECT to_timestamp(CAST(floor(epoch(ts) / 1800) AS BIGINT) * 1800
                              - 1800) AS hop_start, event_type, value
          FROM events
        )
        SELECT strftime(hop_start, '%Y-%m-%d %H:%M:%S') AS hop_start,
               event_type, count(*) AS n_events,
               CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
                 AS total_value
        FROM slots GROUP BY hop_start, event_type
    """,
)
def ev_stream_hopping_halfhour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming twin of ev_hopping_halfhour (1-hour windows sliding
    every 30 min): watermarked sliding-window aggregate — each event
    feeds exactly two windows' state; the watermark finalizes and
    evicts windows as event time advances. Checked against the same
    2-way-UNION batch oracle."""
    from pyspark.sql import functions as F

    from cqdg_etl_spark.streaming import read_event_stream

    ev = read_event_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2)
            .cast("double")
            .alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hop_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
    return _drain(agg, "ev_stream_hopping", "complete", spark)


@query(
    "ev_stream_session_windows",
    tags=("streaming", "session-window"),
    oracle="""
        WITH flagged AS (
          SELECT user_id, ts, value,
                 CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                             >= 30 * 60 * 1000000
                      OR lag(ts) OVER w IS NULL
                      THEN 1 ELSE 0 END AS brk
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), s AS (
          SELECT user_id, ts, value,
                 sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
          FROM flagged
        )
        SELECT user_id,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
               strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S')
                 AS session_end,
               count(*) AS n_events,
               CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
                 AS session_value
        FROM s GROUP BY user_id, sid
    """,
)
def ev_stream_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session windows (built-in merging ``session_window`` +
    watermark), drained with availableNow and checked against the
    batch gaps-and-islands closure in DuckDB. Boundary semantics
    mirrored exactly: a session window is [start, last+gap), so an
    event at EXACTLY gap distance starts a new session (>= break)."""
    from cqdg_etl_spark.streaming import read_event_stream, session_windows

    return _drain(
        session_windows(read_event_stream(spark, sf_dir)),
        "ev_stream_sessions",
        "complete",
        spark,
    )


@query(
    "ev_stream_stateful_totals",
    tags=("streaming", "stateful"),
    oracle="""
        SELECT user_id, count(*) AS n_events
        FROM events GROUP BY user_id
    """,
)
def ev_stream_stateful_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (``applyInPandasWithState``) through the
    driver gate: running per-user totals emit one row per user per
    micro-batch; the LAST emission per user (max of the monotone
    running count) is the deterministic final state, equal to the batch
    count regardless of how the source was split into batches. The
    float total_value is excluded from the contract (pandas pairwise
    summation is not oracle-reproducible); cross-batch state carry is
    exercised in tests/test_streaming.py with a multi-file source."""
    from pyspark.sql import functions as F

    from cqdg_etl_spark.streaming import read_event_stream
    from cqdg_etl_spark.streaming.stateful import running_user_totals

    drained = _drain(
        running_user_totals(read_event_stream(spark, sf_dir)),
        "ev_stream_state",
        "update",
        spark,
    )
    return drained.groupBy("user_id").agg(F.max("n_events").alias("n_events"))


@query(
    "ev_stream_left_outer_join",
    tags=("streaming", "stream-stream-join", "outer"),
    oracle="""
        SELECT p.user_id,
               p.event_id AS purchase_id,
               coalesce(v.event_id, CAST(-1 AS BIGINT)) AS view_id,
               CAST(coalesce(epoch_us(p.ts) - epoch_us(v.ts), -1) AS BIGINT)
                 AS gap_us
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON p.user_id = v.user_id
         AND v.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
    """,
)
def ev_stream_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream LEFT OUTER interval join: every
    purchase with its preceding-hour views, or a null-side row when no
    view matched. The outer (null-emitting) path is the stateful part
    append-mode can only resolve once the watermark passes the join
    window — unmatched left rows wait in state and flush when late
    views are provably impossible. Unmatched markers surface as -1 (the
    oracle's batch LEFT JOIN does the same) so the nullable side stays
    BIGINT on both engines. State eviction bounds match the inner
    variant: watermark 2 h + 1 h condition window."""
    from pyspark.sql import functions as F

    from cqdg_etl_spark.streaming import read_event_stream_with_flush

    # Watermark BEFORE the event-type filter: the far-future sentinel
    # rows must flow through the watermark node to advance it (a
    # post-filter watermark would never see them and the outer state
    # would sit unflushed — exactly the bug this source exists to
    # avoid). The alias keeps the event-time metadata.
    ev = read_event_stream_with_flush(
        spark, sf_dir, sentinel_types=("purchase", "view")
    ).withWatermark("ts", "2 hours")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
    joined = purchases.join(
        views,
        (F.col("p_user") == F.col("v_user"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("v_ts") <= F.col("p_ts")),
        "leftOuter",
    ).select(
        F.col("p_user").alias("user_id"),
        "purchase_id",
        F.coalesce(F.col("view_id"), F.lit(-1).cast("long")).alias("view_id"),
        F.coalesce(
            F.unix_micros("p_ts") - F.unix_micros("v_ts"),
            F.lit(-1).cast("long"),
        ).alias("gap_us"),
    ).filter(F.col("purchase_id") >= 0)  # drop the flush sentinels
    return _drain(joined, "ev_stream_lojoin", "append", spark)
