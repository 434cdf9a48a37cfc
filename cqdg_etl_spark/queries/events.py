"""Event-stream analytics (batch form) over the events table.

The streaming counterparts (readStream + watermark + windowed agg /
session_window) live in cqdg_etl_spark/streaming/; these batch versions
define the exact semantics and are oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from cqdg_etl_spark.queries.registry import dec_sum, load, query

SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min in microseconds


@query(
    "ev_tumbling_hourly",
    bench=True,
    tags=("events", "window-agg"),
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
def ev_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour window aggregate via F.window — epoch-aligned, so
    identical to date_trunc('hour') bucketing."""
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            dec_sum(F.col("value")).alias("total_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
            "event_type",
            "n_events",
            "total_value",
            "n_users",
        )
    )


@query(
    "ev_sessionize",
    tags=("events", "session", "window"),
    oracle=f"""
        WITH flagged AS (
          SELECT user_id, ts, value,
                 CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                             > {SESSION_GAP_US}
                      OR lag(ts) OVER w IS NULL
                      THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sessions AS (
          SELECT user_id, ts, value,
                 CAST(sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS BIGINT) AS session_id
          FROM flagged
        )
        SELECT user_id, session_id,
               count(*) AS n_events,
               CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS session_value,
               strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start
        FROM sessions
        GROUP BY user_id, session_id
    """,
)
def ev_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: 30-min inactivity gap → new session (lag + cumsum).

    The reference has no streaming/session surface; this is the standard
    large-scale pattern (one shuffle on user_id, windows reuse it).
    """
    events = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    flagged = events.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > SESSION_GAP_US), F.lit(1)).otherwise(F.lit(0)),
    )
    w_cum = (
        W.partitionBy("user_id")
        .orderBy("ts")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(w_cum))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        dec_sum(F.col("value")).alias("session_value"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
    )
