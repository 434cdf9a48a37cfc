"""Round-3 batch 9: two more distribution-audit gates — an EXACT
Kolmogorov-Smirnov drift statistic and a Benford first-digit audit.

The KS statistic is computed as an all-integer maximum: the ECDF gap
|F1(x) − F2(x)| is max |c1·n2 − c2·n1| / (n1·n2), whose numerator is
integer-exact — no float comparison decides the max, so the statistic
is engine-exact before the final 6-dp ratio. Benford expectations are
the only libm values (round-6 pinned, package convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from cqdg_etl_spark.queries.registry import load, query

# --------------------------------------------------- exact KS drift


@query(
    "pf_ks_totalprice_drift",
    tags=("profile", "drift", "quality"),
    oracle="""
        WITH ref AS (
          SELECT o_totalprice AS x FROM orders
          WHERE o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        ),
        cur AS (
          SELECT o_totalprice AS x FROM orders
          WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        ),
        rc AS (SELECT x, count(*) AS c FROM ref GROUP BY x),
        cc AS (SELECT x, count(*) AS c FROM cur GROUP BY x),
        v AS (
          SELECT coalesce(rc.x, cc.x) AS x,
                 coalesce(rc.c, 0) AS c1,
                 coalesce(cc.c, 0) AS c2
          FROM rc FULL OUTER JOIN cc ON rc.x = cc.x
        ),
        cum AS (
          SELECT sum(c1) OVER (
                   ORDER BY x
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS cum1,
                 sum(c2) OVER (
                   ORDER BY x
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                 ) AS cum2
          FROM v
        ),
        t AS (
          SELECT (SELECT sum(c1) FROM v) AS n1,
                 (SELECT sum(c2) FROM v) AS n2
        )
        SELECT CAST(n1 AS BIGINT) AS n_ref,
               CAST(n2 AS BIGINT) AS n_cur,
               CAST(max(abs(cum1 * n2 - cum2 * n1)) AS BIGINT) AS ks_num,
               round(CAST(max(abs(cum1 * n2 - cum2 * n1)) AS DOUBLE)
                     / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6)
                 AS ks
        FROM cum, t GROUP BY n1, n2
    """,
)
def pf_ks_totalprice_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic between pre-1998
    and 1998+ o_totalprice — the nonparametric companion to the PSI
    gate (no binning choice to tune). One row: (n_ref, n_cur, ks_num,
    ks).

    Scale shape: per-side value-count aggregates (map-side combine
    collapses duplicates), a full-outer merge on value, then the two
    ECDF running counts via operators/ranking.py::global_cumsum —
    range-repartitioned prefix sums, never an empty-PARTITION-BY
    window over the distinct-value stream. The max-gap reduce is a
    1-row aggregate; the scalar totals are literals from the cumsum's
    own per-partition totals action (no second pass over v)."""
    from cqdg_etl_spark.operators.ranking import global_cumsum

    orders = load(spark, sf_dir, "orders")
    split = F.lit("1998-01-01 00:00:00").cast("timestamp")
    ref = orders.filter(F.col("o_orderdate") < split).select(
        F.col("o_totalprice").alias("x")
    )
    cur = orders.filter(F.col("o_orderdate") >= split).select(
        F.col("o_totalprice").alias("x")
    )
    rc = ref.groupBy("x").agg(F.count(F.lit(1)).alias("c1"))
    cc = cur.groupBy("x").agg(F.count(F.lit(1)).alias("c2"))
    v = (
        rc.join(cc, "x", "full_outer")
        .select(
            "x",
            F.coalesce("c1", F.lit(0)).alias("c1"),
            F.coalesce("c2", F.lit(0)).alias("c2"),
        )
    )
    # both ECDF running counts in ONE range-repartitioned pass; the
    # scalar totals ride out of the cumsum's own totals action as
    # literal columns (r11 — the separate v.agg + crossJoin re-ran
    # v's lineage: two orders scans plus the full-outer merge, for
    # two scalars the cumsum had already computed)
    cum = global_cumsum(
        v, [F.col("x").asc()], ["c1", "c2"], out_col=["cum1", "cum2"],
        total_col=["n1", "n2"],
    )
    gap = F.abs(
        F.col("cum1") * F.col("n2") - F.col("cum2") * F.col("n1")
    )
    return (
        cum
        .groupBy("n1", "n2")
        .agg(F.max(gap).alias("ks_num"))
        .select(
            F.col("n1").cast("long").alias("n_ref"),
            F.col("n2").cast("long").alias("n_cur"),
            F.col("ks_num").cast("long").alias("ks_num"),
            F.round(
                F.col("ks_num").cast("double")
                / (F.col("n1").cast("double") * F.col("n2").cast("double")),
                6,
            ).alias("ks"),
        )
    )


# ------------------------------------------------- Benford audit


@query(
    "pf_benford_totalprice",
    tags=("profile", "audit", "quality"),
    oracle="""
        WITH d AS (
          SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT)
                                     AS VARCHAR), 1, 1) AS BIGINT)
                   AS digit
          FROM orders
        ),
        c AS (SELECT digit, count(*) AS c FROM d GROUP BY digit),
        f AS (
          SELECT t.dig AS digit, CAST(coalesce(c.c, 0) AS BIGINT)
                   AS n_obs
          FROM (SELECT unnest(range(1, 10)) AS dig) t
          LEFT JOIN c ON c.digit = t.dig
        ),
        p AS (
          SELECT digit, n_obs,
                 CAST(n_obs AS DOUBLE)
                   / CAST(sum(n_obs) OVER () AS DOUBLE) AS p_obs,
                 ln(CAST(1.0 AS DOUBLE)
                    + CAST(1.0 AS DOUBLE) / CAST(digit AS DOUBLE))
                   / ln(CAST(10.0 AS DOUBLE)) AS p_ben,
                 CAST(sum(n_obs) OVER () AS DOUBLE) AS n
          FROM f
        )
        SELECT digit, n_obs,
               round(p_obs, 6) AS p_obs,
               round(p_ben, 6) AS p_benford,
               round((CAST(n_obs AS DOUBLE) - n * p_ben)
                     * (CAST(n_obs AS DOUBLE) - n * p_ben)
                     / (n * p_ben), 6) AS chi_term
        FROM p
    """,
)
def pf_benford_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of o_totalprice: observed vs Benford
    expected first-digit shares plus per-digit chi-square terms — the
    classic fabricated-/corrupted-numeric screen for ingest audits.
    One digit-keyed aggregate over the fact; the 9-row result is
    densified against range(1,10) and the share/expectation window
    runs over those 9 rows only."""
    orders = load(spark, sf_dir, "orders")
    digit = F.substring(
        F.floor(F.col("o_totalprice")).cast("long").cast("string"), 1, 1
    ).cast("long")
    c = (
        orders.select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    f = (
        spark.range(1, 10)
        .select(F.col("id").alias("digit"))
        .join(c, "digit", "left")
        .select("digit", F.coalesce("c", F.lit(0)).cast("long").alias("n_obs"))
    )
    w_all = W.partitionBy()
    n = F.sum("n_obs").over(w_all).cast("double")
    p_obs = F.col("n_obs").cast("double") / n
    p_ben = F.log(
        F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double")
    ) / F.log(F.lit(10.0))
    dev = F.col("n_obs").cast("double") - n * p_ben
    return f.select(
        "digit",
        "n_obs",
        F.round(p_obs, 6).alias("p_obs"),
        F.round(p_ben, 6).alias("p_benford"),
        F.round(dev * dev / (n * p_ben), 6).alias("chi_term"),
    )
