"""Round-3 batch 8: semi-supervised label propagation, grouped
winsorization, and market-basket association rules.

Oracle conventions as per the package: fixed iteration counts make the
iterative algorithm unrollable into SQL, selections (order statistics)
instead of interpolated quantiles, integer counts under every ratio,
round(·, 6) on ratio outputs, total-order tiebreakers on every vote.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from cqdg_etl_spark.queries.registry import load, query

# ------------------------------------------- label propagation


_LP_ITERS = 3


def _lp_oracle(iters: int) -> str:
    rounds = []
    prev = "seeds"
    for i in range(1, iters + 1):
        rounds.append(
            f"""
        v{i} AS (
          SELECT e.dst AS node, l.label, count(*) AS cnt
          FROM edges e JOIN {prev} l ON l.node = e.src
          GROUP BY e.dst, l.label
        ),
        w{i} AS (
          SELECT node, label FROM (
            SELECT node, label, row_number() OVER (
              PARTITION BY node ORDER BY cnt DESC, label) AS rn
            FROM v{i}) t WHERE rn = 1
        ),
        r{i} AS (
          SELECT node, label FROM seeds
          UNION ALL
          SELECT w.node, w.label FROM w{i} w
          WHERE w.node NOT IN (SELECT node FROM seeds)
        )"""
        )
        prev = f"r{i}"
    return f"""
        WITH li AS (
          SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        pr AS (
          SELECT a.l_partkey AS src, b.l_partkey AS dst
          FROM li a JOIN li b
            ON a.l_orderkey = b.l_orderkey
           AND a.l_partkey < b.l_partkey
          GROUP BY src, dst
        ),
        edges AS (
          SELECT src, dst FROM pr
          UNION ALL SELECT dst AS src, src AS dst FROM pr
        ),
        seeds AS (
          SELECT p_partkey AS node, p_partkey % 3 AS label
          FROM part WHERE p_partkey % 10 = 0
        ),{','.join(rounds)}
        SELECT node, label FROM {prev}
    """


@query(
    "graph_label_propagation",
    tags=("graph", "datapipe", "weak-supervision"),
    oracle=_lp_oracle(_LP_ITERS),
)
def graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-supervised label propagation (operators/graph.py::
    label_propagation) over the part co-purchase graph: every 10th
    part is a clamped seed (label = partkey mod 3); 3 fixed
    majority-vote rounds spread labels to the rest — the
    weak-supervision primitive, oracle-checked through a fully
    unrolled 3-round SQL twin."""
    from cqdg_etl_spark.operators.graph import label_propagation

    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .select(
            F.col("a.l_partkey").alias("src"),
            F.col("b.l_partkey").alias("dst"),
        )
        .distinct()
    )
    edges = pairs.union(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    seeds = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_partkey") % 10 == 0)
        .select(
            F.col("p_partkey").alias("node"),
            (F.col("p_partkey") % 3).alias("label"),
        )
    )
    return label_propagation(edges, seeds, iterations=_LP_ITERS)


# ------------------------------------------------ winsorization


@query(
    "fe_winsorize_totalprice",
    tags=("feature", "robust", "quality"),
    oracle="""
        WITH t AS (
          SELECT o_orderkey, o_orderpriority AS grp, o_totalprice AS x
          FROM orders
        ),
        r AS (
          SELECT *,
                 row_number() OVER (
                   PARTITION BY grp ORDER BY x, o_orderkey) AS rn,
                 count(*) OVER (PARTITION BY grp) AS n
          FROM t
        ),
        b AS (
          SELECT grp,
                 max(CASE WHEN rn = greatest(
                       1, CAST(ceil(0.05 * n) AS BIGINT))
                     THEN x END) AS lo,
                 max(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT)
                     THEN x END) AS hi
          FROM r GROUP BY grp
        )
        SELECT o_orderkey, grp AS o_orderpriority, x AS o_totalprice,
               least(greatest(x, lo), hi) AS w_totalprice
        FROM t JOIN b USING (grp)
    """,
)
def fe_winsorize_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority winsorization of o_totalprice at the 5th/95th
    order statistics — outlier clamping for robust features. The
    bounds are SELECTIONS (the rank-⌈q·n⌉ element under a total
    order), not interpolated quantiles, so they are engine-exact; the
    per-group bound table is |groups| rows and broadcast back onto
    the fact. Two shuffles: the rank window and the fact's own
    partitioning for the join."""
    t = load(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("grp"),
        F.col("o_totalprice").alias("x"),
    )
    wr = W.partitionBy("grp").orderBy("x", "o_orderkey")
    r = t.select(
        "grp",
        "x",
        F.row_number().over(wr).cast("long").alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("grp")).alias("n"),
    )
    lo_rn = F.greatest(
        F.lit(1).cast("long"), F.ceil(F.lit(0.05) * F.col("n")).cast("long")
    )
    hi_rn = F.ceil(F.lit(0.95) * F.col("n")).cast("long")
    b = r.groupBy("grp").agg(
        F.max(F.when(F.col("rn") == lo_rn, F.col("x"))).alias("lo"),
        F.max(F.when(F.col("rn") == hi_rn, F.col("x"))).alias("hi"),
    )
    return t.join(F.broadcast(b), "grp").select(
        "o_orderkey",
        F.col("grp").alias("o_orderpriority"),
        F.col("x").alias("o_totalprice"),
        F.least(F.greatest(F.col("x"), F.col("lo")), F.col("hi")).alias(
            "w_totalprice"
        ),
    )


# ------------------------------------------- association rules


_MB_MIN_PAIR = 2


@query(
    "mb_association_rules",
    tags=("analytics", "market-basket"),
    oracle=f"""
        WITH li AS (
          SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
        ),
        n_ord AS (
          SELECT count(DISTINCT l_orderkey) AS n FROM li
        ),
        ic AS (
          SELECT l_partkey, count(*) AS c FROM li GROUP BY l_partkey
        ),
        pairs AS (
          SELECT a.l_partkey AS pa, b.l_partkey AS pb,
                 count(*) AS np
          FROM li a JOIN li b
            ON a.l_orderkey = b.l_orderkey
           AND a.l_partkey < b.l_partkey
          GROUP BY pa, pb HAVING count(*) >= {_MB_MIN_PAIR}
        )
        SELECT pa AS part_a, pb AS part_b,
               CAST(np AS BIGINT) AS n_pair,
               CAST(ca.c AS BIGINT) AS n_a,
               CAST(cb.c AS BIGINT) AS n_b,
               round(CAST(np AS DOUBLE) / CAST(n AS DOUBLE), 6)
                 AS support,
               round(CAST(np AS DOUBLE) / CAST(ca.c AS DOUBLE), 6)
                 AS conf_ab,
               round(CAST(np AS DOUBLE) / CAST(cb.c AS DOUBLE), 6)
                 AS conf_ba,
               round(CAST(np AS DOUBLE) * CAST(n AS DOUBLE)
                     / (CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE)), 6)
                 AS lift
        FROM pairs
        JOIN ic ca ON ca.l_partkey = pa
        JOIN ic cb ON cb.l_partkey = pb
        CROSS JOIN n_ord
    """,
)
def mb_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over order baskets: pairwise
    support / confidence (both directions) / lift for part pairs
    co-ordered ≥ 2 times. Per-basket pair enumeration is bounded by
    the basket size (≤ 7 lines per TPC-H order), so the pair explode
    is linear in the fact table; item counts ride a small broadcast
    join and the basket total is a 1-row scalar. All ratios are
    integer-over-integer — engine-exact before the 6-dp round."""
    li = (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_ord = li.agg(
        F.countDistinct("l_orderkey").alias("n")
    )
    ic = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("c"))
    a, b = li.alias("a"), li.alias("b")
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("a.l_partkey") < F.col("b.l_partkey"))
        .groupBy(
            F.col("a.l_partkey").alias("pa"),
            F.col("b.l_partkey").alias("pb"),
        )
        .agg(F.count(F.lit(1)).alias("np"))
        .filter(F.col("np") >= _MB_MIN_PAIR)
    )
    ca = ic.select(F.col("l_partkey").alias("pa"), F.col("c").alias("c_a"))
    cb = ic.select(F.col("l_partkey").alias("pb"), F.col("c").alias("c_b"))
    npd = F.col("np").cast("double")
    nd = F.col("n").cast("double")
    cad = F.col("c_a").cast("double")
    cbd = F.col("c_b").cast("double")
    return (
        pairs.join(F.broadcast(ca), "pa")
        .join(F.broadcast(cb), "pb")
        .crossJoin(F.broadcast(n_ord))
        .select(
            F.col("pa").alias("part_a"),
            F.col("pb").alias("part_b"),
            F.col("np").cast("long").alias("n_pair"),
            F.col("c_a").cast("long").alias("n_a"),
            F.col("c_b").cast("long").alias("n_b"),
            F.round(npd / nd, 6).alias("support"),
            F.round(npd / cad, 6).alias("conf_ab"),
            F.round(npd / cbd, 6).alias("conf_ba"),
            F.round(npd * nd / (cad * cbd), 6).alias("lift"),
        )
    )
