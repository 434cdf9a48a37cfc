"""Spark 4 SQL-surface features: recursive CTEs and SQL-defined
scalar functions (CREATE FUNCTION ... RETURN expr).

Both are pure-SQL surfaces users of a modern warehouse expect; both
run entirely JVM-side (a SQL UDF inlines into the plan as an
expression — zero Python boundary, unlike a registered Python UDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from cqdg_etl_spark.queries.registry import load, query


@query(
    "sql_recursive_supplier_tree",
    tags=("sql", "recursive-cte", "iterative"),
    oracle="""
        WITH RECURSIVE chain(suppkey, cur, depth) AS (
          SELECT s_suppkey, s_suppkey, 0 FROM supplier
          UNION ALL
          SELECT suppkey, cur // 2, depth + 1 FROM chain WHERE cur > 1
        )
        SELECT depth, count(*) AS n_suppliers,
               min(suppkey) AS min_key, max(suppkey) AS max_key
        FROM (SELECT suppkey, max(depth) AS depth FROM chain
              GROUP BY suppkey)
        GROUP BY depth
    """,
)
def sql_recursive_supplier_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (new in Spark 4): walk the implicit binary-tree
    hierarchy parent(k) = k div 2 from every supplier up to the root
    and report the depth distribution — the org-chart / BOM-explosion
    query shape. Each recursion step is one self-union iteration in
    Catalyst; depth is O(log n) here (≈14 levels at 10k keys), the
    regime recursive CTEs are for — unbounded-depth graphs belong to
    the dedicated iterative operators (operators/graph.py), which
    checkpoint lineage per round."""
    load(spark, sf_dir, "supplier").createOrReplaceTempView("supplier_rc")
    return spark.sql(
        """
        WITH RECURSIVE chain(suppkey, cur, depth) AS (
          SELECT s_suppkey, s_suppkey, 0 FROM supplier_rc
          UNION ALL
          SELECT suppkey, cur DIV 2, depth + 1 FROM chain WHERE cur > 1
        )
        SELECT depth, count(*) AS n_suppliers,
               min(suppkey) AS min_key, max(suppkey) AS max_key
        FROM (SELECT suppkey, max(depth) AS depth FROM chain
              GROUP BY suppkey)
        GROUP BY depth
        """
    )


@query(
    "sql_scalar_udf_revenue",
    tags=("sql", "sql-udf", "function"),
    oracle="""
        SELECT l_returnflag,
               CAST(round(sum(CAST(l_extendedprice * (1 - l_discount)
                                   AS DECIMAL(18,6))), 2) AS DOUBLE)
                 AS net_revenue
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def sql_scalar_udf_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-defined scalar function (Spark 4 CREATE FUNCTION ... RETURN
    expr): the pricing expression lives once as a catalog function and
    INLINES into the plan as a plain expression — whole-stage codegen,
    zero Python boundary, unlike py-UDF registration. The oracle
    inlines the same expression; the sum accumulates in exact decimal
    per the package money convention."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_udf")
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION net_price(
          p DOUBLE, d DOUBLE) RETURNS DOUBLE
        RETURN p * (1 - d)
        """
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(round(sum(CAST(net_price(l_extendedprice, l_discount)
                                   AS DECIMAL(18,6))), 2) AS DOUBLE)
                 AS net_revenue
        FROM lineitem_udf
        GROUP BY l_returnflag
        """
    )
