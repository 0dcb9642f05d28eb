"""Static-table transforms + subquery-shaped relational operators.

Parity:
  static_mapping      transform/web100.sql + transform/create_static_tables.sh
                      — the reference maintains small static lookup tables
                      (web100 variable mappings) joined against measurement
                      data. Here: an inline mapping table broadcast-joined to
                      events (the mapping never shuffles the fact side).
  q18_big_orders      TPC-H Q18 shape — groupBy + HAVING feeding a semi join
                      (the "large volume customer" pattern the unified views
                      use for cohort selection).
  q22_inactive        TPC-H Q22 shape — anti join (clients with no recent
                      activity), Catalyst's LeftAnti, no driver-side loop.

Scale notes: the mapping table is O(10) rows → broadcast; Q18's HAVING
aggregate shuffles lineitem once on orderkey, and the semi join reuses that
partitioning; Q22's anti join broadcasts the filtered orders key set when
small, else shuffles both sides once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .contracts import finite_value, finite_value_sql

# static mapping table (transform/web100.sql parity: variable-name mapping)
EVENT_CATEGORY = [
    ("click", "engagement", 1.0),
    ("view", "engagement", 0.5),
    ("purchase", "revenue", 2.0),
    ("signup", "growth", 3.0),
    ("error", "ops", 0.0),
]


def static_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join events to a static category mapping and roll up weighted counts."""
    ev = load_table(spark, sf_dir, "events")
    mapping = spark.createDataFrame(
        EVENT_CATEGORY, "event_type string, category string, weight double"
    )
    return (
        ev.join(F.broadcast(mapping), "event_type")
        .groupBy("category")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # guarded lift (contracts.py, fuzz wave 5): a corrupt value
            # leaves the weighted sum, COUNT(*) keeps the row
            F.round(
                F.sum(
                    F.when(
                        finite_value("value"), F.col("value") * F.col("weight")
                    ).cast("decimal(18,4)")
                ).cast("double"),
                4,
            ).alias("weighted_value"),
        )
        .orderBy("category")
    )


def static_mapping_oracle() -> str:
    values = ", ".join(f"('{t}', '{c}', {w})" for t, c, w in EVENT_CATEGORY)
    return f"""
        WITH mapping(event_type, category, weight) AS (VALUES {values})
        SELECT category,
               COUNT(*) AS n_events,
               ROUND(CAST(SUM(CAST(CASE WHEN {finite_value_sql("value")}
                                        THEN value * weight END
                                   AS DECIMAL(18,4))) AS DOUBLE), 4)
                 AS weighted_value
        FROM events JOIN mapping USING (event_type)
        GROUP BY category ORDER BY category
    """


def q18_big_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose total quantity exceeds a threshold
    (groupBy + HAVING → semi join back to orders + customer)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,4)")).alias("_qty"))
        .filter(F.col("_qty") > 150)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("_qty").cast("double").alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
    )


def q18_oracle() -> str:
    return """
        SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
               CAST(_qty AS DOUBLE) AS total_qty
        FROM orders
        JOIN (
          SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,4))) AS _qty
          FROM lineitem GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 150
        ) big ON o_orderkey = big.l_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
    """


def q22_inactive_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: positive-balance customers with no recent orders
    (anti join against the filtered order stream), aggregated per nation."""
    cust = load_table(spark, sf_dir, "customer")
    recent = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp")
    )
    inactive = cust.filter(F.col("c_acctbal") > 0).join(
        recent, cust.c_custkey == recent.o_custkey, "left_anti"
    )
    return (
        inactive.groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.round(
                F.sum(F.col("c_acctbal").cast("decimal(18,4)")).cast("double"), 4
            ).alias("total_bal"),
        )
        .orderBy("c_nationkey")
    )


def q22_oracle() -> str:
    return """
        SELECT c_nationkey,
               COUNT(*) AS n_custs,
               ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE), 4) AS total_bal
        FROM customer
        WHERE c_acctbal > 0
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY c_nationkey ORDER BY c_nationkey
    """
