"""Relational analytics core — the join/agg machinery the reference's view
layer leans on (BigQuery executed it for them; Catalyst executes it for us),
exercised TPC-H-style on the testdata star schema.

Determinism note: money-like double columns are cast to DECIMAL before SUM so
the result is exact and independent of accumulation order (a double SUM over a
32-way shuffle is not bit-stable run to run, let alone engine to engine).
Averages are derived as exact-decimal-sum / count, rounded.

Scale notes:
  - Dimension sides (region/nation/customer/supplier/part) broadcast — at
    SF100k `customer` outgrows broadcast, so joins keyed on custkey fall back
    to shuffle-hash; AQE decides at runtime from actual sizes.
  - Group-by keys (returnflag/linestatus, orderkey) are low-skew; AQE skew
    handling covers the rest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.catalog import load_table

DEC = "decimal(18,4)"


def _dec(col: str):
    return F.col(col).cast(DEC)


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: wide scan + groupBy agg with exact decimal sums.

    The filter on l_shipdate reaches the parquet scan (PushedFilters) and the
    aggregation is partial (map-side combine) before the single shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = (_dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))).cast(
        "decimal(28,8)"
    )
    charge = (disc_price * (F.lit(1).cast(DEC) + _dec("l_tax"))).cast("decimal(38,12)")
    out = (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).alias("_sum_qty"),
            F.sum(_dec("l_extendedprice")).alias("_sum_base"),
            F.sum(disc_price).alias("_sum_disc"),
            F.sum(charge).alias("_sum_charge"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    cnt = F.col("count_order")
    return out.select(
        "l_returnflag",
        "l_linestatus",
        F.col("_sum_qty").cast("double").alias("sum_qty"),
        F.col("_sum_base").cast("double").alias("sum_base_price"),
        F.round(F.col("_sum_disc").cast("double"), 4).alias("sum_disc_price"),
        F.round(F.col("_sum_charge").cast("double"), 4).alias("sum_charge"),
        F.round(F.col("_sum_qty").cast("double") / cnt, 6).alias("avg_qty"),
        F.round(F.col("_sum_base").cast("double") / cnt, 6).alias("avg_price"),
        cnt,
    ).orderBy("l_returnflag", "l_linestatus")


def q1_oracle() -> str:
    return """
        SELECT
          l_returnflag,
          l_linestatus,
          CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
          CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
          ROUND(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(28,8))) AS DOUBLE), 4) AS sum_disc_price,
          ROUND(CAST(SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(28,8)) * (CAST(1 AS DECIMAL(18,4)) + CAST(l_tax AS DECIMAL(18,4))) AS DECIMAL(38,12))) AS DOUBLE), 4) AS sum_charge,
          ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6) AS avg_qty,
          ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*), 6) AS avg_price,
          COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: customer ⋈ orders ⋈ lineitem, agg, top-10.

    customer is broadcast (small side after the segment filter); orders ⋈
    lineitem co-shuffles on orderkey once.
    """
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-03-15").cast("timestamp")
    )
    revenue = (_dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))).cast(
        "decimal(28,8)"
    )
    return (
        li.join(orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(revenue).cast("double"), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


def q3_oracle() -> str:
    return """
        SELECT
          l_orderkey,
          o_orderdate,
          o_orderpriority,
          ROUND(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(28,8))) AS DOUBLE), 4) AS revenue
        FROM customer
        JOIN orders ON o_custkey = c_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1998-03-15'
          AND l_shipdate > TIMESTAMP '1996-03-15'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """


def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way star join; every dimension broadcasts, the
    lineitem fact never shuffles for the dimension joins."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    revenue = (_dec("l_extendedprice") * (F.lit(1).cast(DEC) - _dec("l_discount"))).cast(
        "decimal(28,8)"
    )
    return (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(
            F.broadcast(cust),
            (orders.o_custkey == cust.c_custkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(revenue).cast("double"), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


def q5_oracle() -> str:
    return """
        SELECT
          n_name,
          ROUND(CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4)) * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4))) AS DECIMAL(28,8))) AS DOUBLE), 4) AS revenue
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1998-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC, n_name
    """
