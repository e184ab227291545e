"""Headline TPC-H-style queries adapted to the driver's star schema.

Reference parity: the reference runs all 22 TPC-H queries as its integration
suite (plus/src/test/java/org/apache/calcite/adapter/tpch/TpchTest.java:944-946,
scale defs :46-53). The driver schema (TESTDATA.md) omits partsupp and several
columns, so the queries below are the faithful adaptations that exercise the
same operator spine: scan→filter→project→join→aggregate→sort→limit.

Scale notes: joins put the big fact table (lineitem/orders) on the probe side
and broadcast the bounded dims (region/nation/supplier — fixed or tiny);
customer/part joins are left to Catalyst+AQE, which picks broadcast vs
shuffled-hash from runtime stats. All filters are plain column predicates so
they reach the parquet scan (PushedFilters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from drill_calcite_spark.queries.common import (
    r2, r2_dsum, r4_davg, sql_r2_dsum, sql_r4_davg, t, ts,
)


# --------------------------------------------------------------------- Q1
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1: full-scan aggregate (Filter→Aggregate→Sort)."""
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= ts("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # money sums/averages through the exact DECIMAL/integer
            # forms (common.r2_dsum / r4_davg — the r8 hardening sweep);
            # sum_qty stays a plain double sum: quantities are integral,
            # so that sum is already exact and order-independent
            r2(F.sum("l_quantity")).alias("sum_qty"),
            r2_dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            r2_dsum(disc_price).alias("sum_disc_price"),
            r2_dsum(disc_price * (1 + F.col("l_tax"))).alias("sum_charge"),
            r4_davg(F.col("l_quantity")).alias("avg_qty"),
            r4_davg(F.col("l_extendedprice")).alias("avg_price"),
            r4_davg(F.col("l_discount")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = f"""
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       {sql_r2_dsum('l_extendedprice')} AS sum_base_price,
       {sql_r2_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
       {sql_r2_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
       {sql_r4_davg('l_quantity')} AS avg_qty,
       {sql_r4_davg('l_extendedprice')} AS avg_price,
       {sql_r4_davg('l_discount')} AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


# --------------------------------------------------------------------- Q3
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: 3-way join + agg + top-k (TakeOrderedAndProject)."""
    cust = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    ords = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < ts("1998-06-01"))
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > ts("1998-06-01"))
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(cust, ords.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(r2_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


Q3_SQL = f"""
SELECT l_orderkey, o_orderdate, o_orderpriority,
       {sql_r2_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-06-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


# --------------------------------------------------------------------- Q4
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4: correlated EXISTS → left-semi join (SemiJoinRule parity,
    rules/SubQueryRemoveRule.java)."""
    ords = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= ts("1996-07-01")) & (F.col("o_orderdate") < ts("1996-10-01"))
    )
    li = t(spark, sf_dir, "lineitem")
    cond = (li.l_orderkey == ords.o_orderkey) & (li.l_shipdate > ords.o_orderdate)
    return (
        ords.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# --------------------------------------------------------------------- Q5
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5: 6-way star join. region/nation/supplier broadcast-hinted —
    they are bounded-size dims at any scale factor."""
    region = F.broadcast(t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"))
    nation = F.broadcast(t(spark, sf_dir, "nation"))
    supplier = F.broadcast(t(spark, sf_dir, "supplier"))
    cust = t(spark, sf_dir, "customer")
    ords = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= ts("1996-01-01")) & (F.col("o_orderdate") < ts("1997-01-01"))
    )
    li = t(spark, sf_dir, "lineitem")
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(supplier, li.l_suppkey == supplier.s_suppkey)
        .join(cust, (ords.o_custkey == cust.c_custkey) & (cust.c_nationkey == supplier.s_nationkey))
        .join(nation, supplier.s_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(r2_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


Q5_SQL = f"""
SELECT n_name, {sql_r2_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# --------------------------------------------------------------------- Q6
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan-filter-agg; all predicates push to parquet."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= ts("1996-01-01"))
            & (F.col("l_shipdate") < ts("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(r2_dsum(F.col("l_extendedprice") * F.col("l_discount"))
             .alias("revenue"))
    )


Q6_SQL = f"""
SELECT {sql_r2_dsum('l_extendedprice * l_discount')} AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


# --------------------------------------------------------------------- Q10
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10: join + agg + top-k with customer attributes."""
    cust = t(spark, sf_dir, "customer")
    nation = F.broadcast(t(spark, sf_dir, "nation"))
    ords = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= ts("1996-10-01")) & (F.col("o_orderdate") < ts("1997-01-01"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(cust, ords.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(r2_dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


Q10_SQL = f"""
SELECT c_custkey, c_name, c_acctbal, n_name,
       {sql_r2_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
FROM customer, orders, lineitem, nation
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_returnflag = 'R' AND c_nationkey = n_nationkey
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


# --------------------------------------------------------------------- Q12
def q12_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 adaptation: conditional aggregation (CASE inside SUM —
    AggregateCaseToFilterRule parity, rules wired RelOptRules.java:125)."""
    ords = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= ts("1997-01-01")) & (F.col("l_shipdate") < ts("1998-01-01"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q12_SQL = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


# --------------------------------------------------------------------- Q14
def q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: scalar ratio of conditional aggregates."""
    part = t(spark, sf_dir, "part")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= ts("1997-01-01")) & (F.col("l_shipdate") < ts("1997-03-01"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            # round(100*sa/sb, 4) computed exactly in integer micros:
            # (2*10^6*ma + mb) div (2*mb) / 10^4 with ma, mb the
            # DECIMAL(18,6) sums in micros (r8 hardening; common.r4_davg
            # rationale — both sums non-negative here)
            (F.call_function(
                "div",
                F.lit(2) * F.lit(1000000)
                * (F.sum(F.when(F.col("p_type") == "PROMO", rev)
                         .otherwise(0.0).cast("decimal(18,6)"))
                   * F.lit(1000000)).cast("decimal(38,0)")
                + (F.sum(rev.cast("decimal(18,6)"))
                   * F.lit(1000000)).cast("decimal(38,0)"),
                F.lit(2) * (F.sum(rev.cast("decimal(18,6)"))
                            * F.lit(1000000)).cast("decimal(38,0)"),
            ) / F.lit(10000.0)).alias("promo_revenue")
        )
    )


Q14_SQL = """
WITH ms AS (
  SELECT CAST(sum((CASE WHEN p_type = 'PROMO'
              THEN l_extendedprice * (1 - l_discount)
              ELSE 0.0 END)::DECIMAL(18,6)) * 1000000 AS HUGEINT) AS ma,
         CAST(sum((l_extendedprice * (1 - l_discount))::DECIMAL(18,6))
              * 1000000 AS HUGEINT) AS mb
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-03-01 00:00:00'
)
SELECT ((2 * 1000000 * ma + mb) // (2 * mb)) / 10000.0 AS promo_revenue
FROM ms
"""


# --------------------------------------------------------------------- Q18
def q18_large_volume_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: IN over grouped HAVING sub-query (SubQueryRemoveRule parity).

    Single-pass form (r14): the HAVING aggregate IS the output measure —
    the textbook plan computes sum(l_quantity) per order for the IN
    sub-query, throws it away, then semi-joins lineitem back and re-sums
    the identical detail rows. Here the per-order aggregate is computed
    once and carried through: lineitem is scanned ONCE (was twice), the
    semi join and the second detail-row aggregation disappear, and the
    joins against orders/customer move aggregate-sized rows (one per
    qualifying order), not detail rows. Equivalent because o_orderkey is
    unique in orders and c_custkey in customer (the detail join never
    duplicated lineitem rows) and l_quantity is integral, so both
    summation shapes are exact in double. Oracle replays the textbook IN
    form."""
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 150)
    )
    ords = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    return (
        big.join(ords, big.l_orderkey == ords.o_orderkey)
        .join(cust, ords.o_custkey == cust.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(r2(F.sum("q")).alias("sum_qty"))
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(20)
    )


Q18_SQL = """
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       round(sum(l_quantity), 2) AS sum_qty
FROM customer, orders, lineitem
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                     GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
"""


# --------------------------------------------------------------------- Q22
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22: scalar sub-query + NOT EXISTS (anti join)."""
    cust = t(spark, sf_dir, "customer")
    # anti-join against *recent* orders: "customers with balance above average
    # who have placed no order since 2000" — non-vacuous at every SF.
    recent = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= ts("2000-01-01"))
    # Scalar sub-query as a broadcast 1-row cross join — stays lazy and
    # distributed (no driver collect), exactly how Catalyst plans it in SQL.
    avg_bal = F.broadcast(
        cust.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    return (
        cust.crossJoin(avg_bal)
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, cust.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(F.count("*").alias("numcust"), r2_dsum(F.col("c_acctbal")).alias("totacctbal"))
        .orderBy("c_nationkey")
    )


Q22_SQL = f"""
SELECT c_nationkey, count(*) AS numcust, {sql_r2_dsum('c_acctbal')} AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_nationkey
ORDER BY c_nationkey
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q4_order_priority": q4_order_priority,
    "q5_local_supplier_volume": q5_local_supplier_volume,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q10_returned_items": q10_returned_items,
    "q12_priority_shipping": q12_priority_shipping,
    "q14_promo_effect": q14_promo_effect,
    "q18_large_volume_customer": q18_large_volume_customer,
    "q22_global_sales_opportunity": q22_global_sales_opportunity,
}

ORACLES = {
    "q1_pricing_summary": Q1_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q4_order_priority": Q4_SQL,
    "q5_local_supplier_volume": Q5_SQL,
    "q6_forecast_revenue": Q6_SQL,
    "q10_returned_items": Q10_SQL,
    "q12_priority_shipping": Q12_SQL,
    "q14_promo_effect": Q14_SQL,
    "q18_large_volume_customer": Q18_SQL,
    "q22_global_sales_opportunity": Q22_SQL,
}
