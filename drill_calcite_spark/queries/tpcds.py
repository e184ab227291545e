"""TPC-DS-shape queries — the reference also plans the TPC-DS suite
(plus/src/test/java/org/apache/calcite/adapter/tpcds/TpcdsTest.java:62-69);
these two adapt its signature shapes to the driver star schema:

- ``ds_sales_rollup_rank`` — TPC-DS q67's shape: a multi-level ROLLUP over
  a star join, then RANK() partitioned by the top rollup level with a
  top-k filter. Exercises Expand → partial agg → window on AGGREGATED
  (small) data.
- ``ds_channel_report`` — TPC-DS q77's shape: per-channel sales and
  returns UNION ALLed, joined to a dim, rolled up with GROUPING markers.

Scale notes: the rollup aggregates carry map-side partial aggregation
through Spark's Expand (one input row → grouping-set rows BEFORE the
exchange, combined map-side, so the shuffle moves group rows, not fact
rows); the rank window runs over post-aggregate data (|types| ×
|brands| × |years| rows), never the fact table, and the channel union is
a single pass per branch over lineitem with the dims broadcast.
DECIMAL(18,6) sums for engine-identical totals (tpch2.py head); RANK
ordering carries a total tiebreak with explicit NULLS FIRST because
Spark and DuckDB default NULL ordering differently (ASC: Spark NULLS
FIRST, DuckDB NULLS LAST).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from drill_calcite_spark.queries.common import t

QUERIES = {}
ORACLES = {}


def q(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn
    return deco


def _dec_sum(c):
    return F.sum(c.cast("decimal(18,6)")).cast("double")


@q("ds_sales_rollup_rank", """
WITH src AS (
  SELECT p_type, p_brand, extract(year FROM o_orderdate) AS o_year,
         l_extendedprice, l_discount
  FROM lineitem
  JOIN orders ON o_orderkey = l_orderkey
  JOIN part ON p_partkey = l_partkey
), agg AS (
  SELECT p_type, p_brand, o_year,
         CAST(GROUPING(p_type) AS BIGINT)  AS g_type,
         CAST(GROUPING(p_brand) AS BIGINT) AS g_brand,
         CAST(GROUPING(o_year) AS BIGINT)  AS g_year,
         sum((l_extendedprice * (1 - l_discount))::DECIMAL(18,6))::DOUBLE
           AS sum_sales
  FROM src
  GROUP BY ROLLUP (p_type, p_brand, o_year)
)
SELECT p_type, p_brand, o_year, g_type, g_brand, g_year,
       round(sum_sales, 2) AS sum_sales, rk
FROM (
  SELECT *, CAST(rank() OVER (
      PARTITION BY p_type
      ORDER BY sum_sales DESC,
               o_year ASC NULLS FIRST, p_brand ASC NULLS FIRST
    ) AS BIGINT) AS rk
  FROM agg
)
WHERE rk <= 5
""")
def ds_sales_rollup_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q67 shape (TpcdsTest.java:62-69): revenue rolled up over
    (p_type, p_brand, order year), then the top 5 rollup rows per p_type
    by RANK. The rank ordering is total (sum_sales DESC, then year and
    brand with explicit NULLS FIRST) so ranks are engine-deterministic;
    ranking runs on aggregated rows only — the window never sees the
    fact table."""
    li = t(spark, sf_dir, "lineitem")
    ords = t(spark, sf_dir, "orders")
    part = t(spark, sf_dir, "part")

    j = (
        li.join(ords.select("o_orderkey", "o_orderdate"),
                li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(part.select("p_partkey", "p_type", "p_brand")),
              li.l_partkey == F.col("p_partkey"))
    )
    agg = (
        j.withColumn("o_year", F.year("o_orderdate").cast("bigint"))
        .rollup("p_type", "p_brand", "o_year")
        .agg(
            F.grouping("p_type").cast("bigint").alias("g_type"),
            F.grouping("p_brand").cast("bigint").alias("g_brand"),
            F.grouping("o_year").cast("bigint").alias("g_year"),
            _dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .alias("sum_sales"),
        )
    )
    w = Window.partitionBy("p_type").orderBy(
        F.desc("sum_sales"),
        F.asc_nulls_first("o_year"),
        F.asc_nulls_first("p_brand"),
    )
    return (
        agg.withColumn("rk", F.rank().over(w).cast("bigint"))
        .filter(F.col("rk") <= 5)
        .select("p_type", "p_brand", "o_year", "g_type", "g_brand", "g_year",
                F.round("sum_sales", 2).alias("sum_sales"), "rk")
    )


@q("ds_channel_report", """
WITH chan AS (
  SELECT 'sales' AS channel, o_custkey,
         (l_extendedprice * (1 - l_discount))::DECIMAL(18,6) AS amt
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE l_returnflag <> 'R'
  UNION ALL
  SELECT 'returns' AS channel, o_custkey,
         (-(l_extendedprice * (1 - l_discount)))::DECIMAL(18,6) AS amt
  FROM lineitem JOIN orders ON o_orderkey = l_orderkey
  WHERE l_returnflag = 'R'
)
SELECT channel, n_name,
       CAST(GROUPING(channel) AS BIGINT) AS g_chan,
       CAST(GROUPING(n_name) AS BIGINT)  AS g_nation,
       round(sum(amt)::DOUBLE, 2)        AS total_amt,
       CAST(count(*) AS BIGINT)          AS n_lines
FROM chan
JOIN customer ON c_custkey = o_custkey
JOIN nation ON n_nationkey = c_nationkey
GROUP BY ROLLUP (channel, n_name)
""")
def ds_channel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-DS q77 shape: sales and returns as UNION ALLed channels
    (returns negated), joined to the customer→nation dims, ROLLUP over
    (channel, nation) with GROUPING markers — the cross-channel report
    total appears at the grand-total level. Each branch is one scan of
    lineitem with the same orders join; nation broadcasts."""
    li = t(spark, sf_dir, "lineitem")
    ords = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    nation = t(spark, sf_dir, "nation")

    amt = (F.col("l_extendedprice") * (1 - F.col("l_discount")))

    def branch(flag_pred, channel: str, signed_amt):
        return (
            li.filter(flag_pred)
            .join(ords.select("o_orderkey", "o_custkey"),
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .select(
                F.lit(channel).alias("channel"),
                "o_custkey",
                signed_amt.cast("decimal(18,6)").alias("amt"),
            )
        )

    chan = branch(F.col("l_returnflag") != "R", "sales", amt).unionAll(
        branch(F.col("l_returnflag") == "R", "returns", -amt)
    )
    j = (
        chan.join(cust.select("c_custkey", "c_nationkey"),
                  F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return j.rollup("channel", "n_name").agg(
        F.grouping("channel").cast("bigint").alias("g_chan"),
        F.grouping("n_name").cast("bigint").alias("g_nation"),
        F.round(F.sum("amt").cast("double"), 2).alias("total_amt"),
        F.count(F.lit(1)).cast("bigint").alias("n_lines"),
    )
