"""TPC-H queries 7, 8, 13, 15, 17, 19 (with tpch.py's 10 and tpch3.py's
6, all 22 of the reference's TpchTest suite are registered —
plus/src/test/java/org/apache/calcite/adapter/tpch/TpchTest.java:944-946;
tpch3.py documents the schema adaptations the last six need).

Scale notes as in tpch.py: dims broadcast (nation explicitly, supplier/part
via AQE), facts on the probe side, all filters pushdown-shaped. Q17's
correlated scalar sub-query is expressed as a pre-aggregated broadcast join
(what Catalyst's decorrelation produces anyway). Float sums go through
DECIMAL(18,6) where a result feeds a division, to keep both engines
bit-identical (see queries/streaming.py note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from drill_calcite_spark.queries.common import r2, t, ts

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


# --------------------------------------------------------------------- Q7
@q("q7_volume_shipping", """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       extract(year FROM l_shipdate) AS l_year,
       sum((l_extendedprice * (1 - l_discount))::DECIMAL(18,6))::DOUBLE AS revenue
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON n1.n_nationkey = s_nationkey
JOIN nation n2 ON n2.n_nationkey = c_nationkey
WHERE ((n1.n_name = 'NATION_6' AND n2.n_name = 'NATION_7')
    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_6'))
  AND l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                     AND TIMESTAMP '1996-12-31 00:00:00'
GROUP BY 1, 2, 3
""")
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7: shipping volume between two nations by year. Two nation
    joins against the same dim (broadcast both); fact chain
    lineitem→orders→customer stays on the shuffle side."""
    li = t(spark, sf_dir, "lineitem")
    ords = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    nation = t(spark, sf_dir, "nation")
    n1 = F.broadcast(nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    ))
    n2 = F.broadcast(nation.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    ))
    j = (
        li.filter(
            (F.col("l_shipdate") >= ts("1995-01-01"))
            & (F.col("l_shipdate") <= ts("1996-12-31"))
        )
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(ords, li.l_orderkey == ords.o_orderkey)
        .join(cust, ords.o_custkey == cust.c_custkey)
        .join(n1, supp.s_nationkey == F.col("s_nkey"))
        .join(n2, cust.c_nationkey == F.col("c_nkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_6") & (F.col("cust_nation") == "NATION_7"))
            | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_6"))
        )
    )
    return (
        j.groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(_dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("revenue"))
    )


# --------------------------------------------------------------------- Q8
@q("q8_market_share", """
WITH all_nations AS (
  SELECT extract(year FROM o_orderdate) AS o_year,
         (l_extendedprice * (1 - l_discount))::DECIMAL(18,6) AS volume,
         n1.n_name AS nation
  FROM lineitem
  JOIN part     ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON n1.n_nationkey = s_nationkey
  JOIN nation n2 ON n2.n_nationkey = c_nationkey
  JOIN region   ON r_regionkey = n2.n_regionkey
  WHERE r_name = 'AMERICA' AND p_type = 'PROMO'
    AND o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                        AND TIMESTAMP '1996-12-31 00:00:00'
)
SELECT o_year,
       (sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END)::DOUBLE
        / sum(volume)::DOUBLE) AS mkt_share
FROM all_nations GROUP BY o_year
""")
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: national market share inside a region. The CASE-guarded
    share is two decimal sums and one double division — engine-portable."""
    li = t(spark, sf_dir, "lineitem")
    ords = t(spark, sf_dir, "orders")
    cust = t(spark, sf_dir, "customer")
    supp = t(spark, sf_dir, "supplier")
    part = t(spark, sf_dir, "part")
    nation = t(spark, sf_dir, "nation")
    region = t(spark, sf_dir, "region")
    n1 = F.broadcast(nation.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("nation")
    ))
    n2 = F.broadcast(nation.select(
        F.col("n_nationkey").alias("c_nkey"),
        F.col("n_regionkey").alias("c_rkey"),
    ))
    j = (
        li.join(F.broadcast(part.filter(F.col("p_type") == "PROMO")),
                li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(
            ords.filter(
                (F.col("o_orderdate") >= ts("1995-01-01"))
                & (F.col("o_orderdate") <= ts("1996-12-31"))
            ),
            li.l_orderkey == ords.o_orderkey,
        )
        .join(cust, ords.o_custkey == cust.c_custkey)
        .join(n1, supp.s_nationkey == F.col("s_nkey"))
        .join(n2, cust.c_nationkey == F.col("c_nkey"))
        .join(F.broadcast(region.filter(F.col("r_name") == "AMERICA")),
              F.col("c_rkey") == region.r_regionkey)
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        j.groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("nation") == "NATION_3", vol)
                      .otherwise(0.0).cast("decimal(18,6)")).cast("double")
                / F.sum(vol.cast("decimal(18,6)")).cast("double")
            ).alias("mkt_share")
        )
    )


# -------------------------------------------------------------------- Q13
@q("q13_customer_distribution", """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY c_count
""")
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: customers by order count (double aggregation over a left
    outer join — exercises null-count semantics)."""
    cust = t(spark, sf_dir, "customer")
    ords = t(spark, sf_dir, "orders")
    per = (
        cust.join(ords, cust.c_custkey == ords.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per.groupBy("c_count").agg(F.count("*").alias("custdist"))


# -------------------------------------------------------------------- Q15
@q("q15_top_supplier", """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         sum((l_extendedprice * (1 - l_discount))::DECIMAL(18,6))::DOUBLE
           AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
""")
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) with max quarterly revenue — a scalar
    sub-query against a derived view. The scalar max is computed as a
    1-row aggregate broadcast-crossJoined back (not a global window,
    which would funnel every supplier aggregate through one partition
    at scale)."""
    li = t(spark, sf_dir, "lineitem")
    supp = t(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= ts("1996-01-01"))
            & (F.col("l_shipdate") < ts("1996-04-01"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(_dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
             .alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    best = (
        rev.join(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__mx"))
        .drop("__mx")
    )
    return (
        best.join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


# -------------------------------------------------------------------- Q17
@q("q17_small_quantity", """
SELECT (sum(l_extendedprice::DECIMAL(18,6))::DOUBLE / 7.0) AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (
    SELECT 0.2 * avg(l_quantity) FROM lineitem l2
    WHERE l2.l_partkey = lineitem.l_partkey
  )
""")
def q17_small_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: small-quantity revenue via a correlated scalar AVG
    sub-query — decorrelated into a per-part pre-aggregate joined back
    (the plan Catalyst's RewriteCorrelatedScalarSubquery builds)."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    per_part = li.groupBy(F.col("l_partkey").alias("pp_key")).agg(
        (F.avg("l_quantity") * 0.2).alias("qty_cap")
    )
    j = (
        li.join(F.broadcast(part.filter(F.col("p_brand") == "Brand#1")),
                li.l_partkey == part.p_partkey)
        .join(per_part, li.l_partkey == F.col("pp_key"))
        .filter(F.col("l_quantity") < F.col("qty_cap"))
    )
    return j.agg(
        (_dec_sum(F.col("l_extendedprice")) / 7.0).alias("avg_yearly")
    )


# -------------------------------------------------------------------- Q19
@q("q19_discounted_revenue", """
SELECT sum((l_extendedprice * (1 - l_discount))::DECIMAL(18,6))::DOUBLE
         AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
""")
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19: disjunctive multi-attribute predicate across the join —
    exercises OR-of-ANDs pushdown and join-condition placement."""
    li = t(spark, sf_dir, "lineitem")
    part = t(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 25)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 35)
           & F.col("l_quantity").between(20, 30))
    )
    return j.filter(cond).agg(
        _dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .alias("revenue")
    )
