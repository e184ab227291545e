"""Bucketed tables — co-located (shuffle-free) joins.

Reference parity: Calcite models physical distribution with
``RelDistribution`` / ``Exchange`` and plans away redundant exchanges when
inputs are already hash-distributed on the join key
(core/src/main/java/org/apache/calcite/rel/RelDistribution.java:33,
rel/core/Exchange.java). Spark's equivalent physical contract is the
BUCKETED TABLE: ``bucketBy(n, key)`` pre-hash-partitions data at write
time, and a join of two tables bucketed on the join key with the same
bucket count needs NO shuffle on either side — the single biggest join
optimization available at 100 TB (the fact-table shuffle is usually the
bottleneck stage; bucketing amortizes it into the write once).

Sort-merge friendliness: ``sortBy(key)`` inside buckets lets the join skip
the sort too. Bucket counts must match (or divide evenly, with
spark.sql.bucketing.coalesceBucketsInJoin.enabled).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def create_bucketed_table(
    df: DataFrame, name: str, key: str, buckets: int,
) -> None:
    """Persist ``df`` as a bucketed+sorted managed table (overwrite).

    Idempotent across sessions: a managed-table LOCATION left behind by a
    previous session (whose in-memory catalog is gone) is cleared first —
    overwrite alone refuses to reuse an orphaned location."""
    import shutil
    from urllib.parse import urlparse

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    leftover = f"{wh.rstrip('/')}/{name.lower()}"
    shutil.rmtree(leftover, ignore_errors=True)
    (df.write.mode("overwrite")
     .bucketBy(buckets, key).sortBy(key)
     .format("parquet").saveAsTable(name))


def assert_no_shuffle_join(df: DataFrame) -> None:
    """Raise if the physical plan shuffles either join input — the proof
    the bucketed layout was honored. (AQE wraps the plan; the check runs
    on the initial physical plan, where a bucketed join shows scans
    feeding SortMergeJoin directly.)"""
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "Exchange hashpartitioning" in plan:
        raise AssertionError(
            "bucketed join still shuffles:\n" + plan[:2000]
        )


def colocated_join(
    spark: SparkSession, left: str, right: str, left_key: str, right_key: str,
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket keys."""
    lt = spark.table(left)
    rt = spark.table(right)
    return lt.join(rt, lt[left_key] == rt[right_key])
