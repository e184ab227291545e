"""Shared helpers for the query registry.

Conventions that keep the DuckDB oracle hash-compatible (driver contract):
- every computed column is aliased identically on both sides;
- float aggregates are rounded in-query (sums→2dp, ratios/avgs→4-6dp) so
  summation-order differences between engines vanish;
- integer-typed computed outputs are cast to BIGINT on the Spark side because
  DuckDB's extract/count family returns BIGINT;
- result sets under LIMIT carry a total tiebreak ordering so both engines pick
  identical rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from drill_calcite_spark.catalog import read_table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one table from the scale-factor dir (lazy parquet scan)."""
    return read_table(spark, sf_dir, name)


def ts(literal: str) -> F.Column:
    """A date literal usable against TIMESTAMP columns in both engines."""
    return F.lit(literal).cast("timestamp")


def r2(c: F.Column) -> F.Column:
    return F.round(c, 2)


def r4(c: F.Column) -> F.Column:
    return F.round(c, 4)


def r6(c: F.Column) -> F.Column:
    return F.round(c, 6)
