"""File sources: CSV / JSON with schema-on-read, mirroring the reference's
file adapter (example/csv/.../CsvSchemaFactory.java, CsvScannableTable.java,
JsonScannableTable.java) and its Drill-fork DYNAMIC_STAR schema-on-read
model (rel/type/DynamicRecordType.java:24-37).

Schema-on-read in Spark = inference at DataFrame construction
(SURVEY.md §1.3): ``inferSchema``/JSON sampling discovers the row type, and
``conform_to`` coerces the discovered type to a target catalog schema —
the validate-time type-fixing the reference does with DynamicRecordType.

Scale notes: inference samples the input (csv: one pass over the sample;
json: ``samplingRatio``); at 100 TB always pass an explicit schema or
conform_to a catalog one, never infer over the full input. Reads stay
lazy/partitioned; the writes here exist only to materialize test copies.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_csv_inferred(spark: SparkSession, path: str) -> DataFrame:
    """CSV with header + inferred types (CsvScannableTable's deduced row
    type, example/csv/.../CsvScannableTable.java)."""
    return spark.read.option("header", "true").option("inferSchema", "true").csv(path)


def read_json_inferred(spark: SparkSession, path: str) -> DataFrame:
    """JSON-lines with sampled schema inference
    (JsonScannableTable.java: row type discovered from the data)."""
    return spark.read.json(path)


def conform_to(df: DataFrame, schema: StructType) -> DataFrame:
    """Coerce a schema-on-read DataFrame to a target row type: project the
    target's columns in order, casting each. Missing columns become typed
    NULLs (the DYNAMIC_STAR '**' behavior: unknown fields resolve late)."""
    cols = []
    have = set(df.columns)
    for f in schema.fields:
        if f.name in have:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)


def ensure_csv_copy(spark: SparkSession, src_df: DataFrame, path: str) -> str:
    """Materialize a one-time CSV copy of a table (test fixture for the CSV
    source path). Timestamps are written ISO so they round-trip."""
    if not os.path.exists(path):
        src_df.coalesce(1).write.mode("overwrite").option("header", "true").csv(path)
    return path


def ensure_json_copy(spark: SparkSession, src_df: DataFrame, path: str) -> str:
    """Materialize a one-time JSON-lines copy of a table."""
    if not os.path.exists(path):
        src_df.coalesce(1).write.mode("overwrite").json(path)
    return path
