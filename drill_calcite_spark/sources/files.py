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


# ----------------------------------------------------------- HTML tables
# The reference's file adapter reads HTML <table> elements as relations
# (file/src/main/java/org/apache/calcite/adapter/file/FileReader.java:35
# — jsoup-parsed: doc.select("table") at :111, rows via
# tableElement.select("tr") at :159; FileRowConverter.java:45 maps cells
# to typed fields). The Spark-first equivalent keeps the FORMAT but not the
# single-threaded DOM parse: the writer emits ONE <tr> PER LINE, which
# makes the file a splittable text source — Spark's line-based text scan
# parallelizes it like any log file, and cell extraction is a JVM-side
# regexp per row (map-only, whole-stage codegen). A DOM parser would
# force whole-file reads; line-oriented HTML is still valid HTML.

_HTML_ESCAPES = [("&", "&amp;"), ("<", "&lt;"), (">", "&gt;")]


def _html_escape(col):
    out = col.cast("string")
    for raw, ent in _HTML_ESCAPES:
        out = F.replace(out, F.lit(raw), F.lit(ent))
    return out


def _html_unescape(col):
    out = col
    for raw, ent in reversed(_HTML_ESCAPES):
        out = F.replace(out, F.lit(ent), F.lit(raw))
    return out


def ensure_html_copy(spark: SparkSession, src_df: DataFrame, path: str) -> str:
    """Materialize a one-time HTML-table copy of a table: a <table>
    wrapper, one header <tr><th> line, one data <tr><td> line per row
    (cells &-escaped so markup characters round-trip)."""
    if not os.path.exists(path):
        cells = [F.concat(F.lit("<td>"), _html_escape(F.col(c)),
                          F.lit("</td>")) for c in src_df.columns]
        row = F.concat(F.lit("  <tr>"), *cells, F.lit("</tr>"))
        header = "  <tr>" + "".join(
            f"<th>{c}</th>" for c in src_df.columns) + "</tr>"
        wrapper = spark.createDataFrame(
            [("<table>",), (header,), ("</table>",)], "value string")
        (src_df.select(row.alias("value")).unionAll(wrapper)
         .coalesce(1).write.mode("overwrite").text(path))
    return path


def read_html_table(spark: SparkSession, path: str,
                    columns: list[str]) -> DataFrame:
    """Read a line-oriented HTML table: keep only <td> rows (the header's
    <th> row and the <table> wrapper fall out), extract cells with a
    non-greedy regexp, unescape entities, and name the columns from the
    declared list (FileRowConverter's field mapping). All string-typed —
    callers conform to a target row type (schema-on-read, like CSV)."""
    tds = F.regexp_extract_all(F.col("value"), F.lit("<td>(.*?)</td>"), 1)
    lines = spark.read.text(path)
    rows = lines.select(tds.alias("c")).filter(F.size(F.col("c")) > 0)
    return rows.select(*[
        _html_unescape(F.element_at(F.col("c"), i + 1)).alias(name)
        for i, name in enumerate(columns)
    ])
