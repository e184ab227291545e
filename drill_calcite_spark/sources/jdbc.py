"""JDBC adapter — read/write relational databases through Spark's JDBC
data source, mirroring the reference's JDBC schema adapter
(core/src/main/java/org/apache/calcite/adapter/jdbc/JdbcSchema.java,
JdbcTable.java: tables surfaced from DatabaseMetaData, scans pushed to the
remote engine).

Spark-first mapping: ``spark.read.format("jdbc")`` IS the adapter —
Catalyst pushes filters and column pruning into the generated remote SQL
(JDBCRelation/JDBCRDD), exactly the pushdown JdbcImplementor does in the
reference. What this module adds is the catalog-ish surface (url/table
handles, write-back, partitioned parallel reads).

Scale notes: a single JDBC connection is a serial pipe — at scale ALWAYS
pass ``partition_on`` (+ bounds) so the scan fans out into ``num_partitions``
range-predicated queries executed by different executors. Pushdown keeps
the transferred bytes at predicate-selectivity size; never read a remote
table without either a pushed filter or a partitioning spec.

The container bundles only Derby (Spark's metastore dependency), so tests
and queries run against an embedded-Derby database — the adapter surface
(URL, driver class, options) is identical for any server-side RDBMS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def derby_url(db_path: str, create: bool = False) -> str:
    """Embedded-Derby JDBC URL for a database directory."""
    return f"jdbc:derby:{db_path}" + (";create=true" if create else "")


def jdbc_write(
    df: DataFrame, url: str, table: str, *,
    driver: str = DERBY_DRIVER, mode: str = "overwrite",
    column_types: str | None = None,
) -> None:
    """CREATE TABLE + INSERT over JDBC (JdbcSchema's writable side).
    ``column_types`` overrides Spark's default DDL type mapping (e.g.
    Derby maps StringType to CLOB; pass 'c VARCHAR(64)' for sane columns).
    """
    w = (df.write.format("jdbc")
         .option("url", url).option("dbtable", table).option("driver", driver))
    if column_types:
        w = w.option("createTableColumnTypes", column_types)
    w.mode(mode).save()


def jdbc_read(
    spark: SparkSession, url: str, table: str, *,
    driver: str = DERBY_DRIVER,
    partition_on: str | None = None,
    lower: int | None = None, upper: int | None = None,
    num_partitions: int = 4,
) -> DataFrame:
    """TableScan over JDBC (JdbcTable.scan). ``table`` may be a table name
    or a parenthesized pushdown subquery ``(SELECT ...) t``. With
    ``partition_on``, the read issues ``num_partitions`` range-bounded
    remote queries in parallel — the distribution story at scale."""
    r = (spark.read.format("jdbc")
         .option("url", url).option("dbtable", table).option("driver", driver))
    if partition_on is not None:
        r = (r.option("partitionColumn", partition_on)
             .option("lowerBound", str(lower)).option("upperBound", str(upper))
             .option("numPartitions", str(num_partitions)))
    return r.load()
