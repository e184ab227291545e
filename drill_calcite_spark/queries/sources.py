"""Source / sink queries (SURVEY.md §2.3): CSV and JSON schema-on-read
scans (the reference's file adapter + DYNAMIC_STAR model) and TableModify
DML (INSERT / DELETE / UPDATE / MERGE, rel/core/TableModify.java:54) over
copy-on-write versioned parquet.

Fixtures are materialized once per scale dir under /tmp (deterministic
copies of the driver tables); every query recreates its DML target from
scratch so runs are idempotent — the oracle can therefore state the
expected end state in plain SQL over the original tables.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from drill_calcite_spark.queries.common import t
from drill_calcite_spark.sources.files import (
    conform_to,
    ensure_csv_copy,
    ensure_html_copy,
    ensure_json_copy,
    read_csv_inferred,
    read_html_table,
    read_json_inferred,
)
from drill_calcite_spark.sources.modify import (
    create_table,
    delete_where,
    insert_into,
    merge_into,
    read_versioned,
    update_where,
)

QUERIES = {}
ORACLES = {}


def q(name: str, sql: str | None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn
    return deco


def _fixture_dir(sf_dir: str) -> str:
    tag = os.path.basename(sf_dir.rstrip("/"))
    d = f"/tmp/spark_graft_fixtures/{tag}"
    os.makedirs(d, exist_ok=True)
    return d


@q("source_partition_pruning", """
SELECT extract(year FROM o_orderdate)::BIGINT AS o_year,
       count(*) AS n,
       sum(o_totalprice::DECIMAL(18,6))::DOUBLE AS revenue
FROM orders
WHERE extract(year FROM o_orderdate) IN (1995, 1996)
GROUP BY 1
""")
def source_partition_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STATIC PARTITION PRUNING — the reference prunes scans with
    filter-pushdown rules (FilterTableScanRule, rules/RelOptRules listing);
    Spark's equivalent at the storage layer is hive-style partitioned
    parquet: orders is materialized partitioned by year, and a year filter
    prunes whole directories from the listing BEFORE any I/O. The plan
    assertion proves the predicate landed in PartitionFilters (pruning the
    file index) and NOT in DataFilters (a post-scan row filter) — at
    100 TB this is the difference between scanning 7 years and 2. The
    oracle runs the same filter over the unpartitioned base."""
    fd = _fixture_dir(sf_dir)
    path = os.path.join(fd, "orders_by_year")
    done = os.path.join(path, "_SUCCESS")
    if not os.path.exists(done):
        (t(spark, sf_dir, "orders")
         .withColumn("o_year", F.year("o_orderdate").cast("long"))
         .write.mode("overwrite").partitionBy("o_year").parquet(path))
    part = spark.read.parquet(path).filter(F.col("o_year").isin(1995, 1996))
    plan = part._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [o_year" in plan and "DataFilters: []" in plan, \
        "year predicate did not become a partition filter:\n" + plan[:1500]
    return part.groupBy("o_year").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double")
        .alias("revenue"),
    )


@q("source_dynamic_pruning", """
WITH eras AS (
  SELECT * FROM (VALUES (1995, 'early'), (1996, 'early'), (1997, 'late'),
                        (1998, 'late'), (1999, 'late'), (2000, 'late'),
                        (2001, 'late')) AS t(yr, era)
)
SELECT era, count(*) AS n,
       sum(o_totalprice::DECIMAL(18,6))::DOUBLE AS revenue
FROM orders JOIN eras ON extract(year FROM o_orderdate) = yr
WHERE era = 'early'
GROUP BY era
""")
def source_dynamic_pruning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC PARTITION PRUNING: the partition filter isn't a literal —
    it's the set of years surviving a filter on a joined dimension, known
    only at runtime. Catalyst injects a dynamicpruning subquery into the
    fact scan's PartitionFilters (the runtime analogue of the reference's
    FilterTableScanRule + join transitive closure), so only the dimension-
    selected year directories are read. Asserted via the plan; results
    hash-match the plain-join oracle."""
    fd = _fixture_dir(sf_dir)
    path = os.path.join(fd, "orders_by_year")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        (t(spark, sf_dir, "orders")
         .withColumn("o_year", F.year("o_orderdate").cast("long"))
         .write.mode("overwrite").partitionBy("o_year").parquet(path))
    fact = spark.read.parquet(path)
    eras = spark.createDataFrame(
        [(1995, "early"), (1996, "early"), (1997, "late"), (1998, "late"),
         (1999, "late"), (2000, "late"), (2001, "late")], "yr long, era string"
    ).filter(F.col("era") == "early")
    joined = fact.join(F.broadcast(eras), fact.o_year == eras.yr)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan, \
        "no dynamic partition pruning subquery in the fact scan:\n" + plan[:1500]
    return joined.groupBy("era").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).cast("double")
        .alias("revenue"),
    )


@q("bucketed_join_colocated", """
SELECT c_mktsegment,
       count(*) AS n_orders,
       sum(o_totalprice::DECIMAL(18,6))::DOUBLE AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""")
def bucketed_join_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located bucketed join (RelDistribution.java:33 / Exchange
    planning): orders and customer are bucketed on the join key at write
    time, so the join itself runs WITHOUT shuffling either side — verified
    by an in-query plan assertion (no Exchange hashpartitioning feeding
    the join). At 100 TB this converts the per-query fact-table shuffle
    into a one-time write cost; the oracle proves the result is identical
    to the plain join."""
    from drill_calcite_spark.sources.bucketed import (
        assert_no_shuffle_join,
        create_bucketed_table,
    )

    tag = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    to, tc = f"bkt_orders_{tag}", f"bkt_customer_{tag}"
    create_bucketed_table(
        t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice"),
        to, "o_custkey", 8,
    )
    create_bucketed_table(
        t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment"),
        tc, "c_custkey", 8,
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        lt, rt = spark.table(to), spark.table(tc)
        joined = lt.join(rt, lt.o_custkey == rt.c_custkey)
        assert_no_shuffle_join(joined)
        out = joined.groupBy("c_mktsegment").agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double").alias("revenue"),
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    return out


@q("source_jdbc_scan", """
SELECT n_nationkey, n_name, n_regionkey FROM nation WHERE n_regionkey < 3
""")
def source_jdbc_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JDBC adapter roundtrip (adapter/jdbc/JdbcSchema.java, JdbcTable.java):
    ``nation`` is written into an embedded-Derby database over JDBC, then
    scanned back PARTITIONED (4 range-bounded remote queries on
    n_nationkey — the parallel-read scale path) with the filter pushed
    into the remote SQL. Equality with the parquet oracle proves the
    write/read/pushdown pipeline is lossless."""
    from drill_calcite_spark.sources.jdbc import derby_url, jdbc_read, jdbc_write

    nation = t(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    # Per-run temp dir for the Derby database: a FIXED path left a stale
    # db.lck whenever a prior session was killed mid-boot, and embedded
    # Derby then refuses to boot (XJ040/XSDB6) for every later session —
    # which under `pytest -x` killed the whole suite before the oracle
    # lanes ran. The table is rewritten from parquet on every invocation
    # anyway, so nothing is lost by not reusing the database directory.
    # derby.log is pointed at the temp dir too (it otherwise lands in the
    # process cwd, i.e. the repo root); the property is read at engine
    # boot, so set it before the first JDBC touch.
    jvm_sys = spark._jvm.System
    if not jvm_sys.getProperty("derby.stream.error.file"):
        jvm_sys.setProperty(
            "derby.stream.error.file",
            os.path.join(tempfile.gettempdir(), "spark_graft_derby.log"))
    db = os.path.join(
        tempfile.mkdtemp(prefix="spark_graft_derby_"), "jdbc_derby_db")
    jdbc_write(
        nation, derby_url(db, create=True), "nation_jdbc",
        column_types="n_name VARCHAR(64)",
    )
    back = jdbc_read(
        spark, derby_url(db), "nation_jdbc",
        partition_on="n_nationkey", lower=0, upper=25, num_partitions=4,
    )
    return back.filter(F.col("n_regionkey") < 3).select(
        F.col("n_nationkey").cast("int").alias("n_nationkey"),
        "n_name",
        F.col("n_regionkey").cast("int").alias("n_regionkey"),
    )


@q("source_csv_scan", "SELECT * FROM nation")
def source_csv_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source with schema inference, conformed to the catalog row type
    (CsvScannableTable + DynamicRecordType semantics): a full roundtrip of
    ``nation`` through CSV must equal the parquet scan."""
    nation = t(spark, sf_dir, "nation")
    path = os.path.join(_fixture_dir(sf_dir), "nation_csv")
    ensure_csv_copy(spark, nation, path)
    return conform_to(read_csv_inferred(spark, path), nation.schema)


@q("source_html_table", "SELECT * FROM nation")
def source_html_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML <table> file source — the reference's file adapter relation
    format (file/.../FileReader.java jsoup <tr>/<td> parse;
    FileRowConverter.java typed field mapping). The writer emits one
    <tr> per LINE so the file stays a SPLITTABLE text source: Spark's
    line scan parallelizes it, cell extraction is one JVM-side
    non-greedy regexp per row (map-only), entities round-trip through
    &-escaping, and the string cells are conformed to the catalog row
    type exactly like CSV schema-on-read. The oracle reads the original
    parquet — the hash proves the full HTML round trip."""
    nation = t(spark, sf_dir, "nation")
    path = os.path.join(_fixture_dir(sf_dir), "nation_html")
    ensure_html_copy(spark, nation, path)
    return conform_to(
        read_html_table(spark, path, list(nation.columns)), nation.schema)


@q("source_json_scan", """
SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate, o_orderpriority
FROM orders
""")
def source_json_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source with sampled schema inference
    (JsonScannableTable): doubles round-trip exactly (written with full
    precision), timestamps come back as strings and are conformed."""
    orders = t(spark, sf_dir, "orders")
    keep = orders.select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate",
        "o_orderpriority",
    )
    path = os.path.join(_fixture_dir(sf_dir), "orders_json")
    ensure_json_copy(spark, keep, path)
    return conform_to(read_json_inferred(spark, path), keep.schema)


@q("modify_insert_delete", """
WITH base AS (
  SELECT r_regionkey, r_name FROM region
  UNION ALL SELECT 100, 'ATLANTIS'
  UNION ALL SELECT 101, 'LEMURIA'
)
SELECT r_regionkey, r_name FROM base WHERE r_name <> 'ATLANTIS'
""")
def modify_insert_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TableModify INSERT + DELETE on a copy-on-write versioned table:
    insert two rows, delete one back, read the final version."""
    region = t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    path = os.path.join(_fixture_dir(sf_dir), "region_cow")
    create_table(spark, path, region)
    newrows = spark.createDataFrame(
        [(100, "ATLANTIS"), (101, "LEMURIA")], "r_regionkey int, r_name string"
    )
    insert_into(spark, path, newrows)
    delete_where(spark, path, F.col("r_name") == "ATLANTIS")
    return read_versioned(spark, path)


@q("modify_update_where", """
SELECT r_regionkey,
       CASE WHEN r_regionkey < 2 THEN upper(r_name) ELSE r_name END AS r_name
FROM region
""")
def modify_update_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TableModify UPDATE ... SET r_name = upper(r_name) WHERE key < 2."""
    region = t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    path = os.path.join(_fixture_dir(sf_dir), "region_upd")
    create_table(spark, path, region)
    update_where(
        spark, path, F.col("r_regionkey") < 2,
        {"r_name": F.upper(F.col("r_name"))},
    )
    return read_versioned(spark, path)


@q("modify_merge_orders", """
WITH cnt AS (
  SELECT o_custkey AS c_custkey, count(*) AS n_orders FROM orders GROUP BY 1
),
merged AS (
  SELECT c.c_custkey, c.c_nationkey,
         c.c_acctbal + coalesce(cnt.n_orders, 0) AS bal
  FROM customer c LEFT JOIN cnt USING (c_custkey)
)
SELECT c_nationkey, count(*) AS n_customers,
       sum(bal::DECIMAL(18,6))::DOUBLE AS total_bal
FROM merged GROUP BY c_nationkey
""")
def modify_merge_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TableModify MERGE: target=customer copy, source=per-customer order
    counts, WHEN MATCHED THEN UPDATE acctbal += n_orders. The post-merge
    per-nation totals must equal the oracle's LEFT-JOIN formulation."""
    customer = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    path = os.path.join(_fixture_dir(sf_dir), "customer_merge")
    create_table(spark, path, customer)
    src = orders.groupBy(F.col("o_custkey").alias("c_custkey")).agg(
        F.count("*").alias("n_orders")
    )
    merge_into(
        spark, path, src, on=["c_custkey"],
        when_matched_update={
            "c_acctbal": F.col("__tgt.c_acctbal") + F.col("__src.n_orders")
        },
    )
    out = read_versioned(spark, path)
    return out.groupBy("c_nationkey").agg(
        F.count("*").alias("n_customers"),
        F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double")
        .alias("total_bal"),
    )


@q("modify_snapshot_versions", """
SELECT count(*)::BIGINT                              AS rows_before,
       count(*) FILTER (r_regionkey <> 0)::BIGINT    AS rows_after
FROM region
""")
def modify_snapshot_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Version-axis Snapshot (rel/core/Snapshot.java:47): after a DELETE,
    version N-1 still serves the pre-delete rows. The table is recreated
    from ``region`` each run, so both versions' counts are deterministic
    and the oracle states them from the base table."""
    region = t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    path = os.path.join(_fixture_dir(sf_dir), "region_snap")
    create_table(spark, path, region)
    delete_where(spark, path, F.col("r_regionkey") == 0)
    cur = read_versioned(spark, path).count()
    prev = read_versioned(spark, path, version=0).count()
    return spark.createDataFrame(
        [(int(prev), int(cur))], "rows_before bigint, rows_after bigint"
    )


_KAFKA_CONVERT_SQL = """
SELECT (user_id % 8)::INT            AS MSG_PARTITION,
       count(*)                      AS n_msgs,
       max(event_id)                 AS max_offset,
       count(DISTINCT event_type)    AS n_types,
       sum(value::DECIMAL(18,6))::DOUBLE AS total_value,
       min(epoch_us(ts) // 1000)     AS min_ts_ms,
       max(epoch_us(ts) // 1000)     AS max_ts_ms
FROM events WHERE event_id < 20000
GROUP BY 1
"""


@q("source_kafka_convert", _KAFKA_CONVERT_SQL)
def source_kafka_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Kafka adapter's row-converter surface (KafkaStreamTable +
    KafkaRowConverter, kafka/.../KafkaRowConverterImpl.java:37-67) driven
    end-to-end without a broker: events rows are ENCODED into the exact
    consumer-record schema spark's kafka source yields (key/value UTF-8
    bytes + topic/partition/offset/timestamp — the test-harness producer),
    then DECODED back through json_value_converter (from_json over value
    bytes — JVM Jackson, the pluggable half of KafkaRowConverter), and
    aggregated per MSG_PARTITION. The oracle recomputes from the raw
    events table, so the hash-match proves the encode→bytes→decode round
    trip is lossless — including double-valued JSON payloads and epoch-ms
    consumer timestamps. Map-only conversion + one partial-aggregated
    shuffle; the live readStream variant of the same plumbing is
    exercised in tests/test_streaming.py."""
    from drill_calcite_spark.sources.kafka import (
        json_value_converter,
        kafka_shaped_records,
    )

    ev = t(spark, sf_dir, "events").filter(F.col("event_id") < 20000)
    records = kafka_shaped_records(
        ev,
        topic="events",
        key=F.col("user_id").cast("string"),
        value=F.to_json(F.struct(
            F.col("event_id"), F.col("event_type"), F.col("value"))),
        partition=F.pmod(F.col("user_id"), F.lit(8)),
        offset=F.col("event_id"),
        timestamp=F.col("ts"),
    )
    typed = json_value_converter(
        "event_id bigint, event_type string, value double")(records)
    return typed.groupBy("MSG_PARTITION").agg(
        F.count("*").alias("n_msgs"),
        F.max("MSG_OFFSET").alias("max_offset"),
        F.countDistinct("event_type").alias("n_types"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
        .alias("total_value"),
        F.min("MSG_TIMESTAMP").alias("min_ts_ms"),
        F.max("MSG_TIMESTAMP").alias("max_ts_ms"),
    )


_DYN_STAR_SQL = """
SELECT coalesce(CASE WHEN event_id < 5000 THEN event_type END,
                '<absent>')                                   AS etype,
       count(*)                                               AS n,
       sum(CASE WHEN event_id >= 5000
                THEN value::DECIMAL(18,6) END)::DOUBLE        AS total_value,
       count(CASE WHEN event_id < 5000 THEN 1 END)            AS n_typed
FROM events WHERE event_id < 10000
GROUP BY 1
"""


@q("source_dynamic_star", _DYN_STAR_SQL)
def source_dynamic_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC_STAR schema-on-read over HETEROGENEOUS batches — the
    Drill-fork hallmark (rel/type/DynamicRecordType.java:24-37 '**'
    columns; sql/type/SqlTypeName.java:121): two JSON batches carry
    DIFFERENT field sets (batch A: event_id/user_id/event_type; batch B:
    event_id/user_id/value), one scan discovers the UNION row type
    (fields "added on reference" — Spark's JSON schema union is the
    validate-time analogue, SURVEY §1.3), and conform_to coerces the
    discovered frame to the catalog row type with typed NULLs where a
    batch lacks a field. The aggregate proves per-batch field absence
    surfaces as NULL, not as error or dropped rows. Scale: inference
    samples; at 100 TB pass the explicit schema (files.py module note) —
    the discovery path here is the schema-on-query surface itself."""
    import os as _os

    from pyspark.sql.types import StructType

    from drill_calcite_spark.sources.files import conform_to

    ev = t(spark, sf_dir, "events").filter(F.col("event_id") < 10000)
    base = _os.path.join(_fixture_dir(sf_dir), "dyn_star")
    if not _os.path.exists(base):
        ev.filter(F.col("event_id") < 5000) \
            .select("event_id", "user_id", "event_type") \
            .coalesce(1).write.mode("overwrite").json(base + "/a")
        ev.filter(F.col("event_id") >= 5000) \
            .select("event_id", "user_id", "value") \
            .coalesce(1).write.mode("overwrite").json(base + "/b")
    discovered = (
        spark.read.option("recursiveFileLookup", "true").json(base)
    )
    target = StructType.fromDDL(
        "event_id bigint, user_id bigint, event_type string, value double")
    df = conform_to(discovered, target)
    return df.groupBy(
        F.coalesce(F.col("event_type"), F.lit("<absent>")).alias("etype")
    ).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
        .alias("total_value"),
        F.count(F.col("event_type")).alias("n_typed"),
    )


@q("modify_version_diff", """
WITH v0 AS (
  SELECT o_orderkey, o_orderstatus,
         (o_totalprice::DECIMAL(18,2) * 100)::BIGINT AS cents
  FROM orders
), v1 AS (
  SELECT o_orderkey, o_orderstatus,
         CASE WHEN o_orderkey % 10 = 3 THEN cents + 500 ELSE cents END
           AS cents
  FROM v0
  UNION ALL
  SELECT 900000001, 'O', 100 UNION ALL
  SELECT 900000002, 'F', 200 UNION ALL
  SELECT 900000003, 'P', 300
), ins AS (
  SELECT *, 'insert' AS _change FROM (
    SELECT * FROM v1 EXCEPT ALL SELECT * FROM v0)
), dels AS (
  SELECT *, 'delete' AS _change FROM (
    SELECT * FROM v0 EXCEPT ALL SELECT * FROM v1)
)
SELECT * FROM ins UNION ALL SELECT * FROM dels
""")
def modify_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHANGE-DATA READ between table versions (sources/modify.py
    version_diff): v0 = an orders projection; ONE MERGE produces v1
    (matched keys get +500 cents, three brand-new keys insert); the
    version diff must surface every insert once and every update as a
    delete+insert PAIR — multiset-exact (exceptAll), fully distributed,
    never a driver-side diff. The oracle spells the two EXCEPT ALLs
    literally over the same deterministic version derivation."""
    import uuid as _uuid

    from drill_calcite_spark.sources.modify import merge_into, version_diff

    orders = t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus",
        (F.col("o_totalprice").cast("decimal(18,2)") * 100)
        .cast("bigint").alias("cents"))
    path = os.path.join(_fixture_dir(sf_dir),
                        f"orders_cdc_{_uuid.uuid4().hex[:12]}")
    try:
        create_table(spark, path, orders)
        upd = orders.filter(F.col("o_orderkey") % 10 == 3)
        new = spark.createDataFrame(
            [(900000001, "O", 100), (900000002, "F", 200),
             (900000003, "P", 300)],
            "o_orderkey long, o_orderstatus string, cents long")
        merge_into(
            spark, path, upd.unionByName(new), on=["o_orderkey"],
            when_matched_update={
                "cents": F.col("__tgt.cents") + F.lit(500)},
            when_not_matched_insert=True)
        diff = version_diff(spark, path, 0, 1)
        rows = diff.collect()
        return spark.createDataFrame(rows, diff.schema)
    finally:
        import shutil as _shutil
        _shutil.rmtree(path, ignore_errors=True)


@q("source_schema_merge", """
WITH a AS (
  SELECT o_orderkey, (o_totalprice::DECIMAL(18,2) * 100)::BIGINT AS cents,
         NULL::VARCHAR AS o_orderpriority
  FROM orders WHERE o_orderkey % 2 = 0
), b AS (
  SELECT o_orderkey, NULL::BIGINT AS cents, o_orderpriority
  FROM orders WHERE o_orderkey % 2 = 1
), u AS (SELECT * FROM a UNION ALL SELECT * FROM b)
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(cents) AS BIGINT) AS n_cents,
       CAST(count(o_orderpriority) AS BIGINT) AS n_pri,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM u
""")
def source_schema_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PARQUET SCHEMA EVOLUTION on read (``mergeSchema``): two files in
    one directory carry DIFFERENT column sets (old writer: key+cents;
    new writer: key+priority); the merged scan must expose the union
    row type with NULL for each file's absent columns — the
    schema-on-read half of the DYNAMIC_STAR story
    (`source_dynamic_star`) on the columnar path, where the footer
    schemas are merged at planning time instead of per-record
    discovery. The oracle rebuilds both projections and their
    NULL-padded union; counts per column prove absence surfaced as
    NULL, not dropped rows or errors."""
    import uuid as _uuid

    orders = t(spark, sf_dir, "orders")
    base = os.path.join(_fixture_dir(sf_dir),
                        f"schema_merge_{_uuid.uuid4().hex[:12]}")
    os.makedirs(base)
    try:
        (orders.filter(F.col("o_orderkey") % 2 == 0)
         .select("o_orderkey",
                 (F.col("o_totalprice").cast("decimal(18,2)") * 100)
                 .cast("bigint").alias("cents"))
         .coalesce(1).write.mode("overwrite")
         .parquet(os.path.join(base, "gen=old")))
        (orders.filter(F.col("o_orderkey") % 2 == 1)
         .select("o_orderkey", "o_orderpriority")
         .coalesce(1).write.mode("overwrite")
         .parquet(os.path.join(base, "gen=new")))
        merged = spark.read.option("mergeSchema", "true").parquet(
            os.path.join(base, "gen=old"), os.path.join(base, "gen=new"))
        out = merged.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.count("cents").cast("bigint").alias("n_cents"),
            F.count("o_orderpriority").cast("bigint").alias("n_pri"),
            F.sum("cents").cast("bigint").alias("sum_cents"))
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        import shutil as _shutil
        _shutil.rmtree(base, ignore_errors=True)


@q("modify_compact", """
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS n_keys,
       CAST(sum((o_totalprice::DECIMAL(18,2) * 100)::BIGINT) AS BIGINT)
         AS sum_cents,
       CAST(4 AS BIGINT) AS n_files
FROM orders
""")
def modify_compact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SMALL-FILE COMPACTION (sources/modify.py compact — the OPTIMIZE
    maintenance operation): a table committed as 32 small files is
    rewritten to 4 as a new snapshot version; content must be
    bit-identical (the oracle pins rows/keys/cent totals) and the file
    count must actually drop to the target (pinned via inputFiles). The
    old version stays readable — compaction is just another
    copy-on-write commit."""
    import uuid as _uuid

    from drill_calcite_spark.sources.modify import compact

    orders = t(spark, sf_dir, "orders")
    path = os.path.join(_fixture_dir(sf_dir),
                        f"compact_{_uuid.uuid4().hex[:12]}")
    try:
        create_table(spark, path, orders.repartition(32))
        before = len(read_versioned(spark, path, 0).inputFiles())
        v = compact(spark, path, 4)
        out = read_versioned(spark, path, v)
        n_files = len(out.inputFiles())
        assert before > n_files, "compaction did not reduce file count"
        res = out.agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.count_distinct(F.col("o_orderkey")).cast("bigint")
            .alias("n_keys"),
            F.sum((F.col("o_totalprice").cast("decimal(18,2)") * 100)
                  .cast("bigint")).cast("bigint").alias("sum_cents"),
            F.lit(n_files).cast("bigint").alias("n_files"))
        rows = res.collect()
        return spark.createDataFrame(rows, res.schema)
    finally:
        import shutil as _shutil
        _shutil.rmtree(path, ignore_errors=True)


@q("source_partition_overwrite", """
WITH cur AS (
  SELECT extract(year FROM o_orderdate)::BIGINT AS o_year,
         o_orderkey,
         CASE WHEN extract(year FROM o_orderdate) = 1996
              THEN (o_totalprice::DECIMAL(18,2) * 100)::BIGINT + 1
              ELSE (o_totalprice::DECIMAL(18,2) * 100)::BIGINT
         END AS cents
  FROM orders
)
SELECT o_year, CAST(count(*) AS BIGINT) AS n,
       CAST(sum(cents) AS BIGINT) AS sum_cents
FROM cur GROUP BY 1
""")
def source_partition_overwrite(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """DYNAMIC PARTITION OVERWRITE (partitionOverwriteMode=dynamic):
    a year-partitioned table gets ONE partition's data rewritten
    (the 1996 restatement adds a cent per order); the write must
    replace ONLY the partitions present in the incoming frame and
    leave every other year's files untouched — the INSERT OVERWRITE
    PARTITION contract a backfill relies on (static mode would wipe
    the whole table). The oracle recomputes the post-restatement
    totals; untouched years hash identically, so collateral damage or
    a missed replacement both go red."""
    import uuid as _uuid

    orders = t(spark, sf_dir, "orders")
    base = os.path.join(_fixture_dir(sf_dir),
                        f"part_ovw_{_uuid.uuid4().hex[:12]}")
    cents = (F.col("o_totalprice").cast("decimal(18,2)") * 100) \
        .cast("bigint")
    tbl = orders.select(F.year("o_orderdate").cast("bigint")
                        .alias("o_year"), "o_orderkey",
                        cents.alias("cents"))
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode",
                          "STATIC")
    try:
        tbl.write.partitionBy("o_year").mode("overwrite").parquet(base)
        spark.conf.set("spark.sql.sources.partitionOverwriteMode",
                       "dynamic")
        restated = (spark.read.parquet(base)
                    .filter(F.col("o_year") == 1996)
                    .withColumn("cents", F.col("cents") + 1))
        (restated.select("o_orderkey", "cents", "o_year")
         .write.partitionBy("o_year").mode("overwrite").parquet(base))
        out = (spark.read.parquet(base)
               .groupBy("o_year")
               .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                    F.sum("cents").cast("bigint").alias("sum_cents")))
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
        import shutil as _shutil
        _shutil.rmtree(base, ignore_errors=True)
