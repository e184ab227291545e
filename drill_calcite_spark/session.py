"""SparkSession factory tuned for the engine.

Reference parity: Calcite's prepare pipeline (CalcitePrepareImpl.java:467)
configures lexing/conformance per connection; our analogue is a SparkSession
with a fixed, scale-aware configuration. Cost-based optimization (Calcite's
VolcanoPlanner, plan/volcano/VolcanoPlanner.java:573) maps to Catalyst CBO +
AQE, which we enable here (SURVEY.md §4.2).

Scale notes (100 TB design): every knob below is chosen so the same code runs
on a real cluster by *only* changing master/memory: AQE handles runtime
coalescing + skew joins, shuffle partitions are a starting hint that AQE
re-plans, Arrow is on for the few pandas-UDF operators, and session TZ is
pinned UTC so timestamp semantics don't depend on cluster locale.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def get_spark(
    app_name: str = "drill_calcite_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or get) the engine's SparkSession.

    On a real cluster, pass ``master=None`` and let spark-submit decide; in
    local mode we default to ``local[$SPARK_GRAFT_CPUS]``.
    """
    master = master or f"local[{DEFAULT_CPUS}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # --- optimizer: let Catalyst + AQE do Calcite's §4 job ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # CBO is off: we never ANALYZE the driver tables, so static CBO has no
        # stats to use and only adds planning cost; AQE re-plans from *runtime*
        # stats, which is Calcite's VolcanoPlanner role here (SURVEY.md §4.2).
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or DEFAULT_CPUS))
        # --- semantics ---
        .config("spark.sql.session.timeZone", "UTC")
        # Calcite does not silently lose DECIMAL precision (RelDataTypeSystem);
        # match that (SURVEY.md §7 phase 4.5).
        .config("spark.sql.decimalOperations.allowPrecisionLoss", "false")
        # Engine queries use non-ANSI permissive evaluation: the driver oracle
        # (DuckDB) and Calcite both return NULL rather than erroring for e.g.
        # bad casts in filters that get speculatively evaluated.
        .config("spark.sql.ansi.enabled", "false")
        # events.ts is parquet INT64 TIMESTAMP(NANOS); read it as long and
        # convert in catalog.read_table (which re-asserts this conf for
        # externally-created sessions, e.g. the driver's).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # --- python boundary: Arrow batches for the pandas-UDF operators ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- DDL surface: managed CREATE TABLE targets land in a
        # per-process scratch warehouse, never the repo cwd (the quidem
        # blank-schema cases create real tables) ---
        .config("spark.sql.warehouse.dir",
                os.environ.get("SPARK_GRAFT_WAREHOUSE",
                               f"/tmp/spark_graft_warehouse_{os.getpid()}"))
        # --- local-mode niceties (no-ops on a cluster manager) ---
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
