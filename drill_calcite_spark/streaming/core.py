"""Streaming surface: SELECT STREAM semantics on Structured Streaming.

Reference model (SURVEY.md §2.5): ``SELECT STREAM`` wraps a scan in a
``Delta`` node (rel/stream/Delta.java:38) and StreamRules push it through
the plan; grouped-window functions TUMBLE/HOP/SESSION
(SqlStdOperatorTable.java:2268-2330) bucket event time, and
DeltaAggregateTransposeRule (rel/stream/StreamRules.java:123) requires a
monotonic (event-time) expression in every streaming GROUP BY. The
reference *plans* streams but has no watermark/state runtime — Spark
Structured Streaming supplies strictly more: watermarks, late-data
handling, state store, exactly-once sinks.

Mapping implemented here:
- stream()                → ``readStream`` over the same parquet tables
- TUMBLE/HOP/SESSION      → ``F.window`` / ``F.session_window`` (both work
                            identically on batch DataFrames, which is how
                            the DuckDB oracles check them)
- monotonic-group rule    → require_monotonic_groups() raises the same
                            friendly error Calcite's rule implies
- stream→table (Chi)      → run_available_now(): drain everything
                            currently in the source into a batch result

Scale notes: file-source streaming shards by file; at 100 TB the same code
points at a Kafka source + checkpointed sink and nothing else changes.
Watermark bounds state; complete-mode is used only for bounded drains.
"""

from __future__ import annotations

import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from drill_calcite_spark.catalog import table_path


class NonMonotonicStreamError(ValueError):
    """Streaming aggregation lacks an event-time (monotonic) group key —
    the condition DeltaAggregateTransposeRule enforces
    (rel/stream/StreamRules.java:123)."""


def require_monotonic_groups(group_cols: list[Column | str]) -> None:
    """Validate that a streaming GROUP BY contains an event-time window.

    Spark would raise its own late error at query start; we fail fast with
    the Calcite-style message so the API matches the reference's planning
    behavior ("Streaming aggregation requires at least one monotonic
    expression in GROUP BY clause").
    """
    for c in group_cols:
        # NB: Column.__getattr__ turns unknown attributes into field-access
        # Columns, so probe __dict__ instead of getattr
        if isinstance(c, str):
            if "window" in c:
                return
        elif c.__dict__.get("_is_event_time_window"):
            return
    raise NonMonotonicStreamError(
        "Streaming aggregation requires at least one monotonic expression "
        "(an event-time window) in the GROUP BY clause; wrap the event-time "
        "column in tumble()/hop()/session()."
    )


def stream_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """``SELECT STREAM * FROM name`` — a streaming DataFrame over the same
    parquet data the batch scan reads (StreamableTable.stream(),
    core/.../schema/StreamableTable.java:26). The file source re-lists the
    path, so files landing later are picked up — the schema-on-read stream
    table pattern."""
    path = table_path(sf_dir, name)
    # The file source requires a DIRECTORY; each table is one parquet file
    # inside sf_dir, so stream the dir with a glob filter on the table file.
    if name == "events":
        if spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") != "true":
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        static = spark.read.parquet(path)
        sdf = (
            spark.readStream.schema(static.schema)
            .option("pathGlobFilter", f"{name}.parquet")
            .parquet(sf_dir)
        )
        ts_dtype = dict(static.dtypes).get("ts")
        if ts_dtype == "bigint":
            # DIV: integer nanos→micros; float division loses ~128ns at 1.7e18
            sdf = sdf.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif ts_dtype == "timestamp_ntz":
            # TIMESTAMP_NTZ is not a valid withWatermark event-time type;
            # session TZ pinned UTC makes this cast value-preserving.
            sdf = sdf.withColumn("ts", F.col("ts").cast("timestamp"))
        return sdf
    static = spark.read.parquet(path)
    return (
        spark.readStream.schema(static.schema)
        .option("pathGlobFilter", f"{name}.parquet")
        .parquet(sf_dir)
    )


def _tag(c: Column) -> Column:
    # mark as an event-time window so require_monotonic_groups can verify
    # streaming GROUP BYs without touching the JVM
    c._is_event_time_window = True
    return c


def tumble(ts: Column | str, size: str) -> Column:
    """TUMBLE($ts, size) → non-overlapping windows (window.start/end map to
    TUMBLE_START/TUMBLE_END)."""
    return _tag(F.window(ts, size))


def hop(ts: Column | str, slide: str, size: str) -> Column:
    """HOP($ts, slide, size) → sliding windows; each event lands in
    size/slide windows. Argument order matches the reference's HOP."""
    return _tag(F.window(ts, size, slide))


def session(ts: Column | str, gap: str) -> Column:
    """SESSION($ts, gap) → gap-separated sessions per group key."""
    return _tag(F.session_window(ts, gap))


def run_available_now(
    sdf_agg: DataFrame, spark: SparkSession, *, output_mode: str = "complete",
    timeout_s: int = 300,
) -> DataFrame:
    """Drain everything currently available in the stream through the query
    and return the final result as a batch DataFrame (the Chi operator:
    stream → relation, rel/stream/Chi.java:32).

    Uses Trigger.AvailableNow + an in-memory sink: processes all existing
    source data in bounded batches, then stops. With ``complete`` output
    the final table equals the batch answer over the same data — which is
    exactly what the DuckDB oracle checks.
    """
    name = f"drain_{uuid.uuid4().hex[:12]}"
    q = (
        sdf_agg.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(timeout_s):
            raise TimeoutError(f"stream drain exceeded {timeout_s}s")
    finally:
        if q.isActive:
            q.stop()
    return spark.table(name)
