"""Streaming queries (SURVEY.md §2.5): grouped-window functions
TUMBLE/HOP/SESSION (SqlStdOperatorTable.java:2268-2330) plus live
Structured-Streaming drains of the same pipelines.

Oracle strategy: the window functions are checked in BATCH mode (identical
semantics, same code path as ``F.window``/``F.session_window`` on a
stream); the ``_live`` variants run the real readStream → watermark →
window-agg → sink pipeline with Trigger.AvailableNow, whose complete-mode
result equals the batch answer — so even live streaming is oracle-checked.
All window boundaries are emitted as epoch-seconds BIGINT so both engines
hash identical integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from drill_calcite_spark.queries.common import t
from drill_calcite_spark.streaming import (
    hop,
    run_available_now,
    session,
    stream_table,
    tumble,
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


# Window starts are computed with integer µs division (epoch_us //) — NOT
# epoch(ts)::BIGINT, whose double→int cast ROUNDS half-even in DuckDB and
# flips events near second boundaries. Value sums go through DECIMAL(18,6)
# so they are exact and summation-order-independent in both engines; the
# final decimal→double conversion is correctly rounded on both, so no
# in-query round() (whose half-way behavior differs between engines) is
# needed or wanted.
_TUMBLE_SQL = """
SELECT (epoch_us(ts) // 3600000000) * 3600 AS win_start,
       event_type, count(*) AS n,
       sum(value::DECIMAL(18,6))::DOUBLE AS total_value
FROM events GROUP BY 1, 2
"""


@q("stream_tumble_hourly", _TUMBLE_SQL)
def stream_tumble_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TUMBLE($ts, 1h) aggregation — batch-mode check of the streaming
    window operator (F.window ≡ $TUMBLE, window.start ≡ TUMBLE_START)."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(tumble("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").cast("long").alias("win_start"),
            "event_type", "n", "total_value",
        )
    )


@q("stream_hop_30m", """
WITH b AS (
  SELECT (epoch_us(ts) // 1800000000) * 1800 AS bucket, value FROM events
),
w AS (
  SELECT unnest([bucket - 1800, bucket]) AS win_start, value FROM b
)
SELECT win_start, count(*) AS n,
       sum(value::DECIMAL(18,6))::DOUBLE / count(*) AS avg_value
FROM w GROUP BY 1
""")
def stream_hop_30m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOP($ts, slide 30m, size 1h): every event lands in exactly
    size/slide = 2 windows; the oracle enumerates the same two starts."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy(hop("ts", "30 minutes", "1 hour").alias("w"))
        .agg(
            F.count("*").alias("n"),
            (F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
             / F.count("*")).alias("avg_value"),
        )
        .select(F.col("w.start").cast("long").alias("win_start"), "n", "avg_value")
    )


@q("stream_session_6h", """
WITH d AS (
  SELECT user_id, ts,
    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
              > INTERVAL 6 HOUR
         THEN 1 ELSE 0 END AS brk
  FROM events
),
s AS (
  SELECT user_id, ts,
    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS sess
  FROM d
)
SELECT user_id, epoch_us(min(ts)) // 1000000 AS session_start,
       count(*) AS n_events
FROM s GROUP BY user_id, sess
""")
def stream_session_6h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SESSION($ts, 6h) per user. Spark merges an event into the previous
    session when gap ≤ 6h INCLUSIVE (verified empirically: two events
    exactly 6h apart share a session), so the oracle breaks on gap > 6h."""
    ev = t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", session("ts", "6 hours").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").cast("long").alias("session_start"),
            "n_events",
        )
    )


@q("stream_session_live", """
WITH d AS (
  SELECT user_id, ts,
    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
              > INTERVAL 6 HOUR
         THEN 1 ELSE 0 END AS brk
  FROM events
),
s AS (
  SELECT user_id, ts,
    sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                   ROWS UNBOUNDED PRECEDING) AS sess
  FROM d
)
SELECT user_id, epoch_us(min(ts)) // 1000000 AS session_start,
       count(*) AS n_events
FROM s GROUP BY user_id, sess
""")
def stream_session_live(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming SESSION windows: readStream(events) →
    1-day watermark → per-user ``session_window`` merge → AvailableNow
    drain in complete mode. Session state is genuinely different
    machinery from the tumble batteries — the store holds OPEN session
    intervals per key and MERGES them as events extend the window
    (MergingSessionsExec / the session-window state format), not
    fixed buckets — and the complete-mode drain equals the batch
    answer, so the same sessionization replay oracle verifies the
    live stateful merge end-to-end (the reference plans SESSION via
    the same Delta machinery as TUMBLE, StreamRules.java:70-292).

    Scale shape: one stateful exchange keyed on user_id; session state
    is bounded per key by the watermark in append-mode production use
    (complete mode here is the oracle-equality device, as in
    stream_live_tumble)."""
    sdf = stream_table(spark, sf_dir, "events").withWatermark("ts", "1 day")
    agg = (
        sdf.groupBy("user_id", session("ts", "6 hours").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").cast("long").alias("session_start"),
            "n_events",
        )
    )
    return run_available_now(agg, spark, output_mode="complete")


@q("stream_session_dynamic_gap", """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us,
         CASE event_type WHEN 'view' THEN 7200000000
                         WHEN 'click' THEN 21600000000
                         ELSE 3600000000 END AS gap
  FROM events
), d AS (
  SELECT user_id, us, us + gap AS en,
         max(us + gap) OVER (PARTITION BY user_id ORDER BY us
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING) AS prev_end
  FROM e
), s AS (
  SELECT user_id, us,
         sum(CASE WHEN prev_end IS NULL OR us > prev_end
                  THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY us
                 ROWS UNBOUNDED PRECEDING) AS sess
  FROM d
)
SELECT user_id, min(us) // 1000000 AS session_start,
       count(*) AS n_events
FROM s GROUP BY user_id, sess
""")
def stream_session_dynamic_gap(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """SESSION window with a DYNAMIC per-event gap — Spark's
    expression-valued ``session_window(ts, gapExpr)`` (SPARK-36465),
    the shape the reference's SESSION(...) grouped-window function
    generalizes to when the gap is data-dependent (a 'view' keeps the
    session warm for 2 h, a 'click' for 6 h, everything else 1 h):
    each event extends its session to ts + gap(event), and sessions
    merge while an event lands at or before the running maximum of
    previous extensions (the same INCLUSIVE boundary the fixed-gap
    battery pinned empirically: an event exactly at the current end
    still merges).

    The oracle replays that definition directly in integer
    microseconds: a running max of (ts + gap) over each user's history
    (tie-ordered events can never break against each other — their
    shared timestamp is ≤ any neighbor's end — so the window order
    among ties cannot change the result), a break wherever an event
    opens strictly past it, and a cumulative break-sum as the session
    id. Non-vacuosity is pinned in tests/test_streaming.py: the
    dynamic sessionization differs from EVERY fixed-gap run at the
    three gap values, so the gap expression provably varies per event.

    Scale shape: one shuffle on user_id into Spark's native
    session-window merge (state bounded per key in streaming use);
    the oracle's window-function replay is the SQL-expressible
    equivalent, quadratic nowhere."""
    ev = t(spark, sf_dir, "events")
    gap = (F.when(F.col("event_type") == "view", F.lit("2 hours"))
           .when(F.col("event_type") == "click", F.lit("6 hours"))
           .otherwise(F.lit("1 hour")))
    return (
        ev.groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").cast("long").alias("session_start"),
            "n_events",
        )
    )


@q("stream_live_tumble", _TUMBLE_SQL)
def stream_live_tumble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL Structured Streaming: readStream(events) → 1-day watermark →
    TUMBLE(1h) agg → AvailableNow drain to a memory sink. The drained
    complete-mode table equals the batch answer, so the same oracle
    verifies the live pipeline end-to-end."""
    sdf = stream_table(spark, sf_dir, "events").withWatermark("ts", "1 day")
    agg = (
        sdf.groupBy(tumble("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            .alias("total_value"),
        )
        .select(
            F.col("w.start").cast("long").alias("win_start"),
            "event_type", "n", "total_value",
        )
    )
    return run_available_now(agg, spark, output_mode="complete")


@q("stream_live_dedup", """
SELECT event_type, count(DISTINCT event_id) AS n_unique
FROM events GROUP BY event_type
""")
def stream_live_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exactly-once dedup: readStream → watermark →
    dropDuplicatesWithinWatermark(event_id) → count by type, drained
    via AvailableNow. WithinWatermark matters at scale: plain
    ``dropDuplicates(["event_id"])`` keeps every key's state FOREVER
    when the event-time column is not part of the dedup key — the
    watermark never expires it and a 100 TB stream OOMs the state
    store. The WithinWatermark variant evicts each key once it falls
    behind the watermark, bounding state to the 1-day window while
    keeping exactly-once semantics for duplicates arriving inside it
    (duplicates separated by more than the watermark delay are beyond
    any bounded-state contract)."""
    sdf = stream_table(spark, sf_dir, "events").withWatermark("ts", "1 day")
    deduped = sdf.dropDuplicatesWithinWatermark(["event_id"])
    agg = deduped.groupBy("event_type").agg(F.count("*").alias("n_unique"))
    return run_available_now(agg, spark, output_mode="complete")


@q("stream_stream_join", """
SELECT c.event_id AS click_id, p.event_id AS purchase_id, c.user_id
FROM events c JOIN events p
  ON c.user_id = p.user_id
 AND c.event_type = 'click' AND p.event_type = 'purchase'
 AND p.ts >= c.ts AND p.ts < c.ts + INTERVAL 1 HOUR
""")
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM inner join (rel/stream/Delta.java through a binary
    join — the streaming case the reference only plans): clicks joined to
    the purchases that follow within 1 hour, per user. Both sides carry
    watermarks and the join condition is time-bounded, so Spark can expire
    state — the two requirements for unbounded-stream joins at scale.
    AvailableNow drain in append mode equals the batch join, which is what
    the oracle runs."""
    clicks = (
        stream_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"), "user_id",
                F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        stream_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("purchase_id"),
                F.col("user_id").alias("p_user"),
                F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        F.expr("user_id = p_user AND p_ts >= c_ts "
               "AND p_ts < c_ts + INTERVAL 1 HOUR"),
    ).select("click_id", "purchase_id", "user_id")
    return run_available_now(joined, spark, output_mode="append")


@q("stream_sink_cow", """
SELECT event_id, user_id, event_type FROM events WHERE event_type = 'signup'
""")
def stream_sink_cow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming SINK into a versioned table (the write half of SELECT
    STREAM — Delta through TableModify): readStream → foreachBatch →
    copy-on-write INSERT, drained with AvailableNow. foreachBatch is the
    idempotent-sink contract at scale (batch_id-keyed exactly-once); the
    final table must equal the batch filter, which the oracle checks."""
    import os as _os
    import shutil
    import uuid as _uuid

    from drill_calcite_spark.queries.sources import _fixture_dir
    from drill_calcite_spark.sources.modify import (
        create_table,
        insert_into,
        read_versioned,
    )

    path = _os.path.join(_fixture_dir(sf_dir), "stream_sink_tbl")
    shutil.rmtree(path, ignore_errors=True)
    sdf = (
        stream_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "signup")
        .select("event_id", "user_id", "event_type")
    )
    create_table(spark, path, spark.createDataFrame([], sdf.schema))

    def sink(batch_df, batch_id):
        insert_into(spark, path, batch_df)

    ckpt = f"/tmp/spark_graft_ckpt_{_uuid.uuid4().hex[:12]}"
    q = (
        sdf.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q.awaitTermination(300):
            raise TimeoutError("stream sink drain exceeded 300s")
    finally:
        if q.isActive:
            q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)
    return read_versioned(spark, path)


@q("stream_stateful_counter", """
SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id
""")
def stream_stateful_counter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSTOM STATEFUL operator (streaming/stateful.py): per-user running
    counter via applyInPandasWithState, drained with AvailableNow. The
    single-file source yields one trigger, so the emitted updates equal the
    batch GROUP BY — oracle-checked. (A plain streaming agg could express
    this; the operator's point is state a relational agg cannot carry.)"""
    from drill_calcite_spark.streaming.stateful import stateful_event_counter

    sdf = stream_table(spark, sf_dir, "events")
    counted = stateful_event_counter(sdf, "user_id")
    return run_available_now(counted, spark, output_mode="update")


@q("stream_sink_upsert", """
SELECT user_id, event_id AS last_event, event_type AS last_type
FROM (SELECT user_id, event_id, event_type,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY event_id DESC) AS rn
      FROM events) t
WHERE rn = 1
""")
def stream_sink_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC-style UPSERT sink: readStream → foreachBatch →
    MERGE INTO a versioned table keyed on user_id ("latest event wins").
    The target is pre-seeded with the FIRST event of half the users, so
    the drain exercises BOTH merge branches: WHEN MATCHED UPDATE
    overwrites the seeded rows, WHEN NOT MATCHED INSERT lands the rest.
    Each batch first collapses to one row per key (window max by
    event_id) — MERGE's unique-source-key contract, and the reason
    upserts stay idempotent under batch replay (foreachBatch's
    exactly-once story). The final table must equal the batch
    latest-per-user, which the oracle states directly."""
    import os as _os
    import shutil
    import uuid as _uuid

    from drill_calcite_spark.queries.sources import _fixture_dir
    from drill_calcite_spark.sources.modify import (
        create_table,
        merge_into,
        read_versioned,
    )

    ev = t(spark, sf_dir, "events")
    w_first = W.partitionBy("user_id").orderBy(F.col("event_id").asc())
    seed = (
        ev.withColumn("__rn", F.row_number().over(w_first))
        .filter((F.col("__rn") == 1) & (F.col("user_id") % 2 == 0))
        .select("user_id", F.col("event_id").alias("last_event"),
                F.col("event_type").alias("last_type"))
    )
    path = _os.path.join(_fixture_dir(sf_dir), "stream_upsert_tbl")
    shutil.rmtree(path, ignore_errors=True)
    create_table(spark, path, seed)

    sdf = (stream_table(spark, sf_dir, "events")
           .select("user_id", "event_id", "event_type"))

    def sink(batch_df, batch_id):
        w_last = W.partitionBy("user_id").orderBy(F.col("event_id").desc())
        latest = (
            batch_df.withColumn("__rn", F.row_number().over(w_last))
            .filter(F.col("__rn") == 1)
            .select("user_id", F.col("event_id").alias("last_event"),
                    F.col("event_type").alias("last_type"))
        )
        merge_into(
            spark, path, latest, on=["user_id"],
            when_matched_update={
                "last_event": F.col("__src.last_event"),
                "last_type": F.col("__src.last_type"),
            },
            when_not_matched_insert=True,
        )

    ckpt = f"/tmp/spark_graft_ckpt_{_uuid.uuid4().hex[:12]}"
    q_ = (
        sdf.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        if not q_.awaitTermination(300):
            raise TimeoutError("stream upsert drain exceeded 300s")
    finally:
        if q_.isActive:
            q_.stop()
        shutil.rmtree(ckpt, ignore_errors=True)
    return read_versioned(spark, path)


# Batch-file layout for the watermark LATE-DATA battery: four files in
# event-time order (one micro-batch each via maxFilesPerTrigger=1), with
# events in calendar week w shipped in batch w EXCEPT the deterministic
# 1-in-13 stragglers (event_id % 13 = 0), which arrive TWO batches late.
_WM_DELAY_US = 2 * 86_400_000_000  # 2 days
_WM_DAY_US = 86_400_000_000


@q("stream_late_data_drop", f"""
WITH e AS (
  SELECT epoch_us(ts) AS us, value,
         least(CAST(floor(date_diff('day', DATE '2024-01-01', ts) / 7)
                    AS BIGINT), 3) AS wk,
         event_id
  FROM events
), b AS (
  SELECT us, value,
         CASE WHEN event_id % 13 = 0 THEN least(wk + 2, 3) ELSE wk END
           AS batch
  FROM e
), mx AS (
  SELECT batch, max(us) AS mx_us FROM b GROUP BY 1
), wm AS (
  -- Spark keeps TWO watermarks per micro-batch: state EVICTION uses
  -- max event time through batch j-1, but the LATE-INPUT filter uses
  -- the PREVIOUS batch's value (max through batch j-2) so re-executed
  -- batches are deterministic. The filter watermark is what decides
  -- which rows are dropped.
  SELECT b2.batch,
         ((SELECT max(mx_us) FROM mx WHERE mx.batch < b2.batch - 1)
          // 1000 - {_WM_DELAY_US // 1000}) * 1000 AS wm_late
  FROM (SELECT DISTINCT batch FROM b) b2
), survived AS (
  SELECT b.us, b.value
  FROM b JOIN wm ON wm.batch = b.batch
  WHERE wm.wm_late IS NULL
     OR (b.us // {_WM_DAY_US}) * {_WM_DAY_US} + {_WM_DAY_US} > wm.wm_late
), fin AS (SELECT (max(us) // 1000 - {_WM_DELAY_US // 1000}) * 1000
             AS wm_final FROM b)
SELECT CAST((us // {_WM_DAY_US}) * 86400 AS BIGINT) AS win_start,
       CAST(count(*) AS BIGINT) AS n,
       sum(value::DECIMAL(18,6))::DOUBLE AS total_value
FROM survived, fin
WHERE (us // {_WM_DAY_US}) * {_WM_DAY_US} + {_WM_DAY_US} <= fin.wm_final
GROUP BY 1
""")
def stream_late_data_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WATERMARK LATE-DATA SEMANTICS, oracle-backed end to end: a real
    multi-micro-batch readStream (four files, one per trigger via
    maxFilesPerTrigger=1, mtime-ordered) with ``withWatermark('ts', '2
    days')`` over TUMBLE(1 day) counts in APPEND mode — late stragglers
    (1-in-13 rows shipped two batches late) are dropped by the
    watermark, finalized windows are emitted exactly once, and trailing
    windows the final watermark never passes are withheld.

    The DuckDB oracle replays Spark's micro-batch watermark algorithm
    EXACTLY, in integer microseconds: the eviction watermark of batch j
    is max-event-time through batch j-1 minus the delay, while the
    LATE-INPUT filter uses the value one batch older (max through
    j-2) — Spark's WatermarkTracker keeps the filter watermark one
    batch behind eviction so retried batches stay deterministic. A row
    survives iff its window END clears its batch's filter watermark; a
    window is emitted iff its end ≤ the final eviction watermark. Every
    count and decimal-exact sum is hash-pinned, so the driver row
    proves drop, emit, AND withhold behavior — not just that the stream
    ran.

    Scale notes: the fixture build collects events once to lay out
    batch files (test plumbing, not the operator); the streaming query
    itself is the production shape — file source, per-batch watermark
    update, partitioned window aggregation, bounded state (windows ≤
    delay behind the front are evicted every batch)."""
    import os as _os
    import shutil
    import uuid as _uuid

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from drill_calcite_spark.queries.sources import _fixture_dir

    ev = t(spark, sf_dir, "events")
    week = F.least(
        F.floor(F.datediff(F.col("ts"), F.lit("2024-01-01")) / 7),
        F.lit(3))
    batch = (F.when(F.col("event_id") % 13 == 0,
                    F.least(week + 2, F.lit(3)))
             .otherwise(week)).cast("int")
    pdf = (ev.select("event_id", "ts", "user_id", "event_type", "value",
                     batch.alias("batch"))
           .toPandas())

    base = _os.path.join(_fixture_dir(sf_dir),
                         f"wm_batches_{_uuid.uuid4().hex[:12]}")
    _os.makedirs(base)
    try:
        for bno in range(4):
            part = pdf[pdf.batch == bno].drop(columns=["batch"])
            path = f"{base}/batch_{bno:03d}.parquet"
            _pq.write_table(
                _pa.Table.from_pandas(part, preserve_index=False), path,
                coerce_timestamps="us", allow_truncated_timestamps=True)
            _os.utime(path, (1_700_000_000 + bno * 1000,) * 2)

        schema = spark.read.parquet(base).schema
        agg = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(base)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "2 days")
            .groupBy(tumble("ts", "1 day").alias("w"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                 F.sum(F.col("value").cast("decimal(18,6)"))
                 .cast("double").alias("total_value"))
            .select(F.unix_timestamp(F.col("w.start")).cast("bigint")
                    .alias("win_start"), "n", "total_value"))
        out = run_available_now(agg, spark, output_mode="append")
        # materialize before the source dir is removed
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@q("stream_static_enrich_agg", f"""
WITH e AS (
  SELECT epoch_us(ts) AS us, user_id,
         least(CAST(floor(date_diff('day', DATE '2024-01-01', ts) / 7)
                    AS BIGINT), 3) AS wk,
         event_id
  FROM events
), b AS (
  SELECT us, user_id,
         CASE WHEN event_id % 13 = 0 THEN least(wk + 2, 3) ELSE wk END
           AS batch
  FROM e
), mx AS (
  SELECT batch, max(us) AS mx_us FROM b GROUP BY 1
), wm AS (
  SELECT b2.batch,
         ((SELECT max(mx_us) FROM mx WHERE mx.batch < b2.batch - 1)
          // 1000 - {_WM_DELAY_US // 1000}) * 1000 AS wm_late
  FROM (SELECT DISTINCT batch FROM b) b2
), survived AS (
  SELECT b.us, b.user_id
  FROM b JOIN wm ON wm.batch = b.batch
  WHERE wm.wm_late IS NULL
     OR (b.us // {_WM_DAY_US}) * {_WM_DAY_US} + {_WM_DAY_US} > wm.wm_late
), fin AS (SELECT (max(us) // 1000 - {_WM_DELAY_US // 1000}) * 1000
             AS wm_final FROM b)
SELECT CAST((us // {_WM_DAY_US}) * 86400 AS BIGINT) AS win_start,
       c_mktsegment,
       CAST(count(*) AS BIGINT) AS n
FROM survived
JOIN customer ON c_custkey = user_id, fin
WHERE (us // {_WM_DAY_US}) * {_WM_DAY_US} + {_WM_DAY_US} <= fin.wm_final
GROUP BY 1, 2
""")
def stream_static_enrich_agg(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """STREAM-STATIC JOIN enrichment — the most common production
    streaming pattern (a streaming fact broadcast-joined to a static
    dimension BEFORE a watermarked window aggregate), proven with the
    same 4-file drain discipline as the state batteries: the static
    join must be STATELESS (no watermark interaction, no buffer — the
    dim rows are available to every micro-batch) and must preserve the
    event-time column intact, so the downstream TUMBLE(1 day) per
    market segment drops/emits/withholds EXACTLY as the un-enriched
    ``stream_late_data_drop`` battery does. The DuckDB oracle replays
    the one-batch-lagged late filter and final-watermark emission rule
    in integer microseconds, then applies the dim join — a replay that
    (wrongly) watermarked the dim side or re-filtered after the join
    would change segment counts and hash red.

    Scale shape: the dim is a BROADCAST inner join per micro-batch
    (static side re-used, never shuffled); state is the windowed
    aggregate only, bounded by the watermark delay."""
    import os as _os
    import shutil
    import uuid as _uuid

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from drill_calcite_spark.queries.sources import _fixture_dir

    ev = t(spark, sf_dir, "events")
    week = F.least(
        F.floor(F.datediff(F.col("ts"), F.lit("2024-01-01")) / 7),
        F.lit(3))
    batch = (F.when(F.col("event_id") % 13 == 0,
                    F.least(week + 2, F.lit(3)))
             .otherwise(week)).cast("int")
    pdf = (ev.select("event_id", "ts", "user_id",
                     batch.alias("batch")).toPandas())

    base = _os.path.join(_fixture_dir(sf_dir),
                         f"sse_batches_{_uuid.uuid4().hex[:12]}")
    _os.makedirs(base)
    try:
        for bno in range(4):
            part = pdf[pdf.batch == bno].drop(columns=["batch"])
            path = f"{base}/batch_{bno:03d}.parquet"
            _pq.write_table(
                _pa.Table.from_pandas(part, preserve_index=False), path,
                coerce_timestamps="us", allow_truncated_timestamps=True)
            _os.utime(path, (1_700_000_000 + bno * 1000,) * 2)

        schema = spark.read.parquet(base).schema
        dim = F.broadcast(t(spark, sf_dir, "customer")
                          .select("c_custkey", "c_mktsegment"))
        agg = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(base)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "2 days")
            .join(dim, F.col("c_custkey") == F.col("user_id"))
            .groupBy(tumble("ts", "1 day").alias("w"), "c_mktsegment")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
            .select(F.unix_timestamp(F.col("w.start")).cast("bigint")
                    .alias("win_start"), "c_mktsegment", "n"))
        out = run_available_now(agg, spark, output_mode="append")
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@q("stream_chained_window_rollup", f"""
WITH e AS (
  SELECT epoch_us(ts) AS us, value,
         least(CAST(floor(date_diff('day', DATE '2024-01-01', ts) / 7)
                    AS BIGINT), 3) AS wk,
         event_id
  FROM events
), b AS (
  SELECT us, value,
         CASE WHEN event_id % 13 = 0 THEN least(wk + 2, 3) ELSE wk END
           AS batch
  FROM e
), mx AS (
  SELECT batch, max(us) AS mx_us FROM b GROUP BY 1
), wm AS (
  SELECT b2.batch,
         ((SELECT max(mx_us) FROM mx WHERE mx.batch < b2.batch - 1)
          // 1000 - {_WM_DELAY_US // 1000}) * 1000 AS wm_late
  FROM (SELECT DISTINCT batch FROM b) b2
), survived AS (
  SELECT b.us, b.value
  FROM b JOIN wm ON wm.batch = b.batch
  WHERE wm.wm_late IS NULL
     OR (b.us // {_WM_DAY_US}) * {_WM_DAY_US} + {_WM_DAY_US} > wm.wm_late
), fin AS (SELECT (max(us) // 1000 - {_WM_DELAY_US // 1000}) * 1000
             AS wm_final FROM b)
SELECT CAST((us // {7 * _WM_DAY_US}) * 604800 AS BIGINT) AS week_start,
       CAST(count(*) AS BIGINT) AS n,
       sum(value::DECIMAL(18,6))::DOUBLE AS total_value
FROM survived, fin
WHERE (us // {7 * _WM_DAY_US}) * {7 * _WM_DAY_US} + {7 * _WM_DAY_US}
        <= fin.wm_final
GROUP BY 1
""")
def stream_chained_window_rollup(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """CHAINED WINDOWED AGGREGATES — TUMBLE(1 day) rolled up into
    TUMBLE(7 days) in ONE append-mode query via ``window_time()``
    (Spark 4's stacked-stateful support; the multi-grain rollup every
    metrics pipeline runs as two jobs collapses into one). The second
    aggregate consumes the FINALIZED day windows the first emits, so
    correctness hinges on per-operator watermark propagation: a day
    window finalizes with window_time < the global watermark — under
    single-watermark late filtering it would be dropped as late, which
    is exactly what Spark's per-operator input/output watermark
    bookkeeping prevents. The replay that hashes green pins the
    composition end to end: survived rows (the one-batch-lagged late
    filter of the day stage) grouped straight into 7-day buckets, a
    week emitted iff its end clears the final eviction watermark —
    valid because every day window inside a week ends no later than
    the week itself, so by the batch a week finalizes ALL its day
    inputs have arrived and been re-aggregated (counts AND
    decimal-exact value sums are both pinned).

    Scale shape: two watermark-bounded stateful exchanges (day grain,
    then ~1/7th the rows at week grain); no extra scan, no join — the
    rollup input is the first aggregate's in-flight output."""
    import os as _os
    import shutil
    import uuid as _uuid

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from drill_calcite_spark.queries.sources import _fixture_dir

    ev = t(spark, sf_dir, "events")
    week = F.least(
        F.floor(F.datediff(F.col("ts"), F.lit("2024-01-01")) / 7),
        F.lit(3))
    batch = (F.when(F.col("event_id") % 13 == 0,
                    F.least(week + 2, F.lit(3)))
             .otherwise(week)).cast("int")
    pdf = (ev.select("event_id", "ts", "value",
                     batch.alias("batch")).toPandas())

    base = _os.path.join(_fixture_dir(sf_dir),
                         f"cwr_batches_{_uuid.uuid4().hex[:12]}")
    _os.makedirs(base)
    try:
        for bno in range(4):
            part = pdf[pdf.batch == bno].drop(columns=["batch"])
            path = f"{base}/batch_{bno:03d}.parquet"
            _pq.write_table(
                _pa.Table.from_pandas(part, preserve_index=False), path,
                coerce_timestamps="us", allow_truncated_timestamps=True)
            _os.utime(path, (1_700_000_000 + bno * 1000,) * 2)

        schema = spark.read.parquet(base).schema
        daily = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(base)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "2 days")
            .groupBy(tumble("ts", "1 day").alias("w"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_day"),
                 F.sum(F.col("value").cast("decimal(18,6)"))
                 .alias("v_day")))
        weekly = (
            daily
            .groupBy(F.window(F.window_time("w"), "7 days").alias("ww"))
            .agg(F.sum("n_day").cast("bigint").alias("n"),
                 F.sum("v_day").cast("double").alias("total_value"))
            .select(F.unix_timestamp(F.col("ww.start")).cast("bigint")
                    .alias("week_start"), "n", "total_value"))
        out = run_available_now(weekly, spark, output_mode="append")
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@q("stream_static_left_enrich", f"""
WITH e AS (
  SELECT epoch_us(ts) AS us, user_id,
         least(CAST(floor(date_diff('day', DATE '2024-01-01', ts) / 7)
                    AS BIGINT), 3) AS wk,
         event_id
  FROM events
), b AS (
  SELECT us, user_id,
         CASE WHEN event_id % 13 = 0 THEN least(wk + 2, 3) ELSE wk END
           AS batch
  FROM e
), mx AS (
  SELECT batch, max(us) AS mx_us FROM b GROUP BY 1
), wm AS (
  SELECT b2.batch,
         ((SELECT max(mx_us) FROM mx WHERE mx.batch < b2.batch - 1)
          // 1000 - {_WM_DELAY_US // 1000}) * 1000 AS wm_late
  FROM (SELECT DISTINCT batch FROM b) b2
), survived AS (
  SELECT b.us, b.user_id
  FROM b JOIN wm ON wm.batch = b.batch
  WHERE wm.wm_late IS NULL
     OR (b.us // {_WM_DAY_US}) * {_WM_DAY_US} + {_WM_DAY_US} > wm.wm_late
), fin AS (SELECT (max(us) // 1000 - {_WM_DELAY_US // 1000}) * 1000
             AS wm_final FROM b)
SELECT CAST((us // {_WM_DAY_US}) * 86400 AS BIGINT) AS win_start,
       coalesce(c_mktsegment, 'UNMATCHED') AS segment,
       CAST(count(*) AS BIGINT) AS n
FROM survived
LEFT JOIN (SELECT c_custkey, c_mktsegment FROM customer
           WHERE c_custkey % 3 <> 0) dim
       ON dim.c_custkey = user_id, fin
WHERE (us // {_WM_DAY_US}) * {_WM_DAY_US} + {_WM_DAY_US} <= fin.wm_final
GROUP BY 1, 2
""")
def stream_static_left_enrich(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """STREAM-STATIC **LEFT OUTER** enrichment — the other enrich shape
    users reach for daily: stream rows with NO dimension match pad
    NULL and STILL flow into the watermark window aggregate, and the
    join stays STATELESS (outer padding needs no buffering when the
    static side is available in full to every micro-batch — unlike the
    stream-stream outer batteries, no pad waits for an eviction).
    ``stream_static_enrich_agg`` proves the inner variant; this row
    pins that LEFT padding neither drops the row, perturbs its event
    time, nor interacts with the watermark: the per-window TOTAL across
    segments (pads included) equals the un-enriched
    ``stream_late_data_drop`` counts exactly.

    The dim is deliberately restricted (c_custkey % 3 <> 0) so ~1/3 of
    users genuinely miss — the padded rows surface as a real
    'UNMATCHED' segment with hash-pinned counts at every SF, not an
    empty branch. The DuckDB oracle replays the one-batch-lagged late
    filter and final-watermark emission in integer microseconds, then
    applies the same LEFT join + coalesce.

    Scale shape: identical to the inner battery — a broadcast of the
    static dim per micro-batch, no shuffle of the stream beyond the
    windowed aggregate's own exchange, state bounded by the watermark."""
    import os as _os
    import shutil
    import uuid as _uuid

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from drill_calcite_spark.queries.sources import _fixture_dir

    ev = t(spark, sf_dir, "events")
    week = F.least(
        F.floor(F.datediff(F.col("ts"), F.lit("2024-01-01")) / 7),
        F.lit(3))
    batch = (F.when(F.col("event_id") % 13 == 0,
                    F.least(week + 2, F.lit(3)))
             .otherwise(week)).cast("int")
    pdf = (ev.select("event_id", "ts", "user_id",
                     batch.alias("batch")).toPandas())

    base = _os.path.join(_fixture_dir(sf_dir),
                         f"sle_batches_{_uuid.uuid4().hex[:12]}")
    _os.makedirs(base)
    try:
        for bno in range(4):
            part = pdf[pdf.batch == bno].drop(columns=["batch"])
            path = f"{base}/batch_{bno:03d}.parquet"
            _pq.write_table(
                _pa.Table.from_pandas(part, preserve_index=False), path,
                coerce_timestamps="us", allow_truncated_timestamps=True)
            _os.utime(path, (1_700_000_000 + bno * 1000,) * 2)

        schema = spark.read.parquet(base).schema
        dim = F.broadcast(
            t(spark, sf_dir, "customer")
            .filter(F.col("c_custkey") % 3 != 0)
            .select("c_custkey", "c_mktsegment"))
        agg = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(base)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "2 days")
            .join(dim, F.col("c_custkey") == F.col("user_id"), "left")
            .withColumn("segment",
                        F.coalesce("c_mktsegment", F.lit("UNMATCHED")))
            .groupBy(tumble("ts", "1 day").alias("w"), "segment")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
            .select(F.unix_timestamp(F.col("w.start")).cast("bigint")
                    .alias("win_start"), "segment", "n"))
        out = run_available_now(agg, spark, output_mode="append")
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@q("stream_update_mode_emissions", f"""
WITH e AS (
  SELECT epoch_us(ts) AS us,
         least(CAST(floor(date_diff('day', DATE '2024-01-01', ts) / 7)
                    AS BIGINT), 3) AS wk,
         event_id
  FROM events
), b AS (
  SELECT us,
         CASE WHEN event_id % 13 = 0 THEN least(wk + 2, 3) ELSE wk END
           AS batch
  FROM e
), mx AS (
  SELECT batch, max(us) AS mx_us FROM b GROUP BY 1
), wm AS (
  SELECT b2.batch,
         ((SELECT max(mx_us) FROM mx WHERE mx.batch < b2.batch - 1)
          // 1000 - {_WM_DELAY_US // 1000}) * 1000 AS wm_late
  FROM (SELECT DISTINCT batch FROM b) b2
), survived AS (
  SELECT b.us, b.batch
  FROM b JOIN wm ON wm.batch = b.batch
  WHERE wm.wm_late IS NULL
     OR (b.us // {_WM_DAY_US}) * {_WM_DAY_US} + {_WM_DAY_US} > wm.wm_late
), per AS (
  SELECT (us // {_WM_DAY_US}) * {_WM_DAY_US} AS win_us, batch,
         count(*) AS cnt
  FROM survived GROUP BY 1, 2
)
SELECT CAST(win_us // 1000000 AS BIGINT) AS win_start,
       CAST(sum(cnt) OVER (PARTITION BY win_us ORDER BY batch)
            AS BIGINT) AS n
FROM per
""")
def stream_update_mode_emissions(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """UPDATE output mode emission semantics — the one emission class
    the append-mode batteries can't see: every micro-batch re-emits the
    CURRENT running aggregate of each window it updated (no
    finalization, no withholding), so the drained memory table is the
    union of per-trigger emissions — a window touched in three batches
    appears three times with strictly increasing counts. The DuckDB
    oracle replays it exactly: per batch, the surviving rows (the same
    one-batch-lagged late filter the append batteries pin) update their
    window; every (window, batch) with ≥ 1 surviving row emits the
    cumulative survivor count through that batch. The one-batch LAG
    between the filter and eviction watermarks makes post-eviction
    re-creation IMPOSSIBLE (a row passing batch j's filter has
    window_end > evict_wm(j-1) ≥ any earlier eviction threshold), so
    the cumulative replay needs no reset branch — that provable
    simplification is itself the semantics being pinned. Emissions
    are distinct rows (counts strictly increase per window), so the
    multiset compare is exact."""
    import os as _os
    import shutil
    import uuid as _uuid

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from drill_calcite_spark.queries.sources import _fixture_dir

    ev = t(spark, sf_dir, "events")
    week = F.least(
        F.floor(F.datediff(F.col("ts"), F.lit("2024-01-01")) / 7),
        F.lit(3))
    batch = (F.when(F.col("event_id") % 13 == 0,
                    F.least(week + 2, F.lit(3)))
             .otherwise(week)).cast("int")
    pdf = (ev.select("event_id", "ts", batch.alias("batch")).toPandas())

    base = _os.path.join(_fixture_dir(sf_dir),
                         f"upd_batches_{_uuid.uuid4().hex[:12]}")
    _os.makedirs(base)
    try:
        for bno in range(4):
            part = pdf[pdf.batch == bno].drop(columns=["batch"])
            path = f"{base}/batch_{bno:03d}.parquet"
            _pq.write_table(
                _pa.Table.from_pandas(part, preserve_index=False), path,
                coerce_timestamps="us", allow_truncated_timestamps=True)
            _os.utime(path, (1_700_000_000 + bno * 1000,) * 2)

        schema = spark.read.parquet(base).schema
        agg = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(base)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "2 days")
            .groupBy(tumble("ts", "1 day").alias("w"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
            .select(F.unix_timestamp(F.col("w.start")).cast("bigint")
                    .alias("win_start"), "n"))
        out = run_available_now(agg, spark, output_mode="update")
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


_DD_DELAY_US = 12 * 3_600_000_000  # 12 hours


@q("stream_dedup_expiry", f"""
WITH b AS (
  SELECT user_id,
         least(CAST(floor(date_diff('day', DATE '2024-01-01', ts) / 7)
                    AS BIGINT), 3) AS batch,
         min(epoch_us(ts)) AS us
  FROM events GROUP BY 1, 2
), mx AS (SELECT batch, max(us) AS m FROM b GROUP BY 1),
w AS (
  -- W_j = eviction watermark OPERATING during batch j: max event time
  -- over batches <= j-1, minus the delay. State entering batch j was
  -- last cleaned with W_(j-1).
  SELECT b2.batch,
         coalesce(((SELECT max(m) FROM mx WHERE mx.batch <= b2.batch - 1)
                   // 1000 - {_DD_DELAY_US // 1000}) * 1000, 0) AS wm
  FROM (SELECT DISTINCT batch FROM b) b2),
a0 AS (SELECT user_id, us FROM b WHERE batch = 0),
a1 AS (SELECT b.user_id, b.us FROM b
       WHERE batch = 1 AND EXISTS (
         SELECT 1 FROM a0 WHERE a0.user_id = b.user_id
           AND a0.us + {_DD_DELAY_US}
               <= (SELECT wm FROM w WHERE batch = 0))),
s1 AS (SELECT user_id, us FROM a0 UNION ALL SELECT user_id, us FROM a1),
l1 AS (SELECT user_id, max(us) AS us FROM s1 GROUP BY 1),
a2 AS (SELECT b.user_id, b.us FROM b JOIN l1 ON l1.user_id = b.user_id
       WHERE batch = 2 AND l1.us + {_DD_DELAY_US}
             <= (SELECT wm FROM w WHERE batch = 1)),
s2 AS (SELECT * FROM s1 UNION ALL SELECT * FROM a2),
l2 AS (SELECT user_id, max(us) AS us FROM s2 GROUP BY 1),
a3 AS (SELECT b.user_id, b.us FROM b JOIN l2 ON l2.user_id = b.user_id
       WHERE batch = 3 AND l2.us + {_DD_DELAY_US}
             <= (SELECT wm FROM w WHERE batch = 2)),
adm AS (SELECT * FROM s2 UNION ALL SELECT * FROM a3)
SELECT user_id, CAST(us // 1000000 AS BIGINT) AS tse FROM adm
""")
def stream_dedup_expiry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dropDuplicatesWithinWatermark`` STATE-EXPIRY semantics,
    oracle-backed across micro-batches: four mtime-ordered batch files
    (one per trigger; each holds at most ONE row per user — the
    per-user week minimum — so intra-batch admission order cannot
    matter), a 12-hour watermark, and a key that re-appears every week.
    The battery pins all three behaviors: first arrival EMITS, a
    duplicate while the key's state is live is SUPPRESSED, and a
    duplicate arriving after the watermark expired the state is
    RE-ADMITTED as a fresh row (at sf0.01: 130 of 150 users re-admit in
    batch 2, the late-minimum 20 in batch 3 — the expiry boundary cuts through
    the user population, so the row is sensitive to the exact rule).

    The DuckDB oracle unrolls the four batches and replays the rule in
    integer microseconds: state admitted with timestamp t expires when
    t + delay ≤ W, where W is the eviction watermark that last cleaned
    state BEFORE the batch (max event time through batch j-2, minus
    delay — one batch behind, exactly as stream_late_data_drop pins for
    the aggregation path; calibrated empirically: the current-batch
    watermark would re-admit all 150 users one batch early and hash
    red). stream_live_dedup covers the single-batch dedup path; THIS
    row is the cross-batch state lifecycle."""
    import os as _os
    import shutil
    import uuid as _uuid

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from drill_calcite_spark.queries.sources import _fixture_dir

    ev = t(spark, sf_dir, "events")
    wk = F.least(F.floor(F.datediff(F.col("ts"), F.lit("2024-01-01")) / 7),
                 F.lit(3)).cast("int")
    pdf = (ev.withColumn("batch", wk).groupBy("user_id", "batch")
           .agg(F.min("ts").alias("ts")).toPandas())

    base = _os.path.join(_fixture_dir(sf_dir),
                         f"dd_batches_{_uuid.uuid4().hex[:12]}")
    _os.makedirs(base)
    try:
        for bno in range(4):
            part = (pdf[pdf.batch == bno].drop(columns=["batch"])
                    .sort_values("user_id"))
            path = f"{base}/batch_{bno:03d}.parquet"
            _pq.write_table(
                _pa.Table.from_pandas(part, preserve_index=False), path,
                coerce_timestamps="us", allow_truncated_timestamps=True)
            _os.utime(path, (1_700_000_000 + bno * 1000,) * 2)

        schema = spark.read.parquet(base).schema
        ded = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(base)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "12 hours")
            .dropDuplicatesWithinWatermark(["user_id"])
            .select("user_id",
                    F.unix_timestamp("ts").cast("bigint").alias("tse")))
        out = run_available_now(ded, spark, output_mode="append")
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@q("stream_chained_dedup_agg", f"""
WITH b AS (
  SELECT user_id,
         least(CAST(floor(date_diff('day', DATE '2024-01-01', ts) / 7)
                    AS BIGINT), 3) AS batch,
         min(epoch_us(ts)) AS us
  FROM events GROUP BY 1, 2
), mx AS (SELECT batch, max(us) AS m FROM b GROUP BY 1),
w AS (
  SELECT b2.batch,
         coalesce(((SELECT max(m) FROM mx WHERE mx.batch <= b2.batch - 1)
                   // 1000 - {_DD_DELAY_US // 1000}) * 1000, 0) AS wm
  FROM (SELECT DISTINCT batch FROM b) b2),
a0 AS (SELECT user_id, us FROM b WHERE batch = 0),
a1 AS (SELECT b.user_id, b.us FROM b
       WHERE batch = 1 AND EXISTS (
         SELECT 1 FROM a0 WHERE a0.user_id = b.user_id
           AND a0.us + {_DD_DELAY_US}
               <= (SELECT wm FROM w WHERE batch = 0))),
s1 AS (SELECT user_id, us FROM a0 UNION ALL SELECT user_id, us FROM a1),
l1 AS (SELECT user_id, max(us) AS us FROM s1 GROUP BY 1),
a2 AS (SELECT b.user_id, b.us FROM b JOIN l1 ON l1.user_id = b.user_id
       WHERE batch = 2 AND l1.us + {_DD_DELAY_US}
             <= (SELECT wm FROM w WHERE batch = 1)),
s2 AS (SELECT * FROM s1 UNION ALL SELECT * FROM a2),
l2 AS (SELECT user_id, max(us) AS us FROM s2 GROUP BY 1),
a3 AS (SELECT b.user_id, b.us FROM b JOIN l2 ON l2.user_id = b.user_id
       WHERE batch = 3 AND l2.us + {_DD_DELAY_US}
             <= (SELECT wm FROM w WHERE batch = 2)),
adm AS (SELECT * FROM s2 UNION ALL SELECT * FROM a3),
fin AS (SELECT (max(us) // 1000 - {_DD_DELAY_US // 1000}) * 1000
          AS wm_final FROM b)
SELECT CAST((us // {_WM_DAY_US}) * 86400 AS BIGINT) AS win_start,
       CAST(count(*) AS BIGINT) AS n_users
FROM adm, fin
WHERE (us // {_WM_DAY_US}) * {_WM_DAY_US} + {_WM_DAY_US} <= fin.wm_final
GROUP BY 1
""")
def stream_chained_dedup_agg(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """CHAINED MULTI-STATEFUL streaming — ``dropDuplicatesWithinWatermark``
    feeding a TUMBLE(1 day) aggregate in ONE append-mode query, the
    dedup-then-aggregate composition every production pipeline reaches
    for first (Spark 4 allows stacked stateful operators in append mode;
    the reference plans the same stacking of Delta through Aggregate,
    rel/stream/StreamRules.java:123).

    Oracle: the hash-proven per-batch admission replay of
    ``stream_dedup_expiry`` (state expires when its admitted timestamp +
    delay clears the one-batch-lagged eviction watermark) composed into
    the append-mode window emission rule of ``stream_late_data_drop``
    (a day window emits its final count iff its end clears the final
    eviction watermark — max input event time over ALL rows, suppressed
    duplicates included, minus the delay, in truncated milliseconds).
    Two replay simplifications are BY CONSTRUCTION of the fixture, not
    assumptions: (a) the aggregate's late-input filter never binds —
    batch j carries only week-j (or later) rows while its filter
    watermark trails at week j-2's maximum minus the delay, so no
    admitted row's window end can sit below it; (b) every day window
    receives all of its admitted rows in exactly ONE micro-batch (a
    week's rows ship in that week's batch), so no window is emitted
    twice and no post-eviction re-creation is possible. The battery is
    non-vacuous in both stateful stages: week-1 windows are ABSENT from
    the output (all 150 batch-1 duplicates are suppressed by live dedup
    state — an un-deduped aggregate emits them), week-2 windows carry
    only the users whose state EXPIRED (130 of 150 at sf0.01), and the
    trailing windows past the final watermark are withheld (the
    aggregate stage doing its own job on the dedup survivors).

    Scale shape: both operators keep watermark-bounded state (dedup
    keys ≤ delay behind the front, windows ≤ delay behind the front);
    the chain adds NO extra shuffle beyond the two stateful exchanges
    Spark already requires (keys, then windows)."""
    import os as _os
    import shutil
    import uuid as _uuid

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from drill_calcite_spark.queries.sources import _fixture_dir

    ev = t(spark, sf_dir, "events")
    wk = F.least(F.floor(F.datediff(F.col("ts"), F.lit("2024-01-01")) / 7),
                 F.lit(3)).cast("int")
    pdf = (ev.withColumn("batch", wk).groupBy("user_id", "batch")
           .agg(F.min("ts").alias("ts")).toPandas())

    base = _os.path.join(_fixture_dir(sf_dir),
                         f"cda_batches_{_uuid.uuid4().hex[:12]}")
    _os.makedirs(base)
    try:
        for bno in range(4):
            part = (pdf[pdf.batch == bno].drop(columns=["batch"])
                    .sort_values("user_id"))
            path = f"{base}/batch_{bno:03d}.parquet"
            _pq.write_table(
                _pa.Table.from_pandas(part, preserve_index=False), path,
                coerce_timestamps="us", allow_truncated_timestamps=True)
            _os.utime(path, (1_700_000_000 + bno * 1000,) * 2)

        schema = spark.read.parquet(base).schema
        chained = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(base)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "12 hours")
            .dropDuplicatesWithinWatermark(["user_id"])
            .groupBy(tumble("ts", "1 day").alias("w"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
            .select(F.unix_timestamp(F.col("w.start")).cast("bigint")
                    .alias("win_start"), "n_users"))
        out = run_available_now(chained, spark, output_mode="append")
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@q("stream_enrich_dedup_window", f"""
WITH b AS (
  SELECT user_id,
         least(CAST(floor(date_diff('day', DATE '2024-01-01', ts) / 7)
                    AS BIGINT), 3) AS batch,
         min(epoch_us(ts)) AS us
  FROM events GROUP BY 1, 2
), mx AS (SELECT batch, max(us) AS m FROM b GROUP BY 1),
w AS (
  SELECT b2.batch,
         coalesce(((SELECT max(m) FROM mx WHERE mx.batch <= b2.batch - 1)
                   // 1000 - {_DD_DELAY_US // 1000}) * 1000, 0) AS wm
  FROM (SELECT DISTINCT batch FROM b) b2),
a0 AS (SELECT user_id, us FROM b WHERE batch = 0),
a1 AS (SELECT b.user_id, b.us FROM b
       WHERE batch = 1 AND EXISTS (
         SELECT 1 FROM a0 WHERE a0.user_id = b.user_id
           AND a0.us + {_DD_DELAY_US}
               <= (SELECT wm FROM w WHERE batch = 0))),
s1 AS (SELECT user_id, us FROM a0 UNION ALL SELECT user_id, us FROM a1),
l1 AS (SELECT user_id, max(us) AS us FROM s1 GROUP BY 1),
a2 AS (SELECT b.user_id, b.us FROM b JOIN l1 ON l1.user_id = b.user_id
       WHERE batch = 2 AND l1.us + {_DD_DELAY_US}
             <= (SELECT wm FROM w WHERE batch = 1)),
s2 AS (SELECT * FROM s1 UNION ALL SELECT * FROM a2),
l2 AS (SELECT user_id, max(us) AS us FROM s2 GROUP BY 1),
a3 AS (SELECT b.user_id, b.us FROM b JOIN l2 ON l2.user_id = b.user_id
       WHERE batch = 3 AND l2.us + {_DD_DELAY_US}
             <= (SELECT wm FROM w WHERE batch = 2)),
adm AS (SELECT * FROM s2 UNION ALL SELECT * FROM a3),
fin AS (SELECT (max(us) // 1000 - {_DD_DELAY_US // 1000}) * 1000
          AS wm_final FROM b)
SELECT CAST((us // {_WM_DAY_US}) * 86400 AS BIGINT) AS win_start,
       coalesce(dim.c_mktsegment, 'UNMATCHED') AS segment,
       CAST(count(*) AS BIGINT) AS n_users
FROM adm
LEFT JOIN (SELECT c_custkey, c_mktsegment FROM customer
           WHERE c_custkey % 3 <> 0) dim
       ON dim.c_custkey = adm.user_id, fin
WHERE (us // {_WM_DAY_US}) * {_WM_DAY_US} + {_WM_DAY_US}
      <= fin.wm_final
GROUP BY 1, 2
""")
def stream_enrich_dedup_window(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """The FOURTH chained composition — stream-static LEFT OUTER enrich
    INTO dedup INTO window (enrich → dedup → TUMBLE day, grouped by
    enriched segment) in ONE append-mode query: the full production
    shape (dimension lookup, then dedup, then windowed rollup; the
    reference plans the same Delta-Join-Delta-Aggregate stacking,
    rel/stream/StreamRules.java:123).

    Composition algebra: the enrich stays STATELESS (static side
    broadcast in full to every micro-batch — the
    ``stream_static_left_enrich`` proof) and neither perturbs event
    time nor the watermark, so the dedup admission set is EXACTLY
    ``stream_chained_dedup_agg``'s replay (same fixture: per-user
    min(ts) per whole-week batch, 12 h delay). The dedup key
    (user_id) determines the segment, so grouping the admitted rows by
    (day window, segment) is the admission replay LEFT-joined to the
    restricted dim at the end — which is the oracle verbatim: the
    r13-green chained-dedup CTE chain with the r13-green enrich join
    grafted onto its final SELECT.

    NULL-pad non-vacuousness (pinned by test_streaming.py at 3 SFs):
    the dim drops c_custkey % 3 = 0, so ~1/3 of users enrich to the
    padded 'UNMATCHED' segment BEFORE the dedup — those pads must
    survive dropDuplicatesWithinWatermark (key = user_id; pad columns
    are not part of the key) and surface as hash-pinned UNMATCHED
    window counts, and a padded user's later duplicate must be
    suppressed by the same state entry as a matched user's.

    Scale shape: broadcast dim per micro-batch (no stream shuffle for
    the enrich), then the two watermark-bounded stateful exchanges the
    chain already pays (dedup keys, then windows) — the composition
    adds zero state and zero extra shuffle."""
    import os as _os
    import shutil
    import uuid as _uuid

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from drill_calcite_spark.queries.sources import _fixture_dir

    ev = t(spark, sf_dir, "events")
    wk = F.least(F.floor(F.datediff(F.col("ts"), F.lit("2024-01-01")) / 7),
                 F.lit(3)).cast("int")
    pdf = (ev.withColumn("batch", wk).groupBy("user_id", "batch")
           .agg(F.min("ts").alias("ts")).toPandas())

    base = _os.path.join(_fixture_dir(sf_dir),
                         f"edw_batches_{_uuid.uuid4().hex[:12]}")
    _os.makedirs(base)
    try:
        for bno in range(4):
            part = (pdf[pdf.batch == bno].drop(columns=["batch"])
                    .sort_values("user_id"))
            path = f"{base}/batch_{bno:03d}.parquet"
            _pq.write_table(
                _pa.Table.from_pandas(part, preserve_index=False), path,
                coerce_timestamps="us", allow_truncated_timestamps=True)
            _os.utime(path, (1_700_000_000 + bno * 1000,) * 2)

        schema = spark.read.parquet(base).schema
        dim = F.broadcast(
            t(spark, sf_dir, "customer")
            .filter(F.col("c_custkey") % 3 != 0)
            .select("c_custkey", "c_mktsegment"))
        chained = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(base)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "12 hours")
            .join(dim, F.col("c_custkey") == F.col("user_id"), "left")
            .withColumn("segment",
                        F.coalesce("c_mktsegment", F.lit("UNMATCHED")))
            .dropDuplicatesWithinWatermark(["user_id"])
            .groupBy(tumble("ts", "1 day").alias("w"), "segment")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
            .select(F.unix_timestamp(F.col("w.start")).cast("bigint")
                    .alias("win_start"), "segment", "n_users"))
        out = run_available_now(chained, spark, output_mode="append")
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


_CJA_IV_US = 26 * 3_600_000_000   # 26 h join interval (see docstring)

# DuckDB replay for stream_chained_join_agg — registered r14 (the r13
# overflow queue was at its 10-name cap; the r13 verdict orders the @q
# entry + a slate slot this round). The identical comparison also runs
# in tests/test_streaming.py at 3 SFs.
STREAM_CHAINED_JOIN_AGG_ORACLE = f"""
WITH e AS (
  SELECT user_id, event_type, epoch_us(ts) AS us
  FROM events WHERE event_type IN ('view', 'click')
), mx AS (
  SELECT max(us) FILTER (event_type = 'view') AS mv,
         max(us) FILTER (event_type = 'click') AS mc FROM e
), p AS (
  SELECT b.us AS b_us
  FROM (SELECT user_id, us FROM e WHERE event_type = 'view') a
  JOIN (SELECT user_id, us FROM e WHERE event_type = 'click') b
    ON a.user_id = b.user_id
   AND b.us >= a.us AND b.us <= a.us + {_CJA_IV_US}
), g AS (
  SELECT (b_us // 86400000000) * 86400 AS win_start,
         count(*) AS n_pairs
  FROM p GROUP BY 1
)
SELECT win_start, n_pairs FROM g
WHERE (win_start + 86400) * 1000000
      <= ((SELECT least(mv, mc) FROM mx) // 1000 - 86400000) * 1000
         - {_CJA_IV_US}
"""


@q("stream_chained_join_agg", STREAM_CHAINED_JOIN_AGG_ORACLE)
def stream_chained_join_agg(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """CHAINED stream-stream JOIN → windowed aggregate — the third
    stacked-stateful composition (after dedup→agg and window→rollup):
    a views×clicks interval join (click within 26 h of the view, same
    user) feeding a TUMBLE(1 day) count of joined pairs in ONE
    append-mode query (Spark 4 multi-stateful; the reference plans the
    same Delta-join-through-Aggregate stacking,
    rel/stream/StreamRules.java:123).

    CALIBRATION DISCOVERY, decisively pinned at every SF: the
    aggregate's eviction watermark is NOT the global watermark but the
    JOIN'S OUTPUT watermark — the min of the two sides' STATE
    watermarks (SPARK-40925 per-operator watermark propagation). A
    buffered view stays matchable while a_ts + 26h clears the global
    watermark, so the join can still emit rows that far back and the
    propagated value is wm − 26h; a day window therefore finalizes
    only once its end clears wm − 26h. The 26-hour interval is chosen
    BECAUSE it exceeds the 24-hour window width: the band
    (wm − 26h, wm] then always contains a day boundary, so the naive
    global-wm emission rule over-emits at least one window at EVERY SF
    — red by construction, not by luck (verified red at
    sf0.001/0.01/0.1; the sibling join batteries' 2 h interval left
    the two rules indistinguishable on this data).

    Replay simplifications BY CONSTRUCTION (same fixture algebra as
    stream_chained_dedup_agg): batches are whole weeks with no
    stragglers, and b_ts ≥ a_ts makes a pair's emission batch
    (max of the two sides' batches) equal its day-window's week batch
    — every window's pairs are emitted by the join in exactly ONE
    micro-batch, so no window finalizes short, and the aggregate's
    late-input filter (which trails a further batch behind) never
    binds. Cross-batch JOINS still occur (a week-j view matched by a
    week-j+1 click rides the view buffer across the boundary —
    pinned non-vacuous by test), so the join's buffering is exercised
    even though window emission stays single-batch.

    Scale shape: both stateful operators keep watermark-bounded state
    (join buffers bounded by the interval + delay, window state by the
    propagated delay); the chain adds no shuffle beyond the two
    stateful exchanges (user key, then window)."""
    import os as _os
    import shutil
    import uuid as _uuid

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from drill_calcite_spark.queries.sources import _fixture_dir

    ev = (t(spark, sf_dir, "events")
          .filter(F.col("event_type").isin("view", "click")))
    wk = F.least(F.floor(F.datediff(F.col("ts"), F.lit("2024-01-01")) / 7),
                 F.lit(3)).cast("int")
    pdf = (ev.select("event_id", "ts", "user_id", "event_type",
                     wk.alias("batch")).toPandas())

    base = _os.path.join(_fixture_dir(sf_dir),
                         f"cja_batches_{_uuid.uuid4().hex[:12]}")
    _os.makedirs(base)
    try:
        for bno in range(4):
            part = (pdf[pdf.batch == bno].drop(columns=["batch"])
                    .sort_values("event_id"))
            path = f"{base}/batch_{bno:03d}.parquet"
            _pq.write_table(
                _pa.Table.from_pandas(part, preserve_index=False), path,
                coerce_timestamps="us", allow_truncated_timestamps=True)
            _os.utime(path, (1_700_000_000 + bno * 1000,) * 2)

        schema = spark.read.parquet(base).schema

        def side(tp: str, pre: str) -> DataFrame:
            return (spark.readStream.schema(schema)
                    .option("maxFilesPerTrigger", 1).parquet(base)
                    .filter(F.col("event_type") == tp)
                    .select(F.col("event_id").alias(f"{pre}_id"),
                            F.col("user_id").alias(f"{pre}_user"),
                            F.col("ts").cast("timestamp")
                            .alias(f"{pre}_ts"))
                    .withWatermark(f"{pre}_ts", "1 day"))

        chained = (
            side("view", "a").join(
                side("click", "b"),
                (F.col("a_user") == F.col("b_user"))
                & (F.col("b_ts") >= F.col("a_ts"))
                & (F.col("b_ts") <= F.col("a_ts")
                   + F.expr("INTERVAL 26 HOURS")))
            .groupBy(tumble("b_ts", "1 day").alias("w"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
            .select(F.unix_timestamp(F.col("w.start")).cast("bigint")
                    .alias("win_start"), "n_pairs"))
        out = run_available_now(chained, spark, output_mode="append")
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


_SSJ_DELAY_US = 86_400_000_000   # 1 day watermark
_SSJ_IV_US = 2 * 3_600_000_000   # 2 hour join interval


@q("stream_join_state_expiry", f"""
WITH e AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
         least(CAST(floor(date_diff('day', DATE '2024-01-01', ts) / 7)
                    AS BIGINT), 3) AS wk
  FROM events WHERE event_type IN ('view', 'click')
), b AS (
  SELECT event_id, user_id, event_type, us,
         CASE WHEN (event_type = 'click' AND event_id % 13 = 0)
                OR (event_type = 'view' AND event_id % 17 = 0)
              THEN least(wk + 2, 3) ELSE wk END AS batch
  FROM e
), mx AS (SELECT batch, max(us) AS m FROM b GROUP BY 1),
w AS (
  -- W_j = eviction watermark operating during batch j
  SELECT b2.batch,
         coalesce(((SELECT max(m) FROM mx WHERE mx.batch <= b2.batch - 1)
                   // 1000 - {_SSJ_DELAY_US // 1000}) * 1000,
                  -4611686018427387904) AS wm
  FROM (SELECT DISTINCT batch FROM b) b2),
f AS (
  -- late-input filter of batch j = W_(j-1), one batch behind eviction
  SELECT batch,
         coalesce((SELECT wm FROM w w2 WHERE w2.batch = w3.batch - 1),
                  -4611686018427387904) AS fwm
  FROM (SELECT DISTINCT batch FROM b) w3),
av AS (SELECT event_id AS a_id, user_id AS a_user, us AS a_us,
              batch AS a_b FROM b WHERE event_type = 'view'),
cl AS (SELECT event_id AS b_id, user_id AS b_user, us AS b_us,
              batch AS b_b FROM b WHERE event_type = 'click'),
p AS (
  SELECT a_id, b_id, a_us, b_us, a_b, b_b
  FROM av JOIN cl ON a_user = b_user
   AND b_us >= a_us AND b_us <= a_us + {_SSJ_IV_US}
)
SELECT a_id, b_id FROM p
WHERE a_us >= (SELECT fwm FROM f WHERE batch = a_b)
  AND b_us >= (SELECT fwm FROM f WHERE batch = b_b)
  AND (a_b >= b_b
       OR a_us + {_SSJ_IV_US} > (SELECT wm FROM w WHERE batch = b_b - 1))
  AND (b_b >= a_b
       OR b_us > (SELECT wm FROM w WHERE batch = a_b - 1))
""")
def stream_join_state_expiry(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """STREAM-STREAM JOIN state semantics, oracle-backed across
    micro-batches — the third panel of the streaming-state trilogy
    (stream_late_data_drop pins windowed-aggregation state,
    stream_dedup_expiry pins dedup state; this pins JOIN buffers): a
    views×clicks interval join (click within 2 h of the view, same
    user) over four mtime-ordered batch files with BOTH sides' 1-in-k
    stragglers shipped two batches late, watermarked 1 day.

    The DuckDB oracle replays the buffer lifecycle exactly, in integer
    microseconds: each batch's LATE-INPUT filter is the one-batch-
    lagged watermark W_(j-1) (the WatermarkTracker rule both sibling
    batteries pin); a buffered VIEW can still meet a later click iff
    its match horizon clears the watermark that last swept state
    (a_us + 2h > W_(j-1)); a buffered CLICK survives for a later view
    iff b_us > W_(i-1) — the horizon the join condition itself implies
    (the latest matching view has a_ts = b_ts, so Spark derives a
    tighter eviction bound for the click buffer). Cross-batch pairs on
    BOTH sides of each boundary exist by construction, so a wrong
    eviction rule in either buffer hashes red (calibration found every
    raw candidate category split by the boundary). Same-batch pairs,
    buffered-view pairs, buffered-click pairs, and late-dropped inputs
    are all represented in the emitted set."""
    import os as _os
    import shutil
    import uuid as _uuid

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from drill_calcite_spark.queries.sources import _fixture_dir

    ev = (t(spark, sf_dir, "events")
          .filter(F.col("event_type").isin("view", "click")))
    wk = F.least(F.floor(F.datediff(F.col("ts"), F.lit("2024-01-01")) / 7),
                 F.lit(3))
    late = (((F.col("event_type") == "click")
             & (F.col("event_id") % 13 == 0))
            | ((F.col("event_type") == "view")
               & (F.col("event_id") % 17 == 0)))
    batch = (F.when(late, F.least(wk + 2, F.lit(3)))
             .otherwise(wk)).cast("int")
    pdf = (ev.select("event_id", "ts", "user_id", "event_type",
                     batch.alias("batch")).toPandas())

    base = _os.path.join(_fixture_dir(sf_dir),
                         f"ssj_batches_{_uuid.uuid4().hex[:12]}")
    _os.makedirs(base)
    try:
        for bno in range(4):
            part = (pdf[pdf.batch == bno].drop(columns=["batch"])
                    .sort_values("event_id"))
            path = f"{base}/batch_{bno:03d}.parquet"
            _pq.write_table(
                _pa.Table.from_pandas(part, preserve_index=False), path,
                coerce_timestamps="us", allow_truncated_timestamps=True)
            _os.utime(path, (1_700_000_000 + bno * 1000,) * 2)

        schema = spark.read.parquet(base).schema

        def side(tp: str, pre: str) -> DataFrame:
            return (spark.readStream.schema(schema)
                    .option("maxFilesPerTrigger", 1).parquet(base)
                    .filter(F.col("event_type") == tp)
                    .select(F.col("event_id").alias(f"{pre}_id"),
                            F.col("user_id").alias(f"{pre}_user"),
                            F.col("ts").cast("timestamp")
                            .alias(f"{pre}_ts"))
                    .withWatermark(f"{pre}_ts", "1 day"))

        joined = side("view", "a").join(
            side("click", "b"),
            (F.col("a_user") == F.col("b_user"))
            & (F.col("b_ts") >= F.col("a_ts"))
            & (F.col("b_ts") <= F.col("a_ts")
               + F.expr("INTERVAL 2 HOURS")))
        out = run_available_now(joined.select("a_id", "b_id"), spark,
                                output_mode="append")
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


_NEG_US = -4611686018427387904


@q("stream_outer_join_emit", f"""
WITH e AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
         least(CAST(floor(date_diff('day', DATE '2024-01-01', ts) / 7)
                    AS BIGINT), 3) AS wk
  FROM events WHERE event_type IN ('view', 'click')
), b AS (
  SELECT event_id, user_id, event_type, us,
         CASE WHEN (event_type = 'click' AND event_id % 13 = 0)
                OR (event_type = 'view' AND event_id % 17 = 0)
              THEN least(wk + 2, 3) ELSE wk END AS batch
  FROM e
),
mxv AS (SELECT batch, max(us) AS m FROM b
        WHERE event_type = 'view' GROUP BY 1),
mxc AS (SELECT batch, max(us) AS m FROM b
        WHERE event_type = 'click' GROUP BY 1),
w AS (
  -- W_j = eviction watermark operating during batch j, under the
  -- multipleWatermarkPolicy=min default: each SIDE advances its own
  -- watermark from its own max event time; the global value is the
  -- MIN of the two (NOT the combined max — calibrated: the combined
  -- max mis-pads exactly the views inside the gap between the two
  -- sides' maxima)
  SELECT b2.batch,
         CASE WHEN v.m IS NULL OR c.m IS NULL THEN {_NEG_US}
              ELSE (least(v.m, c.m) // 1000
                    - {_SSJ_DELAY_US // 1000}) * 1000 END AS wm
  FROM (SELECT DISTINCT batch FROM b UNION SELECT 4) b2
  LEFT JOIN LATERAL (SELECT max(m) AS m FROM mxv
                     WHERE mxv.batch <= b2.batch - 1) v ON true
  LEFT JOIN LATERAL (SELECT max(m) AS m FROM mxc
                     WHERE mxc.batch <= b2.batch - 1) c ON true
),
f AS (
  SELECT w3.batch,
         coalesce((SELECT wm FROM w w2 WHERE w2.batch = w3.batch - 1),
                  {_NEG_US}) AS fwm
  FROM (SELECT DISTINCT batch FROM b) w3),
av AS (SELECT event_id AS a_id, user_id AS a_user, us AS a_us,
              batch AS a_b FROM b
       WHERE event_type = 'view'
         AND us >= (SELECT fwm FROM f WHERE f.batch = b.batch)),
cl AS (SELECT event_id AS b_id, user_id AS b_user, us AS b_us,
              batch AS b_b FROM b
       WHERE event_type = 'click'
         AND us >= (SELECT fwm FROM f WHERE f.batch = b.batch)),
p AS (
  SELECT a_id, b_id FROM av JOIN cl ON a_user = b_user
   AND b_us >= a_us AND b_us <= a_us + {_SSJ_IV_US}
  WHERE (a_b >= b_b
         OR a_us + {_SSJ_IV_US} > (SELECT wm FROM w WHERE batch = b_b - 1))
    AND (b_b >= a_b
         OR b_us > (SELECT wm FROM w WHERE batch = a_b - 1))
)
SELECT a_id, b_id FROM p
UNION ALL
SELECT a_id, CAST(NULL AS BIGINT) AS b_id FROM av
WHERE a_id NOT IN (SELECT a_id FROM p)
  AND a_us + {_SSJ_IV_US} <= (SELECT wm FROM w WHERE batch = 4)
""")
def stream_outer_join_emit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM LEFT OUTER interval join — the one stateful class
    the r10 pentalogy left unproven: NULL-padded results must emit
    exactly when the watermark closes the buffered view's match window,
    never before (a view still inside its 2-hour horizon at end of
    drain is WITHHELD in state — no pad), while matched pairs keep the
    inner battery's cross-batch buffer semantics unchanged.

    The DuckDB oracle replays the full lifecycle in integer
    microseconds over the same four mtime-ordered batch files as
    ``stream_join_state_expiry`` (both sides' 1-in-k stragglers shipped
    two batches late, 1-day watermark): the one-batch-lagged late
    filter, per-side buffer-eviction horizons for pairs, and — new
    here — the pad rule: an admitted view that never produced a joined
    row pads iff a_us + 2h ≤ W_final. Calibration surfaced a rule the
    INNER battery cannot distinguish: the global watermark under the
    default multipleWatermarkPolicy=min is the MIN of the two sides'
    own event-time maxima (minus delay), not the combined max — the
    combined-max replay mis-classifies exactly the unmatched views
    whose horizon falls between the two sides' maxima (one view padded
    early, one late-filtered view denied its pad at sf0.001). Pads and
    withheld views both exist by construction (the last day of views
    sits inside the final watermark horizon)."""
    import os as _os
    import shutil
    import uuid as _uuid

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from drill_calcite_spark.queries.sources import _fixture_dir

    ev = (t(spark, sf_dir, "events")
          .filter(F.col("event_type").isin("view", "click")))
    wk = F.least(F.floor(F.datediff(F.col("ts"), F.lit("2024-01-01")) / 7),
                 F.lit(3))
    late = (((F.col("event_type") == "click")
             & (F.col("event_id") % 13 == 0))
            | ((F.col("event_type") == "view")
               & (F.col("event_id") % 17 == 0)))
    batch = (F.when(late, F.least(wk + 2, F.lit(3)))
             .otherwise(wk)).cast("int")
    pdf = (ev.select("event_id", "ts", "user_id", "event_type",
                     batch.alias("batch")).toPandas())

    base = _os.path.join(_fixture_dir(sf_dir),
                         f"soj_batches_{_uuid.uuid4().hex[:12]}")
    _os.makedirs(base)
    try:
        for bno in range(4):
            part = (pdf[pdf.batch == bno].drop(columns=["batch"])
                    .sort_values("event_id"))
            path = f"{base}/batch_{bno:03d}.parquet"
            _pq.write_table(
                _pa.Table.from_pandas(part, preserve_index=False), path,
                coerce_timestamps="us", allow_truncated_timestamps=True)
            _os.utime(path, (1_700_000_000 + bno * 1000,) * 2)

        schema = spark.read.parquet(base).schema

        def side(tp: str, pre: str) -> DataFrame:
            return (spark.readStream.schema(schema)
                    .option("maxFilesPerTrigger", 1).parquet(base)
                    .filter(F.col("event_type") == tp)
                    .select(F.col("event_id").alias(f"{pre}_id"),
                            F.col("user_id").alias(f"{pre}_user"),
                            F.col("ts").cast("timestamp")
                            .alias(f"{pre}_ts"))
                    .withWatermark(f"{pre}_ts", "1 day"))

        joined = side("view", "a").join(
            side("click", "b"),
            (F.col("a_user") == F.col("b_user"))
            & (F.col("b_ts") >= F.col("a_ts"))
            & (F.col("b_ts") <= F.col("a_ts")
               + F.expr("INTERVAL 2 HOURS")),
            "left_outer")
        out = run_available_now(joined.select("a_id", "b_id"), spark,
                                output_mode="append")
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@q("stream_full_outer_join_emit", f"""
WITH e AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
         least(CAST(floor(date_diff('day', DATE '2024-01-01', ts) / 7)
                    AS BIGINT), 3) AS wk
  FROM events WHERE event_type IN ('view', 'click')
), b AS (
  SELECT event_id, user_id, event_type, us,
         CASE WHEN (event_type = 'click' AND event_id % 13 = 0)
                OR (event_type = 'view' AND event_id % 17 = 0)
              THEN least(wk + 2, 3) ELSE wk END AS batch
  FROM e
),
mxv AS (SELECT batch, max(us) AS m FROM b
        WHERE event_type = 'view' GROUP BY 1),
mxc AS (SELECT batch, max(us) AS m FROM b
        WHERE event_type = 'click' GROUP BY 1),
w AS (
  -- W_j under multipleWatermarkPolicy=min: the MIN of the two sides'
  -- own event-time maxima minus delay (the rule the LEFT battery
  -- calibrated)
  SELECT b2.batch,
         CASE WHEN v.m IS NULL OR c.m IS NULL THEN {_NEG_US}
              ELSE (least(v.m, c.m) // 1000
                    - {_SSJ_DELAY_US // 1000}) * 1000 END AS wm
  FROM (SELECT DISTINCT batch FROM b UNION SELECT 4) b2
  LEFT JOIN LATERAL (SELECT max(m) AS m FROM mxv
                     WHERE mxv.batch <= b2.batch - 1) v ON true
  LEFT JOIN LATERAL (SELECT max(m) AS m FROM mxc
                     WHERE mxc.batch <= b2.batch - 1) c ON true
),
f AS (
  SELECT w3.batch,
         coalesce((SELECT wm FROM w w2 WHERE w2.batch = w3.batch - 1),
                  {_NEG_US}) AS fwm
  FROM (SELECT DISTINCT batch FROM b) w3),
av AS (SELECT event_id AS a_id, user_id AS a_user, us AS a_us,
              batch AS a_b FROM b
       WHERE event_type = 'view'
         AND us >= (SELECT fwm FROM f WHERE f.batch = b.batch)),
cl AS (SELECT event_id AS b_id, user_id AS b_user, us AS b_us,
              batch AS b_b FROM b
       WHERE event_type = 'click'
         AND us >= (SELECT fwm FROM f WHERE f.batch = b.batch)),
p AS (
  SELECT a_id, b_id FROM av JOIN cl ON a_user = b_user
   AND b_us >= a_us AND b_us <= a_us + {_SSJ_IV_US}
  WHERE (a_b >= b_b
         OR a_us + {_SSJ_IV_US} > (SELECT wm FROM w WHERE batch = b_b - 1))
    AND (b_b >= a_b
         OR b_us > (SELECT wm FROM w WHERE batch = a_b - 1))
)
SELECT a_id, b_id FROM p
UNION ALL
-- view-side pads: an admitted view that never joined pads once its
-- whole match window clears the FINAL watermark (same rule as LEFT)
SELECT a_id, CAST(NULL AS BIGINT) AS b_id FROM av
WHERE a_id NOT IN (SELECT a_id FROM p)
  AND a_us + {_SSJ_IV_US} <= (SELECT wm FROM w WHERE batch = 4)
UNION ALL
-- click-side pads (the FULL OUTER addition): an admitted click that
-- never joined pads once b_us <= W_final — exactly the horizon its
-- buffer keep-rule b_us > W implies (its latest matching view has
-- a_ts = b_ts)
SELECT CAST(NULL AS BIGINT) AS a_id, b_id FROM cl
WHERE b_id NOT IN (SELECT b_id FROM p)
  AND b_us <= (SELECT wm FROM w WHERE batch = 4)
""")
def stream_full_outer_join_emit(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """STREAM-STREAM FULL OUTER interval join — completes the outer-join
    state family the LEFT battery (``stream_outer_join_emit``) opened:
    BOTH unmatched sides must NULL-pad, each exactly when the watermark
    closes ITS OWN buffer horizon, and the two horizons are different —
    an unmatched view pads when its whole 2-hour match window clears the
    final watermark (``a_us + 2h ≤ W``), while an unmatched click pads
    as soon as its own event time does (``b_us ≤ W``), because the join
    condition bounds its matching views by ``a_ts ≤ b_ts``. A replay
    that applied the view rule to both sides would pad clicks 2 hours
    late; one that applied the click rule to both would pad views 2
    hours early — either hashes red at every SF.

    Same four mtime-ordered batch files, two-batch stragglers on both
    sides, 1-day watermark, and min-policy global watermark as the
    inner/LEFT batteries; the DuckDB oracle replays admission (the
    one-batch-lagged late filter), pair-emission buffer horizons, and
    both pad rules in integer microseconds. Matched pairs are identical
    to the INNER battery's set — FULL OUTER must never add or lose a
    pair. Views withheld in state at end of drain (horizon still open)
    and pads on both sides all exist by construction
    (tests/test_streaming.py pins non-vacuousness)."""
    import os as _os
    import shutil
    import uuid as _uuid

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from drill_calcite_spark.queries.sources import _fixture_dir

    ev = (t(spark, sf_dir, "events")
          .filter(F.col("event_type").isin("view", "click")))
    wk = F.least(F.floor(F.datediff(F.col("ts"), F.lit("2024-01-01")) / 7),
                 F.lit(3))
    late = (((F.col("event_type") == "click")
             & (F.col("event_id") % 13 == 0))
            | ((F.col("event_type") == "view")
               & (F.col("event_id") % 17 == 0)))
    batch = (F.when(late, F.least(wk + 2, F.lit(3)))
             .otherwise(wk)).cast("int")
    pdf = (ev.select("event_id", "ts", "user_id", "event_type",
                     batch.alias("batch")).toPandas())

    base = _os.path.join(_fixture_dir(sf_dir),
                         f"sfj_batches_{_uuid.uuid4().hex[:12]}")
    _os.makedirs(base)
    try:
        for bno in range(4):
            part = (pdf[pdf.batch == bno].drop(columns=["batch"])
                    .sort_values("event_id"))
            path = f"{base}/batch_{bno:03d}.parquet"
            _pq.write_table(
                _pa.Table.from_pandas(part, preserve_index=False), path,
                coerce_timestamps="us", allow_truncated_timestamps=True)
            _os.utime(path, (1_700_000_000 + bno * 1000,) * 2)

        schema = spark.read.parquet(base).schema

        def side(tp: str, pre: str) -> DataFrame:
            return (spark.readStream.schema(schema)
                    .option("maxFilesPerTrigger", 1).parquet(base)
                    .filter(F.col("event_type") == tp)
                    .select(F.col("event_id").alias(f"{pre}_id"),
                            F.col("user_id").alias(f"{pre}_user"),
                            F.col("ts").cast("timestamp")
                            .alias(f"{pre}_ts"))
                    .withWatermark(f"{pre}_ts", "1 day"))

        joined = side("view", "a").join(
            side("click", "b"),
            (F.col("a_user") == F.col("b_user"))
            & (F.col("b_ts") >= F.col("a_ts"))
            & (F.col("b_ts") <= F.col("a_ts")
               + F.expr("INTERVAL 2 HOURS")),
            "full_outer")
        out = run_available_now(joined.select("a_id", "b_id"), spark,
                                output_mode="append")
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


_STO_DELAY_MS = 86_400_000   # 1 day watermark
_STO_T_MS = 86_400_000       # 1 day inactivity timeout


def _sto_merge(prev: str, batch_no: int, fired: str) -> str:
    """One state-walk step: merge batch ``batch_no`` rows into surviving
    state (FULL JOIN — state may not exist yet, the user may be absent)."""
    return f"""
  SELECT coalesce(s.user_id, p.user_id) AS user_id,
         coalesce(s.n, 0) + coalesce(p.n, 0) AS n,
         greatest(coalesce(s.l, 0), coalesce(p.l, 0)) AS l
  FROM {prev} s
  FULL JOIN (SELECT * FROM pb WHERE batch = {batch_no}) p
    ON p.user_id = s.user_id
  WHERE p.user_id IS NOT NULL
     OR s.user_id NOT IN (SELECT user_id FROM {fired})"""


def _sto_fire(prev: str, batch_no: int) -> str:
    """Timeout check entering batch ``batch_no``: fires only for users
    with NO new rows in it (new data always preempts a pending
    timeout)."""
    absent = ("" if batch_no == 4 else
              f"""NOT EXISTS (SELECT 1 FROM pb
           WHERE pb.user_id = s.user_id AND pb.batch = {batch_no})
         AND """)
    return f"""
  SELECT s.user_id, s.n, s.l FROM {prev} s
  WHERE {absent}s.l // 1000 + {_STO_T_MS}
            < (SELECT wm_ms FROM w WHERE batch = {batch_no})"""


@q("stream_stateful_timeout", f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us,
         least(CAST(floor(date_diff('day', DATE '2024-01-01', ts) / 7)
                    AS BIGINT), 3) AS batch
  FROM events
), b AS (
  SELECT * FROM e
  WHERE (user_id % 3 = 0 AND batch IN (0, 3))
     OR (user_id % 3 = 2 AND batch IN (0, 1, 3))
     OR (user_id % 3 = 1)
), pb AS (
  SELECT user_id, batch, count(*) AS n, max(us) AS l
  FROM b GROUP BY 1, 2
), mx AS (SELECT batch, max(us) AS m FROM b GROUP BY 1),
w AS (
  SELECT j.batch,
         coalesce((SELECT max(m) // 1000 FROM mx
                   WHERE mx.batch <= j.batch - 1) - {_STO_DELAY_MS},
                  -4611686018427387) AS wm_ms
  FROM (SELECT DISTINCT batch FROM pb UNION ALL SELECT 4) j),
s0 AS (SELECT user_id, n, l FROM pb WHERE batch = 0),
f1 AS ({_sto_fire('s0', 1)}),
s1 AS ({_sto_merge('s0', 1, 'f1')}),
f2 AS ({_sto_fire('s1', 2)}),
s2 AS ({_sto_merge('s1', 2, 'f2')}),
f3 AS ({_sto_fire('s2', 3)}),
s3 AS ({_sto_merge('s2', 3, 'f3')}),
f4 AS ({_sto_fire('s3', 4)}),
fires AS (SELECT * FROM f1 UNION ALL SELECT * FROM f2
          UNION ALL SELECT * FROM f3 UNION ALL SELECT * FROM f4)
SELECT user_id, CAST(n AS BIGINT) AS n_events,
       CAST(l // 1000000 AS BIGINT) AS last_epoch
FROM fires
""")
def stream_stateful_timeout(spark: SparkSession,
                            sf_dir: str) -> DataFrame:
    """EVENT-TIME TIMEOUT in the custom stateful operator
    (applyInPandasWithState + GroupStateTimeout.EventTimeTimeout) —
    the fourth panel of the streaming-state series: a per-user session
    summarizer that emits (count, last-seen) ONLY when the user has
    been inactive past a 1-day event-time timeout, over four weekly
    micro-batches where a third of users skip weeks 1-2 and another
    third skips week 2 (plus whatever natural absences the data has).

    The DuckDB oracle replays the state walk batch by batch in integer
    MILLISECONDS (Spark tracks watermarks and timeout timestamps in
    ms): a pending timeout fires entering batch j iff the user has NO
    new rows in it (new data always preempts the timeout and re-arms
    it at last-seen + T) and last_ms + T < W_j, the batch's operating
    watermark; fired state is removed and re-created at the user's
    next active batch (a user can legitimately emit twice); the final
    empty micro-batch fires whatever pending timeouts the terminal
    watermark passes. Every (user, count, last-seen) cell is
    hash-pinned, so the row proves preemption, boundary-split firing,
    re-arming, AND terminal flush — the full GroupState timeout
    lifecycle the reference's streaming model has no analogue for."""
    import os as _os
    import shutil
    import uuid as _uuid

    import pandas as _pd
    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from collections.abc import Iterator as _Iterator

    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    from drill_calcite_spark.queries.sources import _fixture_dir

    ev = t(spark, sf_dir, "events")
    wk = F.least(F.floor(F.datediff(F.col("ts"), F.lit("2024-01-01")) / 7),
                 F.lit(3)).cast("int")
    ev = ev.withColumn("batch", wk)
    keep = (((F.col("user_id") % 3 == 0) & F.col("batch").isin(0, 3))
            | ((F.col("user_id") % 3 == 2) & F.col("batch").isin(0, 1, 3))
            | (F.col("user_id") % 3 == 1))
    pdf = (ev.filter(keep)
           .select("event_id", "ts", "user_id", "batch").toPandas())

    base = _os.path.join(_fixture_dir(sf_dir),
                         f"sto_batches_{_uuid.uuid4().hex[:12]}")
    _os.makedirs(base)
    try:
        for bno in range(4):
            part = (pdf[pdf.batch == bno].drop(columns=["batch"])
                    .sort_values("event_id"))
            path = f"{base}/batch_{bno:03d}.parquet"
            _pq.write_table(
                _pa.Table.from_pandas(part, preserve_index=False), path,
                coerce_timestamps="us", allow_truncated_timestamps=True)
            _os.utime(path, (1_700_000_000 + bno * 1000,) * 2)

        t_ms = _STO_T_MS

        def fn(key, pdfs: _Iterator[_pd.DataFrame], state: GroupState):
            if state.hasTimedOut:
                n, last_us = state.get
                state.remove()
                yield _pd.DataFrame({
                    "user_id": [key[0]], "n_events": [n],
                    "last_epoch": [last_us // 1_000_000]})
                return
            n, last_us = state.get if state.exists else (0, 0)
            for p in pdfs:
                n += len(p)
                last_us = max(last_us,
                              int(p["ts"].astype("int64").max()) // 1000)
            state.update((n, last_us))
            state.setTimeoutTimestamp(last_us // 1000 + t_ms)
            return
            yield  # generator form required by the API

        schema = spark.read.parquet(base).schema
        summarized = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(base)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "1 day")
            .groupBy("user_id")
            .applyInPandasWithState(
                fn,
                outputStructType=("user_id long, n_events long, "
                                  "last_epoch long"),
                stateStructType="n long, last_us long",
                outputMode="update",
                timeoutConf=GroupStateTimeout.EventTimeTimeout))
        out = run_available_now(summarized, spark, output_mode="update")
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


_SW_GAP_US = 30 * 60 * 1_000_000   # 30 minute session gap
_SW_DELAY_MS = 86_400_000          # 1 day watermark


def _sw_level(j: int, prev_rem: str) -> str:
    """One session-state step: merge batch ``j``'s admitted rows into the
    surviving pool, re-derive islands, emit sessions the operating
    watermark W_j passes, keep the rest."""
    pool = (f"adm WHERE batch = 0" if j == 0
            else f"{prev_rem} UNION ALL SELECT user_id, us FROM adm "
                 f"WHERE batch = {j}")
    return f"""
p{j} AS (SELECT user_id, us FROM {pool}),
k{j} AS (
  SELECT user_id, us,
         CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
                   > {_SW_GAP_US} THEN 1 ELSE 0 END AS brk
  FROM p{j}),
i{j} AS (
  SELECT user_id, us,
         sum(brk) OVER (PARTITION BY user_id ORDER BY us
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM k{j}),
g{j} AS (SELECT user_id, sid, min(us) AS s, max(us) + {_SW_GAP_US} AS e,
                count(*) AS n
         FROM i{j} GROUP BY 1, 2),
f{j} AS (SELECT user_id, s, e, n FROM g{j}
         WHERE e <= (SELECT wm FROM w WHERE batch = {j})),
r{j} AS (SELECT i.user_id, i.us
         FROM i{j} i JOIN g{j} g ON g.user_id = i.user_id
                                AND g.sid = i.sid
         WHERE g.e > (SELECT wm FROM w WHERE batch = {j}))"""


@q("stream_session_merge", f"""
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us, event_id,
         least(CAST(floor(date_diff('day', DATE '2024-01-01', ts) / 7)
                    AS BIGINT), 3) AS wk
  FROM events
), b AS (
  SELECT user_id, us,
         CASE WHEN event_id % 13 = 0 THEN least(wk + 2, 3) ELSE wk END
           AS batch
  FROM e
), mx AS (SELECT batch, max(us) AS m FROM b GROUP BY 1),
w AS (
  SELECT j.batch,
         coalesce(((SELECT max(m) FROM mx WHERE mx.batch <= j.batch - 1)
                   // 1000 - {_SW_DELAY_MS}) * 1000,
                  -4611686018427387904) AS wm
  FROM (SELECT DISTINCT batch FROM b UNION ALL SELECT 4) j),
adm AS (
  -- session-window late filter: the row's OWN session end (ts + gap)
  -- must clear the lagged filter watermark W_(j-1)
  SELECT user_id, us, batch FROM b
  WHERE us + {_SW_GAP_US}
        >= (SELECT wm FROM w w2 WHERE w2.batch = b.batch - 1)
     OR batch = 0
),{_sw_level(0, '')},{_sw_level(1, 'r0')},{_sw_level(2, 'r1')},{_sw_level(3, 'r2')},
p4 AS (SELECT user_id, us FROM r3),
k4 AS (
  SELECT user_id, us,
         CASE WHEN us - lag(us) OVER (PARTITION BY user_id ORDER BY us)
                   > {_SW_GAP_US} THEN 1 ELSE 0 END AS brk
  FROM p4),
i4 AS (
  SELECT user_id, us,
         sum(brk) OVER (PARTITION BY user_id ORDER BY us
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM k4),
g4 AS (SELECT user_id, sid, min(us) AS s, max(us) + {_SW_GAP_US} AS e,
              count(*) AS n
       FROM i4 GROUP BY 1, 2),
f4 AS (SELECT user_id, s, e, n FROM g4
       WHERE e <= (SELECT wm FROM w WHERE batch = 4)),
fires AS (SELECT * FROM f0 UNION ALL SELECT * FROM f1
          UNION ALL SELECT * FROM f2 UNION ALL SELECT * FROM f3
          UNION ALL SELECT * FROM f4)
SELECT user_id, CAST(s // 1000000 AS BIGINT) AS sess_start,
       CAST(e // 1000000 AS BIGINT) AS sess_end,
       CAST(n AS BIGINT) AS n
FROM fires
""")
def stream_session_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SESSION-WINDOW state semantics, oracle-backed across
    micro-batches — the fifth and final panel of the streaming-state
    series (tumbling aggregation, dedup, join buffers, GroupState
    timeouts, and now MERGING session state): per-user 30-minute
    session windows in APPEND mode over four weekly batch files with
    1-in-13 stragglers arriving two batches late, watermarked 1 day.

    Session state MERGES (a straggler landing within the gap of a
    still-live session extends it across batches), finalizes when the
    batch's operating watermark passes the session end, and a straggler
    whose original session was already emitted starts a legitimate NEW
    overlapping session. The DuckDB oracle replays the full lifecycle —
    five unrolled state-walk levels, each re-deriving gaps-and-islands
    over the surviving event pool and emitting what W_j passes — in
    integer microseconds with ms-exact watermarks. Calibration findings
    the oracle encodes: the late filter tests the row's OWN session end
    (ts + gap) against the lagged filter watermark W_(j-1) — a row up
    to one gap older than the watermark is still admitted (observed:
    27.6 min late admitted, 82.7 min dropped, gap 30 min) — and
    eviction uses the batch's OPERATING watermark (the once-updated
    value would split straggler merges one batch early and hash red).
    Every (user, start, end, count) cell is hash-pinned."""
    import os as _os
    import shutil
    import uuid as _uuid

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from drill_calcite_spark.queries.sources import _fixture_dir

    ev = t(spark, sf_dir, "events")
    wk = F.least(F.floor(F.datediff(F.col("ts"), F.lit("2024-01-01")) / 7),
                 F.lit(3))
    batch = (F.when(F.col("event_id") % 13 == 0,
                    F.least(wk + 2, F.lit(3)))
             .otherwise(wk)).cast("int")
    pdf = (ev.select("event_id", "ts", "user_id", batch.alias("batch"))
           .toPandas())

    base = _os.path.join(_fixture_dir(sf_dir),
                         f"sw_batches_{_uuid.uuid4().hex[:12]}")
    _os.makedirs(base)
    try:
        for bno in range(4):
            part = (pdf[pdf.batch == bno].drop(columns=["batch"])
                    .sort_values("event_id"))
            path = f"{base}/batch_{bno:03d}.parquet"
            _pq.write_table(
                _pa.Table.from_pandas(part, preserve_index=False), path,
                coerce_timestamps="us", allow_truncated_timestamps=True)
            _os.utime(path, (1_700_000_000 + bno * 1000,) * 2)

        schema = spark.read.parquet(base).schema
        agg = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(base)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "1 day")
            .groupBy(F.session_window("ts", "30 minutes").alias("w"),
                     "user_id")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
            .select("user_id",
                    F.unix_timestamp(F.col("w.start")).cast("bigint")
                    .alias("sess_start"),
                    F.unix_timestamp(F.col("w.end")).cast("bigint")
                    .alias("sess_end"), "n"))
        out = run_available_now(agg, spark, output_mode="append")
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@q("stream_checkpoint_resume", f"""
WITH e AS (
  SELECT epoch_us(ts) AS us, value,
         least(CAST(floor(date_diff('day', DATE '2024-01-01', ts) / 7)
                    AS BIGINT), 3) AS wk,
         event_id
  FROM events
), b AS (
  SELECT us, value,
         CASE WHEN event_id % 13 = 0 THEN least(wk + 2, 3) ELSE wk END
           AS batch
  FROM e
), mx AS (SELECT batch, max(us) AS m FROM b GROUP BY 1),
wms AS (
  SELECT j AS batch,
         coalesce(((SELECT max(m) FROM mx WHERE mx.batch <= j - 1)
                   // 1000 - {_WM_DELAY_US // 1000}) * 1000,
                  -4611686018427387904) AS wm
  FROM (VALUES (0), (1), (2), (3), (4)) v(j)),
filt AS (
  -- RESUME semantics: phase 1 (files 0-1) ends with an empty
  -- trailing batch that advances the lagged filter one extra slot, so
  -- the file-2 batch filters with W_2 — one batch TIGHTER than the
  -- uninterrupted run's W_1. Files 0/1/3 filter exactly as the
  -- single-run battery (W_(j-1)).
  SELECT 0 AS batch, -4611686018427387904 AS fwm UNION ALL
  SELECT 1, -4611686018427387904 UNION ALL
  SELECT 2, (SELECT wm FROM wms WHERE batch = 2) UNION ALL
  SELECT 3, (SELECT wm FROM wms WHERE batch = 2)),
survived AS (
  SELECT b.us, b.value
  FROM b JOIN filt ON filt.batch = b.batch
  WHERE (b.us // {_WM_DAY_US}) * {_WM_DAY_US} + {_WM_DAY_US} > filt.fwm
), fin AS (SELECT wm AS wm_final FROM wms WHERE batch = 4)
SELECT CAST((us // {_WM_DAY_US}) * 86400 AS BIGINT) AS win_start,
       CAST(count(*) AS BIGINT) AS n,
       sum(value::DECIMAL(18,6))::DOUBLE AS total_value
FROM survived, fin
WHERE (us // {_WM_DAY_US}) * {_WM_DAY_US} + {_WM_DAY_US} <= fin.wm_final
GROUP BY 1
""")
def stream_checkpoint_resume(spark: SparkSession,
                             sf_dir: str) -> DataFrame:
    """CHECKPOINT STOP/RESUME, oracle-backed: the stream_late_data_drop
    pipeline run as TWO separate streaming queries sharing one
    checkpoint — phase 1 drains files 0-1 and STOPS; files 2-3 land;
    phase 2 starts a NEW query from the same checkpoint and drains the
    rest into the same idempotent foreachBatch parquet sink. The final
    table must equal one exactly-once run: restored watermark, restored
    window state, no duplicated and no lost emission.

    The oracle is NOT simply the single-run answer: stopping after the
    data inserts a trailing empty batch that advances the lagged
    late-input filter one extra slot, so the first post-resume batch
    filters stragglers with W_2 where the uninterrupted run used W_1 —
    the oracle encodes exactly that (calibrated: the single-run filter
    admits (W_1, W_2] stragglers and hashes red here). Everything else
    — watermark restoration across queries, state content, terminal
    emission — must land bit-identically for the hash to pass, which is
    the restart-correctness contract a 1000-executor deployment relies
    on every time it upgrades or rebalances."""
    import os as _os
    import shutil
    import uuid as _uuid

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from drill_calcite_spark.queries.sources import _fixture_dir

    ev = t(spark, sf_dir, "events")
    wk = F.least(F.floor(F.datediff(F.col("ts"), F.lit("2024-01-01")) / 7),
                 F.lit(3))
    batch = (F.when(F.col("event_id") % 13 == 0,
                    F.least(wk + 2, F.lit(3)))
             .otherwise(wk)).cast("int")
    pdf = (ev.select("event_id", "ts", "user_id", "event_type", "value",
                     batch.alias("batch")).toPandas())

    tag = _uuid.uuid4().hex[:12]
    base = _os.path.join(_fixture_dir(sf_dir), f"ck_src_{tag}")
    sink = _os.path.join(_fixture_dir(sf_dir), f"ck_sink_{tag}")
    ckpt = _os.path.join(_fixture_dir(sf_dir), f"ck_ckpt_{tag}")
    _os.makedirs(base)

    def _write(bno: int) -> None:
        part = pdf[pdf.batch == bno].drop(columns=["batch"])
        path = f"{base}/batch_{bno:03d}.parquet"
        _pq.write_table(
            _pa.Table.from_pandas(part, preserve_index=False), path,
            coerce_timestamps="us", allow_truncated_timestamps=True)
        _os.utime(path, (1_700_000_000 + bno * 1000,) * 2)

    def _drain() -> None:
        schema = spark.read.parquet(base).schema
        agg = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(base)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .withWatermark("ts", "2 days")
            .groupBy(tumble("ts", "1 day").alias("w"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"),
                 F.sum(F.col("value").cast("decimal(18,6)"))
                 .cast("double").alias("total_value"))
            .select(F.unix_timestamp(F.col("w.start")).cast("bigint")
                    .alias("win_start"), "n", "total_value"))

        def snk(bdf, bid):
            # batch-id-keyed overwrite = IDEMPOTENT under micro-batch
            # retries (a replayed batch rewrites its own directory
            # instead of appending duplicates)
            bdf.write.mode("overwrite").parquet(
                _os.path.join(sink, f"b{bid:05d}"))

        q_ = (agg.writeStream.foreachBatch(snk).outputMode("append")
              .option("checkpointLocation", ckpt)
              .trigger(availableNow=True).start())
        try:
            if not q_.awaitTermination(300):
                raise TimeoutError("checkpoint drain exceeded 300s")
        finally:
            if q_.isActive:
                q_.stop()

    try:
        _write(0)
        _write(1)
        _drain()
        _write(2)
        _write(3)
        _drain()
        rows = spark.read.option("recursiveFileLookup", "true") \
            .parquet(sink).collect()
        from pyspark.sql.types import (LongType, DoubleType, StructField,
                                       StructType)
        schema_out = StructType([
            StructField("win_start", LongType()),
            StructField("n", LongType()),
            StructField("total_value", DoubleType())])
        return spark.createDataFrame(rows, schema_out)
    finally:
        for d in (base, sink, ckpt):
            shutil.rmtree(d, ignore_errors=True)


@q("stream_complete_mode_emit", f"""
WITH e AS (
  SELECT epoch_us(ts) AS us,
         greatest(least(CAST(floor(date_diff('day', DATE '2024-01-01',
                                             ts) / 7)
                    AS BIGINT), 3), 0) AS wk,
         event_id
  FROM events
), b AS (
  SELECT us,
         CASE WHEN event_id % 13 = 0 THEN least(wk + 2, 3) ELSE wk END
           AS batch
  FROM e
), per AS (
  SELECT (us // {_WM_DAY_US}) * {_WM_DAY_US} AS win_us, batch,
         count(*) AS cnt
  FROM b GROUP BY 1, 2
), trig AS (
  SELECT batch,
         CAST(dense_rank() OVER (ORDER BY batch) - 1 AS BIGINT) AS trig
  FROM (SELECT DISTINCT batch FROM b)
)
SELECT t.trig AS trig,
       CAST(p.win_us // 1000000 AS BIGINT) AS win_start,
       CAST(sum(p.cnt) AS BIGINT) AS n
FROM trig t JOIN per p ON p.batch <= t.batch
GROUP BY 1, 2
""")
def stream_complete_mode_emit(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    """COMPLETE output mode emission semantics — the third and last
    deterministic output mode, completing the append (pentalogy + outer
    joins) / update (stream_update_mode_emissions) battery. Every
    trigger re-emits the ENTIRE result table: all windows seen so far,
    at their current cumulative counts — including windows the trigger
    did not touch (the distinctive vs UPDATE mode, which emits only
    changed windows) — and nothing is ever finalized or evicted, so
    there is NO watermark in the pipeline (Spark cannot drop complete-
    mode state; a watermark would be a no-op and its absence is itself
    the semantics under test). The drain is the append/update
    batteries' maxFilesPerTrigger=1 mtime-ordered discipline over up
    to 4 batch files — EMPTY batches are not written, because an empty
    trigger in complete mode re-emits the whole table, a snapshot an
    oracle enumerating batches from the data cannot see (non-empty at
    every tested SF, but the contract must not depend on that);
    per-trigger snapshots are captured with foreachBatch
    (in complete mode the batch DataFrame IS the full current table —
    a memory sink would overwrite per trigger and show only the last).
    The DuckDB oracle replays it exactly: for trigger t, every window
    whose first contributing batch ≤ t appears with the cumulative
    survivor count through batch t; dense_rank aligns batch numbers to
    trigger indices. Late-jittered rows (event_id % 13) land in a
    LATER batch than their window's week, proving old windows keep
    updating; untouched windows re-emit with unchanged counts. Scale:
    complete mode is for bounded dashboards — the re-emitted table is
    the AGGREGATE (≤ |windows| rows), never the data; the per-trigger
    collect here is that bounded table. The scale CONTRACT: complete
    mode cannot evict (no watermark BY SEMANTICS), so it is only safe
    on a BOUNDED key domain — on an unbounded domain at 100 TB the
    state store grows without limit and OOMs; use update mode there."""
    import os as _os
    import shutil
    import uuid as _uuid

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from drill_calcite_spark.queries.sources import _fixture_dir

    ev = t(spark, sf_dir, "events")
    # Clamp the week bucket on BOTH ends (the oracle mirrors this): a
    # pre-epoch timestamp would otherwise land in a negative batch no
    # file carries while still being counted by the oracle.
    week = F.greatest(F.least(
        F.floor(F.datediff(F.col("ts"), F.lit("2024-01-01")) / 7),
        F.lit(3)), F.lit(0))
    batch = (F.when(F.col("event_id") % 13 == 0,
                    F.least(week + 2, F.lit(3)))
             .otherwise(week)).cast("int")
    pdf = (ev.select("event_id", "ts", batch.alias("batch")).toPandas())

    base = _os.path.join(_fixture_dir(sf_dir),
                         f"complete_batches_{_uuid.uuid4().hex[:12]}")
    _os.makedirs(base)
    try:
        for bno in range(4):
            part = pdf[pdf.batch == bno].drop(columns=["batch"])
            if part.empty:
                # an EMPTY file would still fire a trigger, and in
                # COMPLETE mode that trigger re-emits the whole table —
                # a snapshot the oracle (which enumerates batches from
                # the DATA) cannot see. Skipping the file keeps Spark's
                # trigger indices == dense_rank of non-empty batches,
                # exactly the oracle's numbering. (append/update
                # siblings are immune: their empty triggers emit
                # nothing.)
                continue
            path = f"{base}/batch_{bno:03d}.parquet"
            _pq.write_table(
                _pa.Table.from_pandas(part, preserve_index=False), path,
                coerce_timestamps="us", allow_truncated_timestamps=True)
            _os.utime(path, (1_700_000_000 + bno * 1000,) * 2)

        schema = spark.read.parquet(base).schema
        agg = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(base)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .groupBy(tumble("ts", "1 day").alias("w"))
            .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
            .select(F.unix_timestamp(F.col("w.start")).cast("bigint")
                    .alias("win_start"), "n"))

        snaps: list[tuple[int, list]] = []

        def sink(bdf: DataFrame, bid: int) -> None:
            snaps.append((bid, bdf.collect()))

        sq = (agg.writeStream.foreachBatch(sink)
              .outputMode("complete")
              .trigger(availableNow=True).start())
        try:
            if not sq.awaitTermination(300):
                raise TimeoutError("complete-mode drain exceeded 300s")
        finally:
            if sq.isActive:
                sq.stop()

        rows = [(int(bid), int(r.win_start), int(r.n))
                for bid, batch_rows in snaps for r in batch_rows]
        return spark.createDataFrame(
            rows, "trig bigint, win_start bigint, n bigint")
    finally:
        shutil.rmtree(base, ignore_errors=True)


@q("stream_right_outer_join_emit", f"""
WITH e AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
         least(CAST(floor(date_diff('day', DATE '2024-01-01', ts) / 7)
                    AS BIGINT), 3) AS wk
  FROM events WHERE event_type IN ('view', 'click')
), b AS (
  SELECT event_id, user_id, event_type, us,
         CASE WHEN (event_type = 'click' AND event_id % 13 = 0)
                OR (event_type = 'view' AND event_id % 17 = 0)
              THEN least(wk + 2, 3) ELSE wk END AS batch
  FROM e
),
mxv AS (SELECT batch, max(us) AS m FROM b
        WHERE event_type = 'view' GROUP BY 1),
mxc AS (SELECT batch, max(us) AS m FROM b
        WHERE event_type = 'click' GROUP BY 1),
w AS (
  -- W_j under multipleWatermarkPolicy=min (the rule the LEFT battery
  -- calibrated): MIN of the two sides' own maxima minus delay
  SELECT b2.batch,
         CASE WHEN v.m IS NULL OR c.m IS NULL THEN {_NEG_US}
              ELSE (least(v.m, c.m) // 1000
                    - {_SSJ_DELAY_US // 1000}) * 1000 END AS wm
  FROM (SELECT DISTINCT batch FROM b UNION SELECT 4) b2
  LEFT JOIN LATERAL (SELECT max(m) AS m FROM mxv
                     WHERE mxv.batch <= b2.batch - 1) v ON true
  LEFT JOIN LATERAL (SELECT max(m) AS m FROM mxc
                     WHERE mxc.batch <= b2.batch - 1) c ON true
),
f AS (
  SELECT w3.batch,
         coalesce((SELECT wm FROM w w2 WHERE w2.batch = w3.batch - 1),
                  {_NEG_US}) AS fwm
  FROM (SELECT DISTINCT batch FROM b) w3),
av AS (SELECT event_id AS a_id, user_id AS a_user, us AS a_us,
              batch AS a_b FROM b
       WHERE event_type = 'view'
         AND us >= (SELECT fwm FROM f WHERE f.batch = b.batch)),
cl AS (SELECT event_id AS b_id, user_id AS b_user, us AS b_us,
              batch AS b_b FROM b
       WHERE event_type = 'click'
         AND us >= (SELECT fwm FROM f WHERE f.batch = b.batch)),
p AS (
  SELECT a_id, b_id FROM av JOIN cl ON a_user = b_user
   AND b_us >= a_us AND b_us <= a_us + {_SSJ_IV_US}
  WHERE (a_b >= b_b
         OR a_us + {_SSJ_IV_US} > (SELECT wm FROM w WHERE batch = b_b - 1))
    AND (b_b >= a_b
         OR b_us > (SELECT wm FROM w WHERE batch = a_b - 1))
)
SELECT a_id, b_id FROM p
UNION ALL
-- click-side pads ONLY (the RIGHT OUTER rule, mirrored from the FULL
-- battery's click branch): an admitted click that never joined pads
-- once b_us <= W_final; unmatched views are DROPPED silently
SELECT CAST(NULL AS BIGINT) AS a_id, b_id FROM cl
WHERE b_id NOT IN (SELECT b_id FROM p)
  AND b_us <= (SELECT wm FROM w WHERE batch = 4)
""")
def stream_right_outer_join_emit(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    """STREAM-STREAM RIGHT OUTER interval join — closes the stream-
    stream join-type family (inner r10 / LEFT r11 / FULL r11 / RIGHT
    r12): ONLY the click side NULL-pads, on ITS OWN horizon
    (``b_us ≤ W_final`` — the join condition bounds its matching views
    by ``a_ts ≤ b_ts``, so once the click's own event time clears the
    watermark no future view can match), while unmatched views —
    which the LEFT battery proves would pad at ``a_us + 2h ≤ W`` —
    are silently dropped. A replay padding views too (the FULL rule)
    or padding clicks on the view horizon hashes red; matched pairs
    must stay bit-identical to the INNER battery's set.

    Same four mtime-ordered batch files, two-batch stragglers on both
    sides, 1-day watermark, min-policy global watermark; the DuckDB
    oracle replays admission, pair buffer horizons, and the click-only
    pad rule in integer microseconds. Non-vacuousness (pads occurred;
    views that WOULD have padded under LEFT were dropped) is pinned in
    tests/test_streaming.py."""
    import os as _os
    import shutil
    import uuid as _uuid

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from drill_calcite_spark.queries.sources import _fixture_dir

    ev = (t(spark, sf_dir, "events")
          .filter(F.col("event_type").isin("view", "click")))
    wk = F.least(F.floor(F.datediff(F.col("ts"), F.lit("2024-01-01")) / 7),
                 F.lit(3))
    late = (((F.col("event_type") == "click")
             & (F.col("event_id") % 13 == 0))
            | ((F.col("event_type") == "view")
               & (F.col("event_id") % 17 == 0)))
    batch = (F.when(late, F.least(wk + 2, F.lit(3)))
             .otherwise(wk)).cast("int")
    pdf = (ev.select("event_id", "ts", "user_id", "event_type",
                     batch.alias("batch")).toPandas())

    base = _os.path.join(_fixture_dir(sf_dir),
                         f"srj_batches_{_uuid.uuid4().hex[:12]}")
    _os.makedirs(base)
    try:
        for bno in range(4):
            part = (pdf[pdf.batch == bno].drop(columns=["batch"])
                    .sort_values("event_id"))
            path = f"{base}/batch_{bno:03d}.parquet"
            _pq.write_table(
                _pa.Table.from_pandas(part, preserve_index=False), path,
                coerce_timestamps="us", allow_truncated_timestamps=True)
            _os.utime(path, (1_700_000_000 + bno * 1000,) * 2)

        schema = spark.read.parquet(base).schema

        def side(tp: str, pre: str) -> DataFrame:
            return (spark.readStream.schema(schema)
                    .option("maxFilesPerTrigger", 1).parquet(base)
                    .filter(F.col("event_type") == tp)
                    .select(F.col("event_id").alias(f"{pre}_id"),
                            F.col("user_id").alias(f"{pre}_user"),
                            F.col("ts").cast("timestamp")
                            .alias(f"{pre}_ts"))
                    .withWatermark(f"{pre}_ts", "1 day"))

        joined = side("view", "a").join(
            side("click", "b"),
            (F.col("a_user") == F.col("b_user"))
            & (F.col("b_ts") >= F.col("a_ts"))
            & (F.col("b_ts") <= F.col("a_ts")
               + F.expr("INTERVAL 2 HOURS")),
            "right_outer")
        out = run_available_now(joined.select("a_id", "b_id"), spark,
                                output_mode="append")
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)


@q("stream_semi_join_emit", f"""
WITH e AS (
  SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
         least(CAST(floor(date_diff('day', DATE '2024-01-01', ts) / 7)
                    AS BIGINT), 3) AS wk
  FROM events WHERE event_type IN ('view', 'click')
), b AS (
  SELECT event_id, user_id, event_type, us,
         CASE WHEN (event_type = 'click' AND event_id % 13 = 0)
                OR (event_type = 'view' AND event_id % 17 = 0)
              THEN least(wk + 2, 3) ELSE wk END AS batch
  FROM e
),
mxv AS (SELECT batch, max(us) AS m FROM b
        WHERE event_type = 'view' GROUP BY 1),
mxc AS (SELECT batch, max(us) AS m FROM b
        WHERE event_type = 'click' GROUP BY 1),
w AS (
  SELECT b2.batch,
         CASE WHEN v.m IS NULL OR c.m IS NULL THEN {_NEG_US}
              ELSE (least(v.m, c.m) // 1000
                    - {_SSJ_DELAY_US // 1000}) * 1000 END AS wm
  FROM (SELECT DISTINCT batch FROM b UNION SELECT 4) b2
  LEFT JOIN LATERAL (SELECT max(m) AS m FROM mxv
                     WHERE mxv.batch <= b2.batch - 1) v ON true
  LEFT JOIN LATERAL (SELECT max(m) AS m FROM mxc
                     WHERE mxc.batch <= b2.batch - 1) c ON true
),
f AS (
  SELECT w3.batch,
         coalesce((SELECT wm FROM w w2 WHERE w2.batch = w3.batch - 1),
                  {_NEG_US}) AS fwm
  FROM (SELECT DISTINCT batch FROM b) w3),
av AS (SELECT event_id AS a_id, user_id AS a_user, us AS a_us,
              batch AS a_b FROM b
       WHERE event_type = 'view'
         AND us >= (SELECT fwm FROM f WHERE f.batch = b.batch)),
cl AS (SELECT event_id AS b_id, user_id AS b_user, us AS b_us,
              batch AS b_b FROM b
       WHERE event_type = 'click'
         AND us >= (SELECT fwm FROM f WHERE f.batch = b.batch)),
p AS (
  SELECT a_id, b_id FROM av JOIN cl ON a_user = b_user
   AND b_us >= a_us AND b_us <= a_us + {_SSJ_IV_US}
  WHERE (a_b >= b_b
         OR a_us + {_SSJ_IV_US} > (SELECT wm FROM w WHERE batch = b_b - 1))
    AND (b_b >= a_b
         OR b_us > (SELECT wm FROM w WHERE batch = a_b - 1))
)
SELECT DISTINCT a_id FROM p
""")
def stream_semi_join_emit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM LEFT SEMI interval join — the existence-only
    member of the stream join family (inner r10 / left r11 / full r11
    / right r12 / semi r12, the complete set Structured Streaming
    supports — stream-stream LEFT ANTI is not a Spark join type): each
    admitted view emits EXACTLY ONCE if any admitted click lands in
    its 2-hour window under the pair buffer horizons, and never
    otherwise — no duplication for multi-click views (the INNER
    battery emits one row per pair; the DISTINCT projection of its
    oracle pair set IS the semi oracle), no NULL pads, and unmatched
    views evaporate silently when the watermark closes them. Same
    four mtime-ordered batch files, stragglers, 1-day watermark, and
    min-policy global watermark as the siblings. Non-vacuousness
    (multi-click views exist, so DISTINCT is doing real work) is
    pinned in tests/test_streaming.py."""
    import os as _os
    import shutil
    import uuid as _uuid

    import pyarrow as _pa
    import pyarrow.parquet as _pq

    from drill_calcite_spark.queries.sources import _fixture_dir

    ev = (t(spark, sf_dir, "events")
          .filter(F.col("event_type").isin("view", "click")))
    wk = F.least(F.floor(F.datediff(F.col("ts"), F.lit("2024-01-01")) / 7),
                 F.lit(3))
    late = (((F.col("event_type") == "click")
             & (F.col("event_id") % 13 == 0))
            | ((F.col("event_type") == "view")
               & (F.col("event_id") % 17 == 0)))
    batch = (F.when(late, F.least(wk + 2, F.lit(3)))
             .otherwise(wk)).cast("int")
    pdf = (ev.select("event_id", "ts", "user_id", "event_type",
                     batch.alias("batch")).toPandas())

    base = _os.path.join(_fixture_dir(sf_dir),
                         f"ssemi_batches_{_uuid.uuid4().hex[:12]}")
    _os.makedirs(base)
    try:
        for bno in range(4):
            part = (pdf[pdf.batch == bno].drop(columns=["batch"])
                    .sort_values("event_id"))
            path = f"{base}/batch_{bno:03d}.parquet"
            _pq.write_table(
                _pa.Table.from_pandas(part, preserve_index=False), path,
                coerce_timestamps="us", allow_truncated_timestamps=True)
            _os.utime(path, (1_700_000_000 + bno * 1000,) * 2)

        schema = spark.read.parquet(base).schema

        def side(tp: str, pre: str) -> DataFrame:
            return (spark.readStream.schema(schema)
                    .option("maxFilesPerTrigger", 1).parquet(base)
                    .filter(F.col("event_type") == tp)
                    .select(F.col("event_id").alias(f"{pre}_id"),
                            F.col("user_id").alias(f"{pre}_user"),
                            F.col("ts").cast("timestamp")
                            .alias(f"{pre}_ts"))
                    .withWatermark(f"{pre}_ts", "1 day"))

        joined = side("view", "a").join(
            side("click", "b"),
            (F.col("a_user") == F.col("b_user"))
            & (F.col("b_ts") >= F.col("a_ts"))
            & (F.col("b_ts") <= F.col("a_ts")
               + F.expr("INTERVAL 2 HOURS")),
            "left_semi")
        out = run_available_now(joined.select("a_id"), spark,
                                output_mode="append")
        rows = out.collect()
        return spark.createDataFrame(rows, out.schema)
    finally:
        shutil.rmtree(base, ignore_errors=True)
