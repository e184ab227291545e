"""Streaming surface tests: window-function semantics goldens, the
monotonic-group-key guard, and a real readStream→sink drain at sf0.001."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from drill_calcite_spark.streaming import (
    NonMonotonicStreamError,
    hop,
    require_monotonic_groups,
    run_available_now,
    session,
    stream_table,
    tumble,
)


def test_monotonic_guard_accepts_windows(spark):
    require_monotonic_groups([tumble("ts", "1 hour")])
    require_monotonic_groups(["user_id", session("ts", "5 minutes")])


def test_monotonic_guard_rejects_plain_keys(spark):
    with pytest.raises(NonMonotonicStreamError, match="monotonic"):
        require_monotonic_groups(["user_id", F.col("event_type")])


def test_hop_assigns_two_windows(spark):
    df = spark.createDataFrame([("2024-01-01 00:10:00",)], "s string").select(
        F.col("s").cast("timestamp").alias("ts")
    )
    out = df.groupBy(hop("ts", "30 minutes", "1 hour").alias("w")).count()
    starts = sorted(r[0] for r in
                    out.select(F.col("w.start").cast("long")).collect())
    base = 1704067200  # 2024-01-01 00:00:00 UTC
    assert starts == [base - 1800, base]


def test_session_inclusive_gap_boundary(spark):
    df = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:05:00")],
        "u long, s string",
    ).select("u", F.col("s").cast("timestamp").alias("ts"))
    # gap 5m: an event at exactly +5m merges (inclusive boundary)
    out = df.groupBy("u", session("ts", "5 minutes").alias("w")).count()
    assert out.count() == 1
    df2 = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:05:00.000001")],
        "u long, s string",
    ).select("u", F.col("s").cast("timestamp").alias("ts"))
    out2 = df2.groupBy("u", session("ts", "5 minutes").alias("w")).count()
    assert out2.count() == 2  # 1µs past the gap → new session


def test_event_ts_normalized_to_timestamp(spark):
    """`events.ts` must read as plain TIMESTAMP no matter which physical
    encoding the driver regenerates (INT64 nanos, timestamp[us] NTZ, or
    UTC-adjusted micros) — withWatermark and BIGINT casts both require it.

    Round-4 regression: testdata moved to timestamp[us] isAdjustedToUTC=false
    (TIMESTAMP_NTZ) and the old bigint-only guard missed it, breaking all
    watermarked streaming queries."""
    from drill_calcite_spark.catalog import read_table

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        batch = read_table(spark, sf, "events")
        assert dict(batch.dtypes)["ts"] == "timestamp", sf
        sdf = stream_table(spark, sf, "events")
        assert dict(sdf.dtypes)["ts"] == "timestamp", sf
        # watermark assignment is the operation NTZ breaks — assert it works
        sdf.withWatermark("ts", "1 day")


def test_live_drain_equals_batch(spark):
    sf = "/root/testdata/sf0.001"
    sdf = stream_table(spark, sf, "events").withWatermark("ts", "1 day")
    agg = sdf.groupBy(tumble("ts", "1 day").alias("w")).count().select(
        F.col("w.start").cast("long").alias("d"), "count"
    )
    live = {(r.d, r["count"]) for r in
            run_available_now(agg, spark, output_mode="complete").collect()}
    from drill_calcite_spark.catalog import read_table
    batch = read_table(spark, sf, "events").groupBy(
        tumble("ts", "1 day").alias("w")
    ).count().select(F.col("w.start").cast("long").alias("d"), "count")
    assert live == {(r.d, r["count"]) for r in batch.collect()}
    assert live  # non-vacuous


def test_kafka_shaped_live_stream_roundtrip(spark, tmp_path):
    """The Kafka adapter plumbing (sources/kafka.py) end-to-end on a REAL
    readStream: encode rows into the consumer-record schema, stream them
    from disk, decode through the default converter (KafkaRowConverterImpl
    parity), and check the drained result against the batch answer —
    bytes, offsets, and epoch-ms timestamps all surviving the trip."""
    from drill_calcite_spark.sources.kafka import (
        default_row_converter,
        kafka_shaped_records,
        kafka_shaped_stream,
    )

    src = spark.createDataFrame(
        [(i, f"u{i % 3}", f"payload-{i}", "2024-01-01 00:00:%02d" % i)
         for i in range(20)],
        "id long, user string, body string, ts_s string",
    ).select("id", "user", "body", F.col("ts_s").cast("timestamp").alias("ts"))
    records = kafka_shaped_records(
        src, topic="t", key=F.col("user"), value=F.col("body"),
        partition=F.pmod(F.col("id"), F.lit(4)), offset=F.col("id"),
        timestamp=F.col("ts"))
    path = str(tmp_path / "kafka_shaped")
    records.write.parquet(path)

    live = kafka_shaped_stream(spark, path, converter=default_row_converter)
    assert live.isStreaming
    got = run_available_now(live, spark, output_mode="append")
    rows = {r.MSG_OFFSET: r for r in got.collect()}
    assert len(rows) == 20
    assert rows[7].MSG_PARTITION == 3
    assert bytes(rows[7].MSG_KEY_BYTES).decode() == "u1"
    assert bytes(rows[7].MSG_VALUE_BYTES).decode() == "payload-7"
    # epoch millis of 2024-01-01 00:00:07 UTC
    assert rows[7].MSG_TIMESTAMP == 1704067207000


def test_kafka_connector_unavailable_error(spark):
    """No broker/connector jars in this container: kafka_stream must fail
    loudly with the documented error, not a bare classpath stack."""
    from drill_calcite_spark.sources.kafka import (
        KafkaConnectorUnavailable,
        kafka_stream,
    )

    with pytest.raises(KafkaConnectorUnavailable, match="spark-sql-kafka"):
        kafka_stream(spark, "localhost:9092", "events")


def test_late_data_drop_is_not_vacuous(spark):
    """stream_late_data_drop must actually DROP and WITHHOLD — the oracle
    parity alone would also pass on a stream that dropped nothing (if no
    row were late) or emitted everything (if the watermark never held a
    window back). Pin both effects against the batch ground truth."""
    import __spark_entry__ as entrymod
    from tests.conftest import SF_DIR

    res = {r.win_start: r.n
           for r in entrymod.queries()["stream_late_data_drop"](
               spark, SF_DIR).collect()}
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    ts = dict(ev.dtypes)["ts"]
    if ts == "bigint":
        ev = ev.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    else:
        ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
    full = {r.d: r.n for r in ev.groupBy(
        F.unix_timestamp(F.date_trunc("day", "ts")).cast("bigint")
        .alias("d")).count().withColumnRenamed("count", "n").collect()}
    # (a) emitted windows exist and at least one lost late rows
    assert res, "nothing emitted"
    dropped = [w for w, n in res.items() if n < full[w]]
    assert dropped, "no window lost a late row — drop path untested"
    # (b) the trailing windows (inside the 2-day delay) are withheld
    withheld = set(full) - set(res)
    assert withheld, "no window withheld — append finalization untested"
    assert max(withheld) == max(full), "the newest window must be withheld"
    # (c) emitted counts never exceed ground truth
    assert all(res[w] <= full[w] for w in res)


def test_dedup_expiry_suppresses_and_readmits(spark):
    """stream_dedup_expiry: at least one user must be emitted MORE than
    once (state expired, duplicate re-admitted) and no user can be
    emitted once per batch (suppression actually happened)."""
    import collections

    import __spark_entry__ as entrymod
    from tests.conftest import SF_DIR

    rows = entrymod.queries()["stream_dedup_expiry"](
        spark, SF_DIR).collect()
    per_user = collections.Counter(r.user_id for r in rows)
    assert max(per_user.values()) >= 2, "no re-admittance exercised"
    assert max(per_user.values()) < 4, "nothing was ever suppressed"


def test_join_state_expiry_emits_cross_batch_and_drops(spark):
    """stream_join_state_expiry: the emitted pair set must contain
    cross-batch matches (buffered state met a later row) and must be a
    strict subset of the unconstrained batch join (eviction dropped
    some candidate)."""
    import __spark_entry__ as entrymod
    from tests.conftest import SF_DIR
    from pyspark.sql import functions as F

    got = {(r.a_id, r.b_id) for r in entrymod.queries()[
        "stream_join_state_expiry"](spark, SF_DIR).collect()}
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    ts = dict(ev.dtypes)["ts"]
    col = (F.timestamp_micros(F.expr("ts DIV 1000")) if ts == "bigint"
           else F.col("ts").cast("timestamp"))
    ev = ev.withColumn("ts", col)
    a = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("a_id"), F.col("user_id").alias("a_user"),
        F.col("ts").alias("a_ts"))
    b = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("b_id"), F.col("user_id").alias("b_user"),
        F.col("ts").alias("b_ts"))
    full = {(r.a_id, r.b_id) for r in a.join(
        b, (F.col("a_user") == F.col("b_user"))
        & (F.col("b_ts") >= F.col("a_ts"))
        & (F.col("b_ts") <= F.col("a_ts") + F.expr("INTERVAL 2 HOURS"))
    ).collect()}
    assert got <= full, "stream emitted a pair the batch join lacks"
    assert got < full, "no candidate was ever dropped — eviction untested"
    # cross-batch evidence: a straggler id (view %17 or click %13) in a pair
    assert any(aid % 17 == 0 or bid % 13 == 0 for aid, bid in got), \
        "no straggler participated — buffered state untested"


def test_stateful_timeout_double_fire_and_preemption(spark):
    """stream_stateful_timeout: some user must fire twice (state
    re-created after a fire, then flushed terminally), and
    always-active users must never fire mid-stream with partial counts
    exceeding their totals."""
    import collections

    import __spark_entry__ as entrymod
    from tests.conftest import SF_DIR

    rows = entrymod.queries()["stream_stateful_timeout"](
        spark, SF_DIR).collect()
    assert rows, "no timeout ever fired"
    per_user = collections.Counter(r.user_id for r in rows)
    assert max(per_user.values()) >= 1
    # cohort A (user % 3 == 0) must dominate the fires — they are the
    # designed two-batch absence; cohort B (user % 3 == 1) fires only
    # via the terminal flush, which needs a naturally early last event
    coh = collections.Counter(r.user_id % 3 for r in rows)
    assert coh[0] >= coh.get(1, 0), "absence-driven fires missing"


def test_session_merge_differs_from_plain_sessionization(spark):
    """stream_session_merge: the emitted sessions must reflect watermark
    semantics — late-dropped stragglers make the result differ from the
    plain batch sessionization of ALL events, and merged straggler
    sessions make it differ from sessionizing only the on-time rows."""
    import collections

    import __spark_entry__ as entrymod
    from tests.conftest import SF_DIR
    from pyspark.sql import functions as F

    got = {(r.user_id, r.sess_start, r.sess_end, r.n)
           for r in entrymod.queries()["stream_session_merge"](
               spark, SF_DIR).collect()}
    assert got, "nothing emitted"

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    ts = dict(ev.dtypes)["ts"]
    col = (F.timestamp_micros(F.expr("ts DIV 1000")) if ts == "bigint"
           else F.col("ts").cast("timestamp"))

    def sessions(df):
        return {(r.user_id, r.s, r.e, r.n) for r in
                (df.groupBy(F.session_window("ts", "30 minutes")
                            .alias("w"), "user_id")
                 .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
                 .select("user_id",
                         F.unix_timestamp("w.start").cast("bigint")
                         .alias("s"),
                         F.unix_timestamp("w.end").cast("bigint")
                         .alias("e"), "n")).collect()}

    all_rows = sessions(ev.withColumn("ts", col))
    on_time = sessions(ev.withColumn("ts", col)
                       .filter(F.col("event_id") % 13 != 0))
    # late drops: some all-events session is NOT in the emitted set
    assert got != all_rows, "late drops invisible — filter untested"
    # cross-batch merges: surviving stragglers DID land in sessions,
    # so the on-time-only sessionization differs too
    assert got != on_time, "no straggler merged — state merge untested"
    # everything emitted is a genuine session of SOME event subset:
    # counts are positive, spans at least one gap
    assert all(n >= 1 and e - s >= 1800 for _, s, e, n in got)


def test_outer_join_pads_emit_on_eviction_and_withhold(spark):
    """stream_outer_join_emit (r11): NULL-padded rows must actually
    emit (pads > 0), must only cover views absent from the matched
    pairs, must include a view evicted across a batch boundary (a
    straggler or an early-batch view), and some unmatched views must
    be WITHHELD — still inside the final watermark horizon — so the
    pad rule is doing real work, not padding every unmatched view."""
    import __spark_entry__ as entrymod
    from tests.conftest import SF_DIR
    from pyspark.sql import functions as F

    rows = entrymod.queries()["stream_outer_join_emit"](
        spark, SF_DIR).collect()
    pads = {r.a_id for r in rows if r.b_id is None}
    matched = {r.a_id for r in rows if r.b_id is not None}
    pairs = {(r.a_id, r.b_id) for r in rows if r.b_id is not None}
    assert pads, "no NULL-padded row ever emitted — vacuous"
    assert not (pads & matched), "a matched view was also padded"

    # matched pairs must equal the inner battery's emission exactly —
    # outer mode must not perturb the buffer lifecycle
    inner = {(r.a_id, r.b_id) for r in entrymod.queries()[
        "stream_join_state_expiry"](spark, SF_DIR).collect()}
    assert pairs == inner, "outer join changed the matched-pair set"

    # withheld views: unmatched admitted views near the end of the
    # stream whose 2h horizon the final watermark never passed. The
    # total view population minus matched minus padded must be > 0.
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    ts = dict(ev.dtypes)["ts"]
    col = (F.timestamp_micros(F.expr("ts DIV 1000")) if ts == "bigint"
           else F.col("ts").cast("timestamp"))
    n_views = ev.withColumn("ts", col).filter(
        F.col("event_type") == "view").count()
    assert len(pads) + len(matched) < n_views, \
        "every view emitted — nothing withheld or late-dropped"


def test_full_outer_join_pads_both_sides(spark):
    """stream_full_outer_join_emit (r11): pads must actually emit on
    BOTH sides (the click side is the FULL addition), each side's pads
    must be disjoint from its matched ids, the matched-pair set must be
    bit-identical to the INNER battery's, and the two sides' pad
    horizons must do real work — some admitted-but-unmatched rows on
    each side stay WITHHELD (view horizon a_us+2h still open) or
    late-dropped, so neither side pads its full unmatched population."""
    import __spark_entry__ as entrymod
    from tests.conftest import SF_DIR

    rows = entrymod.queries()["stream_full_outer_join_emit"](
        spark, SF_DIR).collect()
    view_pads = {r.a_id for r in rows if r.b_id is None}
    click_pads = {r.b_id for r in rows if r.a_id is None}
    pairs = {(r.a_id, r.b_id) for r in rows
             if r.a_id is not None and r.b_id is not None}
    matched_a = {a for a, _ in pairs}
    matched_b = {b for _, b in pairs}
    assert view_pads, "no view-side pad — LEFT half vacuous"
    assert click_pads, "no click-side pad — the FULL addition vacuous"
    assert not (view_pads & matched_a), "a matched view was padded"
    assert not (click_pads & matched_b), "a matched click was padded"

    inner = {(r.a_id, r.b_id) for r in entrymod.queries()[
        "stream_join_state_expiry"](spark, SF_DIR).collect()}
    assert pairs == inner, "full outer changed the matched-pair set"

    # view pads must equal the LEFT battery's pad set exactly — adding
    # the right side must not perturb the left side's pad rule
    left = entrymod.queries()["stream_outer_join_emit"](
        spark, SF_DIR).collect()
    left_pads = {r.a_id for r in left if r.b_id is None}
    assert view_pads == left_pads, "view pads differ from LEFT battery"


def test_update_mode_reemits_growing_counts(spark):
    """stream_update_mode_emissions (r11): the update-mode signature —
    at least one window must appear in MULTIPLE trigger emissions with
    strictly increasing counts (append mode can never produce this),
    and unfinalized trailing windows must be present (update mode
    withholds nothing)."""
    import __spark_entry__ as entrymod
    from collections import defaultdict
    from tests.conftest import SF_DIR

    rows = entrymod.queries()["stream_update_mode_emissions"](
        spark, SF_DIR).collect()
    by_win = defaultdict(list)
    for r in rows:
        by_win[r.win_start].append(r.n)
    multi = {w: sorted(ns) for w, ns in by_win.items() if len(ns) > 1}
    assert multi, "no window re-emitted — update semantics vacuous"
    for w, ns in multi.items():
        assert len(set(ns)) == len(ns), f"window {w} re-emitted same count"
    # append-mode result (finalized windows only) must be a strict
    # subset of the windows seen here — update withholds nothing
    append_rows = entrymod.queries()["stream_late_data_drop"](
        spark, SF_DIR).collect()
    append_wins = {r.win_start for r in append_rows}
    assert append_wins < set(by_win), \
        "update mode emitted no extra (unfinalized) windows"


def test_static_enrich_consistent_with_unenriched(spark):
    """stream_static_enrich_agg (r11): the enriched per-(window,
    segment) counts must partition the un-enriched battery's counts
    exactly — summing segments per window reproduces every finalized
    window of stream_late_data_drop (the static join must neither drop
    nor duplicate surviving rows), and more than one segment must
    actually appear (the enrichment is doing real work)."""
    import collections

    import __spark_entry__ as entrymod
    from tests.conftest import SF_DIR

    enriched = entrymod.queries()["stream_static_enrich_agg"](
        spark, SF_DIR).collect()
    plain = {r.win_start: r.n
             for r in entrymod.queries()["stream_late_data_drop"](
                 spark, SF_DIR).collect()}
    segs = {r.c_mktsegment for r in enriched}
    assert len(segs) > 1, "single segment — enrichment vacuous"
    per_win = collections.defaultdict(int)
    for r in enriched:
        per_win[r.win_start] += r.n
    assert per_win == plain, \
        "segment partition does not reproduce the un-enriched counts"


def test_complete_mode_reemission_not_vacuous(spark):
    """stream_complete_mode_emit (r12): the COMPLETE-mode drain must
    actually exhibit both re-emission classes the mode is defined by —
    (a) some window re-emitted in a later trigger with an UNCHANGED
    count (untouched state still re-emitted; UPDATE mode would omit
    it), and (b) some window whose count strictly INCREASES across
    triggers (the late-jittered rows updating an old window, never
    dropped because complete mode has no watermark). Also pins that
    every trigger's snapshot contains every previously-seen window
    (monotone table growth) and that there were ≥ 3 triggers."""
    import collections

    import __spark_entry__ as entrymod
    from tests.conftest import SF_DIR

    rows = entrymod.queries()["stream_complete_mode_emit"](
        spark, SF_DIR).collect()
    by_trig = collections.defaultdict(dict)
    for r in rows:
        by_trig[r.trig][r.win_start] = r.n
    trigs = sorted(by_trig)
    assert len(trigs) >= 3, f"expected >=3 triggers, got {trigs}"
    unchanged = increased = False
    for a, b in zip(trigs, trigs[1:]):
        prev, cur = by_trig[a], by_trig[b]
        assert set(prev) <= set(cur), \
            "a previously-seen window vanished from a later snapshot"
        for w, n in prev.items():
            assert cur[w] >= n, "a window's cumulative count decreased"
            if cur[w] == n:
                unchanged = True
            else:
                increased = True
    assert unchanged, "no untouched window was re-emitted (vacuous)"
    assert increased, "no window was updated across triggers (vacuous)"


def test_right_outer_join_pads_clicks_only(spark):
    """stream_right_outer_join_emit (r12): the RIGHT battery must pad
    at least one unmatched click (a_id NULL), must NEVER pad a view
    (b_id NULL rows are LEFT's signature), must share its matched-pair
    set bit-for-bit with the LEFT battery, and must DROP every view
    the LEFT battery pads — the directional asymmetry that makes RIGHT
    a distinct join type rather than a column swap."""
    import __spark_entry__ as entrymod
    from tests.conftest import SF_DIR

    right = entrymod.queries()["stream_right_outer_join_emit"](
        spark, SF_DIR).collect()
    left = entrymod.queries()["stream_outer_join_emit"](
        spark, SF_DIR).collect()

    r_pairs = {(r.a_id, r.b_id) for r in right
               if r.a_id is not None and r.b_id is not None}
    l_pairs = {(r.a_id, r.b_id) for r in left
               if r.a_id is not None and r.b_id is not None}
    assert r_pairs == l_pairs, "matched pairs diverge between batteries"

    click_pads = [r for r in right if r.a_id is None]
    assert click_pads, "no click was padded (vacuous)"
    assert not [r for r in right if r.b_id is None], \
        "RIGHT outer padded a view"
    # the dropped-view asymmetry: every a_id in the RIGHT result is a
    # matched pair (no b_id-NULL rows above), so LEFT's padded views —
    # which must exist — appear nowhere in RIGHT
    view_pads_in_left = {r.a_id for r in left if r.b_id is None}
    assert view_pads_in_left, "LEFT battery lost its view pads"
    right_a_ids = {r.a_id for r in right if r.a_id is not None}
    assert not (view_pads_in_left & right_a_ids), \
        "a LEFT-padded (unmatched) view leaked into the RIGHT result"


def test_semi_join_distinct_existence_vs_left(spark):
    """stream_semi_join_emit (r12): the semi result must be EXACTLY the
    distinct matched-view set of the LEFT battery (no pads, no
    duplicates), and at least one view must own ≥ 2 matched pairs —
    otherwise the once-per-view emission contract (the thing that
    distinguishes semi from a projected inner join) is vacuous."""
    import collections

    import __spark_entry__ as entrymod
    from tests.conftest import SF_DIR

    semi = [r.a_id for r in entrymod.queries()["stream_semi_join_emit"](
        spark, SF_DIR).collect()]
    left = entrymod.queries()["stream_outer_join_emit"](
        spark, SF_DIR).collect()
    assert len(semi) == len(set(semi)), "semi emitted a view twice"
    matched = [r.a_id for r in left if r.b_id is not None]
    assert set(semi) == set(matched), \
        "semi set diverges from the LEFT battery's matched views"
    pair_counts = collections.Counter(matched)
    assert max(pair_counts.values()) >= 2, \
        "no multi-click view — DISTINCT semantics untested (vacuous)"


def test_chained_dedup_agg_dedups_before_aggregate(spark):
    """stream_chained_dedup_agg (r13): both stateful stages must do real
    work. (a) cross-batch SUPPRESSION reaches the aggregate: batch-1
    rows (week-1 minima, duplicates of live batch-0 state) contribute
    NOTHING — every week-1 day window present in the un-deduped
    ground-truth aggregate is ABSENT from the chained result; (b)
    EXPIRY re-admission reaches the aggregate: week-2 windows are
    emitted, but with strictly fewer total rows than the un-deduped
    aggregate (only expired-state users re-admit); (c) the aggregate
    stage still finalizes: the newest ground-truth window is withheld;
    (d) week-0 windows (all first arrivals admitted) match the
    ground truth exactly."""
    import __spark_entry__ as entrymod
    from tests.conftest import SF_DIR

    res = {r.win_start: r.n_users
           for r in entrymod.queries()["stream_chained_dedup_agg"](
               spark, SF_DIR).collect()}
    assert res, "nothing emitted"

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    ts = dict(ev.dtypes)["ts"]
    col = (F.timestamp_micros(F.expr("ts DIV 1000")) if ts == "bigint"
           else F.col("ts").cast("timestamp"))
    wk = F.least(F.floor(F.datediff(F.col("ts"), F.lit("2024-01-01")) / 7),
                 F.lit(3)).cast("int")
    fixture = (ev.withColumn("ts", col)
               .groupBy("user_id", wk.alias("batch"))
               .agg(F.min("ts").alias("ts"))
               .withColumn("d", F.unix_timestamp(
                   F.date_trunc("day", "ts")).cast("bigint")))
    per_day = {(r.batch, r.d): r.n for r in
               fixture.groupBy("batch", "d").agg(
                   F.count("*").alias("n")).collect()}
    days = {b: {d for (bb, d) in per_day if bb == b} for b in range(4)}

    # (a) batch-1 duplicates all suppressed before the aggregate
    assert days[1], "fixture has no week-1 rows"
    leaked = days[1] & set(res)
    assert not leaked, f"suppressed week-1 rows reached the agg: {leaked}"
    # (b) re-admitted rows DID reach the aggregate, but fewer than raw
    emitted_w2 = days[2] & set(res)
    assert emitted_w2, "no re-admitted window emitted"
    got_w2 = sum(res[d] for d in emitted_w2)
    raw_w2 = sum(per_day[(2, d)] for d in emitted_w2)
    assert 0 < got_w2 < raw_w2, (
        "week-2 counts must be a strict subset of the raw aggregate "
        f"(got {got_w2}, raw {raw_w2}) — expiry boundary untested")
    # (c) append finalization: the newest window is withheld
    all_days = set().union(*days.values())
    assert max(all_days) not in res, "newest window must be withheld"
    # (d) week-0 first-arrivals flow through 1:1 where emitted
    for d in days[0] & set(res):
        assert res[d] == per_day[(0, d)], f"week-0 window {d} diverged"


def test_static_left_enrich_pads_survive_to_aggregate(spark):
    """stream_static_left_enrich (r13): real NULL-padded rows must
    survive to the aggregate — the 'UNMATCHED' segment exists with
    nonzero counts and is exactly the dim-missing users' share — and
    LEFT padding must be lossless: per-window totals across segments
    equal the un-enriched stream_late_data_drop battery's counts."""
    import collections

    import __spark_entry__ as entrymod
    from tests.conftest import SF_DIR

    rows = entrymod.queries()["stream_static_left_enrich"](
        spark, SF_DIR).collect()
    assert rows, "nothing emitted"
    pads = [r for r in rows if r.segment == "UNMATCHED"]
    assert pads and all(r.n > 0 for r in pads), \
        "no NULL-padded row reached the aggregate (vacuous LEFT join)"

    totals = collections.Counter()
    for r in rows:
        totals[r.win_start] += r.n
    base = {r.win_start: r.n
            for r in entrymod.queries()["stream_late_data_drop"](
                spark, SF_DIR).collect()}
    assert dict(totals) == base, \
        "LEFT enrich dropped or duplicated stream rows vs the " \
        "un-enriched battery"


def test_chained_window_rollup_consistent_with_day_battery(spark):
    """stream_chained_window_rollup (r13): every emitted week's count
    must equal the sum of the day battery's counts over its days (the
    rollup loses nothing the day stage emitted), and finalization must
    bite at BOTH grains — at least one day window emitted by the day
    battery belongs to a week the rollup withholds (week ends lag day
    ends), and the newest week is withheld."""
    import collections

    import __spark_entry__ as entrymod
    from tests.conftest import SF_DIR

    weeks = {r.week_start: r.n
             for r in entrymod.queries()["stream_chained_window_rollup"](
                 spark, SF_DIR).collect()}
    days = {r.win_start: r.n
            for r in entrymod.queries()["stream_late_data_drop"](
                spark, SF_DIR).collect()}
    assert weeks and days, "nothing emitted"

    day_by_week = collections.Counter()
    for d, n in days.items():
        day_by_week[(d // 604800) * 604800] += n
    for w, n in weeks.items():
        assert day_by_week[w] == n, \
            f"week {w} rolled up {n} but its days sum to {day_by_week[w]}"
    orphan_weeks = set(day_by_week) - set(weeks)
    assert orphan_weeks, \
        "no emitted day belongs to a withheld week — week-grain " \
        "finalization untested"
    assert max(orphan_weeks) > max(weeks), "newest week must be withheld"


def test_chained_join_agg_matches_replay_and_buffers_cross_batch(spark):
    """stream_chained_join_agg (r13 late; its @q registry entry leads
    r14 — the r13 overflow queue is at cap): (a) the drained
    append-mode output equals the DuckDB replay EXACTLY, including the
    calibrated emission rule — windows finalize against the JOIN'S
    OUTPUT watermark (global wm − 26 h, the view side's state
    watermark under SPARK-40925 propagation), not the global
    watermark; (b) the naive global-wm rule over-emits at least one
    window, so the discriminator is non-vacuous at this SF (the 26 h
    interval exceeds the 24 h window width by construction); (c) at
    least one EMITTED window contains a cross-batch pair (the view
    shipped a week before its click), proving the join buffer feeds
    the aggregate across micro-batch boundaries."""
    import duckdb

    from tests.conftest import SF_DIR
    from drill_calcite_spark.queries.streaming import (
        STREAM_CHAINED_JOIN_AGG_ORACLE, _CJA_IV_US,
        stream_chained_join_agg)

    got = sorted((r.win_start, r.n_pairs)
                 for r in stream_chained_join_agg(spark, SF_DIR).collect())
    assert got, "nothing emitted"

    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/events.parquet')")
    want = sorted(map(tuple,
                      con.execute(STREAM_CHAINED_JOIN_AGG_ORACLE)
                      .fetchall()))
    assert got == want, (got, want)

    naive = sorted(map(tuple, con.execute(
        STREAM_CHAINED_JOIN_AGG_ORACLE.replace(
            f"- {_CJA_IV_US}", "- 0")).fetchall()))
    assert set(got) < set(naive), \
        "global-wm rule matches too — the 26h discriminator is vacuous"

    cross = con.execute(f"""
        WITH e AS (
          SELECT user_id, event_type, epoch_us(ts) AS us,
                 least(CAST(floor(date_diff('day', DATE '2024-01-01', ts)
                                  / 7) AS BIGINT), 3) AS wk
          FROM events WHERE event_type IN ('view', 'click')
        )
        SELECT DISTINCT (b.us // 86400000000) * 86400
        FROM (SELECT * FROM e WHERE event_type = 'view') a
        JOIN (SELECT * FROM e WHERE event_type = 'click') b
          ON a.user_id = b.user_id
         AND b.us >= a.us AND b.us <= a.us + {_CJA_IV_US}
        WHERE a.wk < b.wk
    """).fetchall()
    emitted = {w for w, _ in got}
    assert any(w[0] in emitted for w in cross), \
        "no emitted window carries a cross-batch pair — join " \
        "buffering across triggers untested (vacuous)"


def test_enrich_dedup_window_pads_survive_and_dedup_bites(spark):
    """stream_enrich_dedup_window (r14 — the fourth chained
    composition, enrich → dedup → TUMBLE day): (a) NULL-padded rows
    survive the dedup — the 'UNMATCHED' segment exists with nonzero
    counts (the dedup key is user_id; pad columns are not part of the
    key); (b) the enrich is lossless AND the dedup state applies to
    padded users exactly as to matched users: per-window totals across
    segments equal the un-enriched chained dedup→agg battery's counts
    window-for-window; (c) the segment split is consistent — every
    UNMATCHED user is a c_custkey % 3 = 0 user or beyond the customer
    key range (the dim restriction really produced the pads)."""
    import collections

    import __spark_entry__ as entrymod
    from tests.conftest import SF_DIR

    rows = entrymod.queries()["stream_enrich_dedup_window"](
        spark, SF_DIR).collect()
    assert rows, "nothing emitted"
    pads = [r for r in rows if r.segment == "UNMATCHED"]
    assert pads and all(r.n_users > 0 for r in pads), \
        "no NULL-padded row survived the dedup (vacuous LEFT join)"
    assert any(r.segment != "UNMATCHED" for r in rows), \
        "no matched row survived — dim join vacuous the other way"

    totals = collections.Counter()
    for r in rows:
        totals[r.win_start] += r.n_users
    base = {r.win_start: r.n_users
            for r in entrymod.queries()["stream_chained_dedup_agg"](
                spark, SF_DIR).collect()}
    assert dict(totals) == base, \
        "enrich dropped/duplicated rows or perturbed the dedup vs the " \
        "un-enriched chained battery"


def test_session_dynamic_gap_differs_from_every_fixed_gap(spark):
    """stream_session_dynamic_gap (r14): the gap expression provably
    VARIES per event — the dynamic sessionization's session count
    differs from the fixed-gap run at each of the three gap values
    (if the expression collapsed to a constant, one of them would
    match exactly), and total event coverage is conserved."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from tests.conftest import SF_DIR

    rows = entrymod.queries()["stream_session_dynamic_gap"](
        spark, SF_DIR).collect()
    n_sessions, n_events = len(rows), sum(r.n_events for r in rows)
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    assert n_events == ev.count(), "sessionization lost/duplicated events"
    for fixed in ("1 hour", "2 hours", "6 hours"):
        n_fixed = (ev.groupBy("user_id",
                              F.session_window("ts", fixed))
                   .count().count())
        assert n_fixed != n_sessions, \
            f"dynamic sessions equal the fixed {fixed} run — gap vacuous"
