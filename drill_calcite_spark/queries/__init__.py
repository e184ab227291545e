"""Query registry: every implemented operator from SURVEY.md §2 appears here
as a (spark_query, oracle_sql) pair consumed by __spark_entry__.py.

Submodules group the inventory:
- tpch      — headline relational queries (scan/filter/project/agg/join/sort spine)
- relops    — per-operator coverage (§2.1: joins, set ops, windows, grouping sets, …)
- funcs     — scalar function batteries (§2.4)
- custom    — operators Spark lacks natively (§2.1 Match, RepeatUnion; as-of + range joins)
- llm       — training-data-pipeline operators (dedup, similarity, text analysis)
- streaming — TUMBLE/HOP/SESSION + live Structured Streaming drains (§2.5)
- sources   — CSV/JSON/HTML-table schema-on-read scans + TableModify DML (§2.3)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


# The driver's per-round CORRECTNESS gate oracles the FIRST 50 registry
# entries (registration order). Rotated-out queries keep full coverage via
# tests/test_oracle_parity.py (EXACT float comparison since r8 — at least
# as strict as the driver's value hash); the slots below hand the driver
# whatever most needs a fresh hard-signal row. The rotation invariant —
# every oracle-backed name is green in some committed CORRECTNESS_r*.json
# or sits in this head — is machine-checked by
# tests/test_registry_evidence.py (added r8 after func_geo_srid slipped
# through round 7 unslated).
#
# ROUND-11 ROTATION, in order:
# (a) the NEVER-GREEN names lead — the five r10 `_NEXT_ROUND_HEAD`
#     overflow names (the only oracle-backed queries with zero driver
#     evidence, promoted exactly as the r10 verdict demands) plus the
#     four r11-new names (q64/q14/q23 shapes + the stream-stream LEFT
#     OUTER battery);
# (b) the nine r10-CHANGED names displaced from the r10 slate with
#     "rotate in r11" annotations — each holds an older committed green
#     row but its latest change had only corpus/fuzzer/plan-test cover;
# (c) the r4-vintage cohort (oldest committed evidence in the repo),
#     then as much of the r5-vintage cohort as the remaining slots fit.
#     The r5 names that don't fit keep their committed r5 green rows
#     (the invariant only requires SOME committed row) and rotate r12.
_ROWS_ONLY_FIRST_EVIDENCE = [
    # multimodal_features / multimodal_resize left this list in r10:
    # their deterministic stub dataflows gained full DuckDB oracles
    # (ASCII payloads make byte slicing / byte histograms SQL-replayable).
    # match_vshape left LATE r10: the catch-all-STRT greedy-skip chain
    # reduces to a sequential island walk, replayed by a RECURSIVE CTE
    # carrying the skip state — now fully oracle-backed.
    "sample_bernoulli", "sample_system", "exchange_repartition",
    "ann_ivf_topk", "bench_ann_topk",
]

# Names that outgrow the 50 driver slots queue here — machine-checked by
# tests/test_registry_evidence.py (a queued name counts as covered only
# because this list must become the NEXT round's slate HEAD). Empty at
# the start of r11: all five r10-queued names are promoted into the
# slate below. r11-new names displace r5-vintage tail entries instead
# (zero-evidence beats re-proof) until the tail runs out, then queue here.
_NEXT_ROUND_HEAD: list[str] = [
    "dedup_edit_verify",  # NEW r11 (late): edit-distance verification
    # of LSH candidate pairs — the slate was already full with 21
    # r11-new names; 3-SF parity + plan test committed this round
    "stream_static_enrich_agg",  # NEW r11 (late): stream-static
    # broadcast-join enrichment before a watermarked window aggregate —
    # same overflow reason; 3-SF parity committed this round
    "sketch_qsketch_grouped",  # NEW r11 (late): per-group signed-double
    # sketches, group-partitioned quantile windows — same overflow
    # reason; 3-SF parity committed this round
    "pipeline_source_quality_gate",  # NEW r11 (late): stratified
    # per-source p25 gate from grouped sketches — same overflow reason
    "stream_update_mode_emissions",  # NEW r11 (late): UPDATE output
    # mode per-trigger re-emission multiset — same overflow reason
    "ds_brand_nation_mismatch",      # NEW r11 (late): q19 own row
    "ds_warehouse_mode_lag_buckets", # NEW r11 (late): q99 own row
    "ds_rollup_level_rank",          # NEW r11 (late): q86 own row
    "ds_brand_hourband_channels",    # NEW r11 (late): q71 own row
    "sketch_hll_grouped",            # NEW r11 (late): per-group HLL
    # distinct sketches — the grouped twin of sketch_qsketch_grouped
]

_DRIVER_PRIORITY = [
    # (a) NEVER-GREEN: zero driver evidence anywhere — first rows needed.
    # The five promoted r10 overflow names:
    "ds_band_reason_averages",  # r10: q85/q48 OR-of-bands residual
    "ds_price_band_stock",      # r10: q82/q37 price-band semi-join
    "pipeline_quality_sketch_gate",  # r10: sketch-driven p25 gate
    "dedup_keep_best",  # r10: quality-aware duplicate resolution
    "text_boilerplate_mask",  # r10: per-source template masking — now
    # with the r11 two-stage bounded top-K (nd>=2 prefilter + partial
    # per-partition top-20) fixing the verdict's scale-killer
    # The four r11-new names:
    "ds_cross_sales_yoy",  # NEW r11: TPC-DS q64 shape (two-instance
    # cross-sale CTE -> built-once aggregate consumed twice)
    "ds_iceberg_cross_channel",  # NEW r11: TPC-DS q14 shape (iceberg
    # INTERSECT across three channels + ROLLUP, presence-flag rewrite)
    "ds_frequent_best_sales",  # NEW r11: TPC-DS q23 shape (frequent-item
    # multi-CTE with broadcast scalar threshold)
    "stream_outer_join_emit",  # NEW r11: stream-stream LEFT OUTER
    # interval join — NULL-padded emission exactly at watermark closure
    # (b) r10-CHANGED names displaced from the r10 slate ("rotate in
    # r11") — committed green rows exist but predate their last change:
    "sql_calcite_dialect",      # r10 grew corpus 720->734, six closures
    "sql_match_recognize",      # r10 DEFINE-compiler/AST-whitelist work
    "agg_grouping_id",          # r10 grouping()-in-HAVING rewrites
    "sort_limit_offset",        # r10 DISTINCT-orderby hardening
    "sketch_qsketch_quantiles", # r10 (num,den) exact grouping fix
    "stream_live_dedup",        # r10 dropDuplicatesWithinWatermark change
    "subquery_in",              # r10/r11 correlation guard
    "subquery_quantified_some", # r10/r11 correlation guard
    "subquery_quantified_all",  # r10/r11 correlation guard
    # (c) r4-vintage cohort — oldest committed evidence in the repo:
    "collect_nested", "dedup_ngram_capped", "func_char_pad",
    "recursive_numbers", "source_csv_scan", "source_partition_pruning",
    "stream_sink_cow", "table_function_series", "text_lang_id",
    "window_ignore_nulls",
    # (d) r5-vintage cohort, as many as fit the remaining slots (the
    # rest keep their committed r5 rows and rotate in r12):
    # (e) r11-NEW names — zero evidence, displace r5 re-proofs 1:1
    # (every displaced r5 name holds a committed r5 row; rotate r12):
    "sketch_qsketch_double",  # NEW r11: IEEE mantissa-prefix bucketing
    # over a real DOUBLE telemetry column
    "stream_full_outer_join_emit",  # NEW r11: FULL OUTER stream-stream
    # interval join — both sides' pad horizons
    "ds_brand_monthly_report",      # NEW r11: q3/q42/q52/q55 family
    "ds_segment_priority_averages", # NEW r11: q7/q26 exact averages
    "ds_monthly_deviation_filter",  # NEW r11: q53/q63/q89 deviation
    "ds_class_revenue_share",       # NEW r11: q12/q20/q98 share window
    "ds_multi_supplier_noreturn",   # NEW r11: q16/q94 EXISTS collapse
    "ds_sold_returned_repurchased", # NEW r11: q25/q29 one-scan funnel
    "ds_inventory_pivot_ratio",     # NEW r11: q21/q40 pivot ratio band
    "ds_weekday_sales_pivot",       # NEW r11: q43 weekday pivot
    "ds_return_ratio_vs_state",     # NEW r11: q30/q81 state-avg window
    "ds_rollup_level_averages",     # NEW r11: q18/q22/q27 rollup avgs
    "ds_hour_band_user_counts",     # NEW r11: q96 time-band counts
    "ds_acctbal_band_geography",    # NEW r11: q84/q8/q15 chained dims
    "ds_customer_best_order",       # NEW r11: q79 windowed argmax
    "ds_net_of_returns",            # NEW r11: q93/q80 returns netting
    "ds_weekly_dow_ratio_yoy",      # NEW r11: q2 weekday yoy ratio
    "ds_paid_above_global_avg",     # NEW r11: q24 broadcast scalar
    "ds_channel_missing_attr_counts",  # NEW r11: q76 NULL-attr audit
    "ds_returns_window_overlap",    # NEW r11: q83 three-window fold
    "ds_segment_priority_loss",     # NEW r11: q91 demographic loss
    "ds_customer_channel_growth",   # NEW r11: q74 own row (displaced
    # doc_fingerprint — committed r5 row; rotate r12)
    # r5 names still waiting (committed r5 rows; rotate r12 — the r12
    # slate MUST lead with this cohort, it has waited three rounds):
    # agg_approx_distinct, agg_approx_quantile, bench_minhash_dedup,
    # dedup_embedding_cosine, dedup_exact, doc_fingerprint,
    # func_array_hof, func_array_ops,
    # func_bitwise, func_datetime_arith, func_datetime_extract,
    # func_datetime_overlaps,
    # func_decimal_fidelity, func_greatest_null, func_json,
    # func_json_type, func_math, func_multiset_ops,
    # func_strings_advanced, func_strings_search,
    # func_struct_row, func_time_arith,
    # func_time_emulation, is_distinct_from, islands_increasing_runs,
    # join_salted_skew, modify_snapshot_versions, modify_update_where,
    # pivot_conditional, pivot_dynamic, sort_nulls_direction,
    # source_json_scan, sql_text_entry, stream_hop_30m,
    # stream_live_tumble, stream_session_6h, stream_stream_join,
    # stream_tumble_hourly, subquery_exists_correlated,
    # text_trigram_stats, unnest_map_entries, unnest_multi_zip,
    # window_range_frame
]

# The full ROUND-10 slate (all 50 green in CORRECTNESS_r10.json) is kept
# below for the displacement audit trail; it is no longer registered.
_R10_SLATE_FOR_THE_RECORD = [
    "ds_bucket_stats",  # NEW r10: TPC-DS q28 shape (six scalar-subquery
    # buckets -> ONE-scan conditional aggregation incl. shared-Expand
    # multi-distinct; exact half-up cent averages)
    "ds_best_worst_items",  # NEW r10: TPC-DS q44 shape (best/worst dual
    # rank over ONE pre-aggregate; conditional-explode rank pairing, no
    # ranked-list self-join)
    "ds_channel_except",  # NEW r10: TPC-DS q87 shape (EXCEPT chain ->
    # one-scan presence flags, the q38-INTERSECT sibling)
    "ds_returns_adjusted_yoy",  # NEW r10: TPC-DS q75 shape (channel
    # union fold + YoY self-join -> lag window over the aggregate)
    "ds_promo_ratio",  # NEW r10: TPC-DS q61/q90 shape (two-CTE ratio ->
    # one-scan conditional sums, exact integer micro-quotient)
    "ds_bucket_case_select",  # NEW r10: TPC-DS q9 shape (15 scalar
    # subqueries -> one-scan conditional aggregates + CASE ladder)
    "ds_disjunctive_semijoin",  # NEW r10: TPC-DS q45 shape (OR of
    # IN-list and IN-subquery -> distinct-reduced presence-flag join)
    "ds_item_attr_exists",  # NEW r10: TPC-DS q41 shape (correlated dim
    # count -> window decorrelation, one dim scan)
    "ds_pricey_state_customers",  # NEW r10: TPC-DS q6 shape (1.03x
    # category-average price filter -> exact integer window test)
    "embed_random_projection",  # NEW r10: JL dim reduction (map-only
    # md5-matrix fold, O(1) plan size; every float hash-pinned)
    "shuffle_epoch_order",  # NEW r10: deterministic per-epoch shuffle
    # (salted-hash position, sharded window — no global sort/RNG)
    "stream_late_data_drop",  # NEW r10: watermark late-data semantics
    # ORACLE-BACKED (multi-micro-batch drain; the oracle replays the
    # two-watermark algorithm in integer micros — drop/emit/withhold)
    "ds_manufacturer_channel_total",  # NEW r10: TPC-DS q33/q56/q60
    # shape (three channel CTEs + re-group -> one scan, one aggregation)
    "ds_ship_lag_buckets",  # NEW r10: TPC-DS q62/q50 shape (delay-band
    # pivot via map-side conditional counts; exact datediff parity)
    "text_bpe_encode",  # NEW r10: BPE tokenizer APPLICATION (merge
    # chain as literal replaces, in-row fold — zero-shuffle map-only)
    "stream_dedup_expiry",  # NEW r10: dropDuplicatesWithinWatermark
    # state EXPIRY + re-admittance oracle-backed across micro-batches
    "stream_join_state_expiry",  # NEW r10: stream-stream join buffer
    # lifecycle oracle-backed (per-side eviction horizons + late filter)
    "stream_stateful_timeout",  # NEW r10: GroupState EVENT-TIME timeout
    # lifecycle oracle-backed (preemption, re-arm, terminal flush)
    "stream_session_merge",  # NEW r10: MERGING session-window state
    # oracle-backed (gap-relative late filter, straggler merges)
    "ds_cross_nation_orders",  # NEW r10: TPC-DS q46/q68 shape (order-
    # grain composite-key agg + dim-attribute mismatch residual)
    "stream_checkpoint_resume",  # NEW r10: stop/resume across one
    # checkpoint ORACLE-BACKED (restored watermark+state; the resume
    # tightens the file-2 late filter by one slot — encoded exactly)
    "modify_version_diff",  # NEW r10: CDC read between table versions
    # (updates surface as delete+insert pairs; multiset-exact)
    "source_schema_merge",  # NEW r10: parquet mergeSchema evolution
    # (union row type, NULL for absent columns, footer-merged)
    "modify_compact",  # NEW r10: small-file compaction as a snapshot
    # commit (content hash-pinned, file count pinned via inputFiles)
    "source_partition_overwrite",  # NEW r10: dynamic partition
    # overwrite (one-partition restatement, others untouched)
    "func_geo_setop_rings",  # NEW r10: union/diff/symdiff RINGS (signed
    # areas from the generalized Greiner-Hormann tracer vs the
    # independent fan-algebra inclusion-exclusion oracle)
    "ds_weekly_ratio_yoy",  # NEW r10: TPC-DS q59 shape (AQE
    # ReusedExchange self-join, plan-pinned)
    "ds_channel_intersect",  # NEW r10: TPC-DS q38 shape (three-way
    # INTERSECT -> one-scan presence flags, hash-proven)
    "ds_multichannel_rollup",  # NEW r10: TPC-DS q5 shape (channel
    # sales/returns CTEs -> ROLLUP -> ordered LIMIT)
    "ds_inventory_demand_window",  # NEW r10: TPC-DS q72 shape (the
    # bucketed range-join rewrite vs the literal theta-join oracle)
    "ds_monthly_deviation_neighbors",  # NEW r10: TPC-DS q47/q57 shape
    # (lag/lead rewrite vs the literal three-instance CTE self-join)
    "ds_cumulative_channel_max",  # NEW r10: TPC-DS q51 shape (one-scan
    # conditional sums vs the literal FULL OUTER + max-fill oracle)
    "ds_return_ratio_ranks",  # NEW r10: TPC-DS q49 shape (channel-as-
    # a-column one-scan rewrite vs the literal three-branch UNION ALL)
    "split_train_holdout",  # NEW r10: deterministic hash split (the
    # repartition-stable alternative to randomSplit), per-source report
    "ds_top_states_rollup_rank",  # NEW r10: TPC-DS q70 shape (top-5
    # states by dense-rank over the pre-aggregate — no second fact scan)
    "ds_quarter_growth_compare",  # NEW r10: TPC-DS q31 shape (six CTE
    # instances -> one scan + lag windows; exact decimal cross-products)
    "match_packing_capacity",  # NEW r10: running-aggregate DEFINE
    # (StatefulDef) vs an independent recursive-CTE greedy-packing oracle
    "ds_channel_presence_demographics",  # NEW r10: TPC-DS q35/q69 shape
    # (EXISTS AND (EXISTS OR EXISTS) -> one-scan presence flags)
    "ds_warehouse_monthly_pivot",  # NEW r10: TPC-DS q66 shape (two-
    # branch UNION ALL -> one-scan 12-column conditional-sum pivot)
    # stream_live_dedup displaced to source_partition_overwrite (its
    # r10 dropDuplicatesWithinWatermark change is now covered by the
    # deeper stream_dedup_expiry battery above + pytest; rotate r11)
    "ann_ivf_fixed_topk",  # NEW r10: the IVF scale path ORACLE-BACKED
    # (fixed deterministic quantizer; every float hash-pinned)
    "pairs_negative_sampling",  # NEW r10: deterministic contrastive
    # negatives (salted-hash draw + broadcast-scalar N, no RNG state)
    "ds_revenue_band_histogram",  # NEW r10: TPC-DS q54 shape (the
    # aggregate-of-aggregate segmentation histogram, exact cent bands)
    "ds_excess_discount",  # NEW r10: TPC-DS q32/q92 shape (correlated
    # avg decorrelated to a window; one shuffle, plan-pinned)
    "match_vshape",  # ORACLE-BACKED late r10 (was rows-only r4-r9):
    # recursive-CTE island walk replays the greedy-skip NFA chain
    "ds_below_average_items",  # NEW r10: TPC-DS q65 shape (two-instance
    # CTE join -> window over the pre-aggregate, one scan)
    "stream_sink_upsert",  # NEW r10: CDC-style MERGE upsert sink
    # (foreachBatch, both merge branches exercised, idempotent per key)
    "multimodal_features", "multimodal_resize",  # ORACLE-BACKED in r10
    # (were rows-only r9 — the r9 slots recorded bare no_oracle markers)
    "sketch_qsketch_signed",  # NEW r10: two-sided DDSketch layout
    "agg_grouping_having",
    # sketch_qsketch_quantiles displaced to source_schema_merge (its
    # r10 schema change is pinned by sketch_qsketch_signed's fresh row
    # + the merge/error property tests; rotate in r11)
    # sql_match_recognize displaced to modify_version_diff (committed
    # r9 green row; the r10 DEFINE-compiler changes are pinned by the
    # MR property fuzzer + corpus; rotate in r11)
    # sql_calcite_dialect displaced to stream_checkpoint_resume (it
    # holds a committed r9 green row; every r10 front-door change is
    # corpus-pinned across 734 verbatim cases; rotate in r11)
    # subquery_in displaced to ds_cross_nation_orders (committed green
    # rows; the r10 correlation guard is corpus- and fuzzer-pinned;
    # rotate in r11)
    # subquery_quantified_some displaced to stream_session_merge (it
    # holds committed green rows; the r10 correlation-guard change is
    # corpus- and fuzzer-pinned; rotate in r11)
    # subquery_quantified_all displaced to stream_stateful_timeout (it
    # holds committed green rows and _some stays as the family
    # representative; rotate in r11)
    # sort_limit_offset displaced to stream_join_state_expiry (it holds
    # a committed r9 green row and its r10 DISTINCT-orderby hardening
    # is corpus- and fuzzer-pinned; rotate in r11)
    # agg_grouping_id displaced to modify_compact (committed r9 green
    # row; the r10 grouping rewrites are corpus-pinned; rotate in r11)
    # (b) the round-4-vintage cohort (collect_nested, dedup_ngram_capped
    # and func_char_pad gave their slots to the q45/q41/q6 shapes — new
    # names need their FIRST driver row; the displaced names hold
    # committed r4 green rows — rotate in r11)
    # (recursive_numbers and source_csv_scan also displaced, to the two
    # new LLM-pipeline ops, and table_function_series to the watermark
    # battery — committed r4 green rows; rotate in r11)
    # (text_lang_id, window_ignore_nulls, stream_sink_cow and
    # source_partition_pruning also displaced, to the q33-family/q62
    # shapes, text_bpe_encode and stream_dedup_expiry — committed r4
    # green rows; rotate r11)
    # (c) oldest round-5-vintage names
    # The r5-vintage cohort (agg_approx_distinct, agg_approx_quantile,
    # bench_minhash_dedup, dedup_embedding_cosine, dedup_exact,
    # doc_fingerprint) gave its six slots to the six brand-new TPC-DS
    # shapes above (new names need their FIRST driver row; every
    # displaced name holds a committed r5 green row) — rotate in r11.
    # func_array_hof / func_array_ops /
    # func_bitwise / func_datetime_arith /
    # func_datetime_extract / func_datetime_overlaps /
    # func_decimal_fidelity /
    # func_greatest_null /
    # func_json / func_json_type / func_math / func_multiset_ops /
    # func_strings_advanced / func_strings_search / func_struct_row /
    # func_time_arith / func_time_emulation /
    # is_distinct_from / islands_increasing_runs / join_salted_skew /
    # modify_snapshot_versions / modify_update_where /
    # pivot_conditional / pivot_dynamic / sort_nulls_direction (r5 rows
    # still green) gave up their slots to the TWENTY new/upgraded r10
    # names above — rotate the displaced r5 cohort in r11.
]


def _merged(attr: str) -> dict:
    from drill_calcite_spark.queries import (
        custom, funcs, geo_sql, llm, relops, sources, streaming, tpcds,
        tpch, tpch2, tpch3,
    )

    out: dict = {}
    for mod in (tpch, tpch2, tpch3, tpcds, relops, funcs, geo_sql, custom,
                llm, streaming, sources):
        out.update(getattr(mod, attr))
    return out


def _prioritized(merged: dict) -> dict:
    missing = [n for n in _DRIVER_PRIORITY if n not in merged]
    assert not missing, f"_DRIVER_PRIORITY names not registered: {missing}"
    head = {n: merged[n] for n in _DRIVER_PRIORITY}
    head.update((n, f) for n, f in merged.items() if n not in head)
    return head


def _with_semantics(fn: QueryFn) -> QueryFn:
    """Re-assert the engine's semantic confs (ANSI off, UTC, exact
    decimals, nanosAsLong) before EVERY query body runs — the driver hands
    the registry ITS OWN SparkSession (Spark 4 defaults: ANSI on), and a
    query that never reads a table would otherwise skip the read_table
    re-assertion path. Root cause of the r8 ``func_geo_srid`` crash."""
    import functools

    from drill_calcite_spark.catalog import ensure_semantics

    @functools.wraps(fn)
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_semantics(spark)
        return fn(spark, sf_dir)

    return wrapped


def all_queries() -> dict[str, QueryFn]:
    return {n: _with_semantics(f)
            for n, f in _prioritized(_merged("QUERIES")).items()}


def all_oracles() -> dict[str, str]:
    merged = _merged("ORACLES")
    return {n: merged[n] for n in all_queries() if n in merged}
