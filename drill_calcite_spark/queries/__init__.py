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
# The ROUND-12 rotation is documented inline in _DRIVER_PRIORITY below:
# (a) never-green leads (the ten r11 queue names), (b) r12-new names,
# (c) r12-changed names, (d) 31 of the 43 r5-vintage names (the 12
# deferred hold committed r5 rows and must lead r13).
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
# the start of r12: all ten r11-queued names are promoted into the
# slate below. r12-new names land in the slate directly (zero-evidence
# beats re-proof); later r12 additions queue here.
_NEXT_ROUND_HEAD: list[str] = [
    "sketch_hll_grouped_merge",  # NEW r12 (late): per-group register-
    # max merge proven end to end (the HLL twin of the slated
    # sketch_qsketch_grouped_merge) — the slate was already spoken for
    # (10 queued + 4 new + 5 changed + 31 r5-vintage); 3-SF parity +
    # non-vacuousness test committed this round
    "sketch_cms_grouped",  # NEW r12 (late): per-source CMS frequency
    # sketches — completes the grouped triad (quantile/HLL/CMS); same
    # overflow reason; 3-SF parity committed this round
    "stream_right_outer_join_emit",  # NEW r12 (late): stream-stream
    # RIGHT OUTER interval join — click-side-only pads on the click's
    # own horizon, closing the join-type family (inner/left/full/
    # right); same overflow reason; 3-SF parity + directional
    # non-vacuousness test committed this round
    "stream_semi_join_emit",  # NEW r12 (late): stream-stream LEFT
    # SEMI interval join — once-per-view existence emission (the last
    # stream-stream join type Spark supports); same overflow reason;
    # 3-SF parity + distinct-vs-LEFT test committed this round
]

_DRIVER_PRIORITY = [
    # ROUND-12 ROTATION, in order (the slate math: 10 queued + 4 new +
    # 5 changed-this-round = 19 slots, leaving 31 for the 43-name
    # r5-vintage cohort; the 12 deferred names hold committed r5 green
    # rows and MUST lead the r13 re-proof order — see the (d) note).
    #
    # (a) the ten promoted _NEXT_ROUND_HEAD names — the only
    # oracle-backed queries with ZERO driver evidence (r11 overflow),
    # exactly as the r11 verdict demands:
    "dedup_edit_verify",         # r11: LSH-candidate edit verification
    "stream_static_enrich_agg",  # r11: stream-static broadcast enrich
    "sketch_qsketch_grouped",    # r11: per-group double sketches
    "pipeline_source_quality_gate",  # r11: stratified per-source gate
    "stream_update_mode_emissions",  # r11: UPDATE-mode re-emissions
    "ds_brand_nation_mismatch",      # r11: q19 own row
    "ds_warehouse_mode_lag_buckets", # r11: q99 own row
    "ds_rollup_level_rank",          # r11: q86 own row
    "ds_brand_hourband_channels",    # r11: q71 own row
    "sketch_hll_grouped",            # r11: per-group HLL sketches
    # (b) r12-NEW names — zero evidence, first rows needed:
    "ds_county_active_profile",  # NEW r12: TPC-DS q10 as its OWN
    # hash-proven row (date-bounded EXISTS trio folded to one scan;
    # closes the suite at 99/99 own rows)
    "stream_complete_mode_emit",  # NEW r12: COMPLETE output mode —
    # per-trigger full-table re-emission via foreachBatch snapshots,
    # completing the append/update/complete battery
    "ds_nation_revenue_salted",  # NEW r12: skew salting proven on a
    # real multi-join aggregate (shuffled (key, salt) regime pinned)
    "sketch_qsketch_grouped_merge",  # NEW r12: merge(build(A),
    # build(B)) == build(A|B) per group, end-to-end oracle row
    # (c) r12-CHANGED names — committed r11 green rows predate this
    # round's edits (three HUGEINT oracle-product casts, two un-hinted
    # data-dependent broadcasts + the top-K factoring):
    "ds_return_ratio_vs_state",   # r12: oracle products -> ::HUGEINT
    "ds_paid_above_global_avg",   # r12: oracle products -> ::HUGEINT
    "ds_customer_channel_growth", # r12: oracle products -> ::HUGEINT
    "ds_frequent_best_sales",     # r12: broadcast hints dropped (AQE)
    "text_boilerplate_mask",      # r12: two-stage top-K factored to
    # operators/topk.py + join-back un-hinted
    # (d) the r5-vintage cohort (oldest committed evidence; waited
    # three rounds) — 31 of 43 fit; the 12 deferred to r13 are the
    # scalar-function/pivot/unnest batteries whose semantics carry the
    # heaviest extra pinning (734-case corpus + fuzzer lanes):
    # func_greatest_null, func_json_type, func_struct_row,
    # func_time_arith, func_time_emulation, func_decimal_fidelity,
    # func_multiset_ops, sort_nulls_direction, unnest_map_entries,
    # pivot_conditional, is_distinct_from, islands_increasing_runs —
    # each holds a committed r5 green row; they MUST lead r13.
    "stream_tumble_hourly", "stream_session_6h", "stream_live_tumble",
    "stream_stream_join", "stream_hop_30m",
    "pivot_dynamic", "window_range_frame",
    "agg_approx_quantile", "agg_approx_distinct",
    "unnest_multi_zip",
    "subquery_exists_correlated", "sql_text_entry",
    "join_salted_skew",
    "func_strings_search", "func_strings_advanced", "func_math",
    "func_datetime_extract", "func_datetime_arith",
    "func_datetime_overlaps",
    "func_json", "func_array_hof", "func_array_ops", "func_bitwise",
    "dedup_exact", "text_trigram_stats", "dedup_embedding_cosine",
    "doc_fingerprint", "bench_minhash_dedup",
    "source_json_scan", "modify_update_where",
    "modify_snapshot_versions",
]

# The full ROUND-11 slate (all 50 green in CORRECTNESS_r11.json) is
# kept below for the displacement audit trail; it is no longer
# registered. (The r10 record it replaces lives in git history.)
_R11_SLATE_FOR_THE_RECORD = [
    "ds_band_reason_averages", "ds_price_band_stock", "pipeline_quality_sketch_gate",
    "dedup_keep_best", "text_boilerplate_mask", "ds_cross_sales_yoy",
    "ds_iceberg_cross_channel", "ds_frequent_best_sales", "stream_outer_join_emit",
    "sql_calcite_dialect", "sql_match_recognize", "agg_grouping_id",
    "sort_limit_offset", "sketch_qsketch_quantiles", "stream_live_dedup",
    "subquery_in", "subquery_quantified_some", "subquery_quantified_all",
    "collect_nested", "dedup_ngram_capped", "func_char_pad",
    "recursive_numbers", "source_csv_scan", "source_partition_pruning",
    "stream_sink_cow", "table_function_series", "text_lang_id",
    "window_ignore_nulls", "sketch_qsketch_double", "stream_full_outer_join_emit",
    "ds_brand_monthly_report", "ds_segment_priority_averages", "ds_monthly_deviation_filter",
    "ds_class_revenue_share", "ds_multi_supplier_noreturn", "ds_sold_returned_repurchased",
    "ds_inventory_pivot_ratio", "ds_weekday_sales_pivot", "ds_return_ratio_vs_state",
    "ds_rollup_level_averages", "ds_hour_band_user_counts", "ds_acctbal_band_geography",
    "ds_customer_best_order", "ds_net_of_returns", "ds_weekly_dow_ratio_yoy",
    "ds_paid_above_global_avg", "ds_channel_missing_attr_counts", "ds_returns_window_overlap",
    "ds_segment_priority_loss", "ds_customer_channel_growth",
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
