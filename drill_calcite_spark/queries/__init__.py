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
# The ROUND-13 rotation is documented inline in _DRIVER_PRIORITY below:
# (a) never-green leads (the four r12 queue names), (b) the 12 deferred
# r5-vintage names, (c) 34 of the 47-name r6-vintage cohort (the 13
# deferred hold committed r6 rows and must lead r14).
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
# the start of r13: all four r12-queued names are promoted into the
# slate below. r13-new names queue here as they land (the r13 slate is
# fully spoken for by the vintage debt).
_NEXT_ROUND_HEAD: list[str] = [
    "stream_chained_dedup_agg",  # NEW r13: chained multi-stateful
    # append-mode query (dropDuplicatesWithinWatermark into a TUMBLE
    # day aggregate) — the r13 slate is fully spoken for by the
    # vintage debt; 3-SF parity + non-vacuousness test committed
    "stream_static_left_enrich",  # NEW r13: stream-static LEFT OUTER
    # enrich — NULL-padded no-match rows flow into the watermark
    # window aggregate, join stays stateless; same overflow reason;
    # 3-SF parity + pad-survival test committed
    "mv_sql_substitution",  # NEW r13: transparent MV substitution
    # through the SQL front door — calcite_sql consults find_tile and
    # serves a base-table aggregate from the tile (SQL never names
    # it); same overflow reason; 3-SF parity + plan pin committed
    "sql_date_range_rewrite",  # NEW r13: DateRangeRules port —
    # EXTRACT(YEAR ...)/FLOOR(ts TO unit) comparisons become sargable
    # date ranges in the front door (PushedFilters plan pin); same
    # overflow reason; 3-SF parity committed
    "stream_chained_window_rollup",  # NEW r13: chained windowed
    # aggregates (TUMBLE 1d rolled into TUMBLE 7d via window_time) in
    # one append-mode query; same overflow reason; 3-SF parity +
    # day-vs-week consistency test committed
    "mv_sql_join_substitution",  # NEW r13: join-MV unification through
    # the SQL front door — a literal equi-join aggregate (keys written
    # the reversed way round) unifies with the registered join tile by
    # canonical signature; same overflow reason; 3-SF parity + plan
    # pin committed
    "sketch_cms_grouped_merge",  # NEW r13: per-source CMS cellwise-sum
    # merge proven end to end against the single-build oracle,
    # completing the grouped-merge triad (quantile/HLL/CMS); same
    # overflow reason; 3-SF parity + document-epoch non-vacuousness
    # test committed
    "mv_sql_having_substitution",  # NEW r13 (late): HAVING through the
    # front-door substitution — the gate aggregate rides the tile
    # probe as a hidden measure and filters above the rollup; same
    # overflow reason; 3-SF parity + gate-bites-both-ways plan test
    # committed
    "mv_sql_topn_substitution",  # NEW r13 (late): ORDER BY output
    # aliases + LIMIT ride above the tile rollup (the dashboard top-N
    # shape keeps the substitution; TakeOrderedAndProject over
    # aggregate-sized rows); same overflow reason; 3-SF parity + plan
    # pin committed
    "mv_sql_daterange_substitution",  # NEW r13 (late): the two
    # front-door layers COMPOSING — the YEAR+QUARTER conjunction folds
    # to one sargable range (QUARTER added to DateRangeRules this
    # session), the substitution flattens the paren-grouped rewrite
    # output and serves the aggregate from the tile with the range
    # pushed into the TILE scan, and COUNT(DISTINCT status) rolls up
    # from tile grain (the AggregateStarTableRule count-distinct
    # serve); same overflow reason; 3-SF parity + plan pin committed
]

_DRIVER_PRIORITY = [
    # ROUND-13 ROTATION, in order (the slate math: 4 queued + 12
    # deferred r5-vintage = 16 slots, leaving 34 for the 47-name
    # r6-vintage cohort; the 13 deferred names hold committed r6 green
    # rows and MUST lead the r14 re-proof order — see the (c) note).
    #
    # (a) the four promoted _NEXT_ROUND_HEAD names — the only
    # oracle-backed queries with ZERO driver evidence (r12 overflow),
    # exactly as the r12 verdict demands:
    "sketch_cms_grouped",         # r12: per-source CMS frequency triad
    "sketch_hll_grouped_merge",   # r12: per-group register-max merge
    "stream_right_outer_join_emit",  # r12: stream-stream RIGHT OUTER
    "stream_semi_join_emit",         # r12: stream-stream LEFT SEMI
    # (b) the 12 r5-vintage names deferred from the r12 rotation (their
    # committed green rows date to r5 — the oldest evidence in the
    # registry; the r12 verdict orders them to lead this slate):
    "func_greatest_null", "func_json_type", "func_struct_row",
    "func_time_arith", "func_time_emulation", "func_decimal_fidelity",
    "func_multiset_ops", "sort_nulls_direction", "unnest_map_entries",
    "pivot_conditional", "is_distinct_from", "islands_increasing_runs",
    # (c) the r6-vintage cohort (47 names whose newest rows are 7
    # rounds old) — 34 of 47 fit; the 13 deferred to r14 are the
    # scalar-function batteries whose semantics already carry the
    # heaviest independent pinning (734-case verbatim corpus + the
    # spatial .iq byte-compare + fuzzer lanes):
    # case_conditional, func_geo_buffer, func_geo_measures,
    # func_geo_poly, func_geo_st, func_like_family,
    # func_math_extended, func_multiset_predicates, func_similar_to,
    # func_strings_basic, func_strings_misc, func_strings_phonetic,
    # func_tz_convert — each holds a committed r6 green row; they
    # MUST lead r14.
    "q1_pricing_summary", "q3_shipping_priority",
    "q5_local_supplier_volume", "q6_forecast_revenue",
    "q18_large_volume_customer",
    "join_left_outer", "join_right_outer", "join_full_outer",
    "join_semi", "join_anti", "join_cross", "join_band_theta",
    "join_strategy_hints",
    "agg_stats", "agg_regression", "agg_rollup", "agg_cube",
    "agg_grouping_sets", "agg_distinct_filter", "agg_collect_listagg",
    "window_rank_topk", "window_lead_lag", "window_value_funcs",
    "window_running_frames", "window_distribution",
    "window_distribution_scalable",
    "setop_union_all", "distinct_projection", "subquery_single_value",
    "ann_lsh_topk", "dedup_embedding_lsh",
    "lattice_candidate_tiles", "profile_orders", "profile_fd_discovery",
]

# The full ROUND-12 slate (all 50 green in CORRECTNESS_r12.json) is
# kept below for the displacement audit trail; it is no longer
# registered. (The r11 record it replaces lives in git history.)
_R12_SLATE_FOR_THE_RECORD = [
    "dedup_edit_verify", "stream_static_enrich_agg", "sketch_qsketch_grouped",
    "pipeline_source_quality_gate", "stream_update_mode_emissions",
    "ds_brand_nation_mismatch", "ds_warehouse_mode_lag_buckets",
    "ds_rollup_level_rank", "ds_brand_hourband_channels", "sketch_hll_grouped",
    "ds_county_active_profile", "stream_complete_mode_emit",
    "ds_nation_revenue_salted", "sketch_qsketch_grouped_merge",
    "ds_return_ratio_vs_state", "ds_paid_above_global_avg",
    "ds_customer_channel_growth", "ds_frequent_best_sales", "text_boilerplate_mask",
    "stream_tumble_hourly", "stream_session_6h", "stream_live_tumble",
    "stream_stream_join", "stream_hop_30m", "pivot_dynamic", "window_range_frame",
    "agg_approx_quantile", "agg_approx_distinct", "unnest_multi_zip",
    "subquery_exists_correlated", "sql_text_entry", "join_salted_skew",
    "func_strings_search", "func_strings_advanced", "func_math",
    "func_datetime_extract", "func_datetime_arith", "func_datetime_overlaps",
    "func_json", "func_array_hof", "func_array_ops", "func_bitwise",
    "dedup_exact", "text_trigram_stats", "dedup_embedding_cosine",
    "doc_fingerprint", "bench_minhash_dedup", "source_json_scan",
    "modify_update_where", "modify_snapshot_versions",
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
