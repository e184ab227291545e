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
# The ROUND-14 rotation is documented inline in _DRIVER_PRIORITY below:
# (a) the 10 r13-queued never-green names lead, (b) the newly registered
# stream_chained_join_agg, (c) the 13 deferred r6-vintage scalar
# batteries, (d) the first 26 of the 39-name r7-vintage cohort in
# .claude/evidence_vintage.py's mechanical order (the 13 that don't fit
# must lead r15).
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
# the start of r14: all ten r13-queued names are promoted into the
# slate below. r14-new names queue here as they land.
_NEXT_ROUND_HEAD: list[str] = [
    "mv_sql_rollup_substitution",  # NEW r14: GROUP BY ROLLUP served
    # from a plain tile through the front door (AggregateStarTableRule
    # shape) with grouping()/GROUPING_ID above the tile re-aggregation;
    # the r14 slate is fully spoken for by the vintage debt; 3-SF
    # parity + no-fact-scan plan pin committed
    "mv_sql_groupingsets_substitution",  # NEW r14: explicit GROUPING
    # SETS (incl. grand total) through groupingSets() over the tile,
    # composed with a hidden-measure HAVING gate; same overflow
    # reason; 3-SF parity committed
    "mv_sql_subset_substitution",  # NEW r14: FK-derivable subset
    # unification — an aliased single-table aggregate served from the
    # orders⋈customer join-MV via the registered FK
    # (RelReferentialConstraint join derivability); same overflow
    # reason; 3-SF parity + unsound-variant fall-through tests
    # committed
    "mv_sql_or_daterange_substitution",  # NEW r14: the `<>`-year
    # two-range disjunction (DateRangeRules Sarg complement) applied
    # as ONE residual on the tile — the bounded-OR atom grammar; same
    # overflow reason; 3-SF parity + Or-in-PushedFilters plan pin
    # committed
    "stream_enrich_dedup_window",  # NEW r14: the fourth chained
    # composition — stream-static LEFT enrich → dedup → TUMBLE day in
    # one append-mode query; oracle = the chained-dedup admission
    # replay LEFT-joined to the restricted dim; same overflow reason;
    # 3-SF parity + pad-survives-dedup non-vacuousness pin committed
    "bench_mv_substitution",  # NEW r14: the tracked perf row for the
    # substitution serving path (bench.py auto-includes bench_*; tile
    # builds IF NOT EXISTS so the timed body is probe + rewrite +
    # tile rollup); same overflow reason; oracle-backed (same
    # three-rule composition statement as the daterange row)
    "mv_sql_stddev_substitution",  # NEW r14: variance-family serve
    # from the (sum, sumsq, count) decomposition
    # (AggregateReduceFunctionsRule) — bit-exact oracle via identical
    # IEEE formula over exact integer sums; same overflow reason;
    # 3-SF parity + 1e-9 Welford-agreement unit pin committed
    "stream_session_dynamic_gap",  # NEW r14: SESSION with an
    # expression-valued per-event gap (SPARK-36465) — running-max
    # sessionization replay in integer µs; same overflow reason;
    # 3-SF parity + differs-from-every-fixed-gap pin committed
    "stream_session_live",  # NEW r14: REAL readStream session-window
    # merge (open-interval session state, not fixed buckets) drained
    # complete-mode equal to the batch sessionization replay; same
    # overflow reason; 3-SF parity committed
]

_DRIVER_PRIORITY = [
    # ROUND-14 ROTATION, in order (the slate math: 10 queued + 1 newly
    # registered + 13 deferred r6-vintage = 24 slots, leaving 26 for
    # the 39-name r7-vintage cohort; the 13 r7 names that don't fit —
    # q2_min_cost_supplier, q7_volume_shipping, q8_market_share,
    # recursive_nation_tree, sample_stratified_quota, scrub_pii,
    # setop_except, snapshot_orders_scd, source_dynamic_star,
    # source_kafka_convert, stream_stateful_counter,
    # subquery_not_in_null, subquery_scalar_correlated — hold
    # committed r7 green rows and MUST lead the r15 re-proof order).
    #
    # (a) the ten promoted _NEXT_ROUND_HEAD names — the only
    # oracle-backed queries with ZERO driver evidence (r13 overflow),
    # exactly as the r13 verdict demands:
    "mv_sql_substitution",           # r13: front-door MV substitution
    "mv_sql_join_substitution",      # r13: join-MV signature unify
    "mv_sql_having_substitution",    # r13: HAVING above the rollup
    "mv_sql_topn_substitution",      # r13: ORDER BY+LIMIT above tile
    "mv_sql_daterange_substitution",  # r13: range-rewrite composition
    "sql_date_range_rewrite",        # r13: DateRangeRules port
    "sketch_cms_grouped_merge",      # r13: CMS cellwise-sum merge
    "stream_chained_dedup_agg",      # r13: dedup→agg multi-stateful
    "stream_chained_window_rollup",  # r13: day→week window rollup
    "stream_static_left_enrich",     # r13: stream-static LEFT enrich
    # (b) registered THIS round as the r13 verdict orders (the @q
    # entry shipped r13 unregistered because the queue was at cap):
    "stream_chained_join_agg",       # r13 battery, r14 registration
    # (c) the 13 r6-vintage scalar batteries deferred from r13 (their
    # committed green rows date to r6 — the oldest evidence in the
    # registry; the r13 verdict orders them to lead this slate):
    "case_conditional", "func_geo_buffer", "func_geo_measures",
    "func_geo_poly", "func_geo_st", "func_like_family",
    "func_math_extended", "func_multiset_predicates", "func_similar_to",
    "func_strings_basic", "func_strings_misc", "func_strings_phonetic",
    "func_tz_convert",
    # (d) the first 26 of the 39-name r7-vintage cohort, in
    # .claude/evidence_vintage.py's mechanical (alphabetical) order:
    "agg_bitops", "agg_fusion", "agg_sum0_anyvalue",
    "asof_last_purchase", "correlate_lateral_topn",
    "decontaminate_ngrams", "ds_quantity_stats", "func_geo_clip",
    "func_geo_poly_poly", "func_geo_relations", "func_geo_types",
    "func_geo_wkt", "func_json_depth", "func_json_hostile",
    "func_period_ops", "match_vshape_all_rows", "mv_join_rewrite",
    "mv_tile_rollup", "q10_returned_items", "q12_priority_shipping",
    "q15_top_supplier", "q16_parts_supplier_relationship",
    "q17_small_quantity", "q19_discounted_revenue",
    "q20_potential_promotion", "q21_suppliers_kept_waiting",
]

# The full ROUND-13 slate (all 50 green in CORRECTNESS_r13.json) is
# kept below for the displacement audit trail; it is no longer
# registered. (The r12 record it replaces lives in git history.)
_R13_SLATE_FOR_THE_RECORD = [
    "sketch_cms_grouped", "sketch_hll_grouped_merge",
    "stream_right_outer_join_emit", "stream_semi_join_emit",
    "func_greatest_null", "func_json_type", "func_struct_row",
    "func_time_arith", "func_time_emulation", "func_decimal_fidelity",
    "func_multiset_ops", "sort_nulls_direction", "unnest_map_entries",
    "pivot_conditional", "is_distinct_from", "islands_increasing_runs",
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
