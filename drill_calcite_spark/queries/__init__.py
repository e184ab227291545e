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
# the start of r15: all nine r14-queued names are promoted into the
# slate below.
_NEXT_ROUND_HEAD: list[str] = []

_DRIVER_PRIORITY = [
    # ROUND-15 ROTATION, in order (slate math: 9 queued never-green +
    # 13 deferred r7-vintage + the r14-REWRITTEN paths the r15 verdict
    # orders driver-re-proved (17 names, one of which —
    # recursive_nation_tree — is already in the r7 cohort) + the two
    # r15-touched queries (q9 localCheckpoint slice, source_jdbc_scan
    # Derby fixture) = 40 slots; the 10 remaining go to the r8-vintage
    # cohort in .claude/evidence_vintage.py's mechanical order).
    #
    # (a) the nine r14-queued names — oracle-backed with ZERO driver
    # evidence (r14 overflow), promoted exactly as queued:
    "mv_sql_rollup_substitution",
    "mv_sql_groupingsets_substitution",
    "mv_sql_subset_substitution",
    "mv_sql_or_daterange_substitution",
    "stream_enrich_dedup_window",
    "bench_mv_substitution",
    "mv_sql_stddev_substitution",
    "stream_session_dynamic_gap",
    "stream_session_live",
    # (b) the 13 r7-vintage names deferred from the r14 slate — the
    # oldest committed evidence in the registry, ordered to lead this
    # slate by the r14 rotation note:
    "q2_min_cost_supplier", "q7_volume_shipping", "q8_market_share",
    "recursive_nation_tree", "sample_stratified_quota", "scrub_pii",
    "setop_except", "snapshot_orders_scd", "source_dynamic_star",
    "source_kafka_convert", "stream_stateful_counter",
    "subquery_not_in_null", "subquery_scalar_correlated",
    # (c) every query whose code path was rewritten in r14 (VERDICT r14
    # item 2: "rotate every r14-rewritten query into the driver's
    # 50-slot head" — their last green driver rows predate the
    # rewrite) plus the two r15-touched queries:
    "q18_large_volume_customer",     # r14: single-pass HAVING reuse
    "ds_iceberg_cross_channel",      # r14: persist→localCheckpoint
    "ds_frequent_best_sales",        # r14: persist→localCheckpoint
    "ds_return_ratio_vs_state",      # r14: persist→localCheckpoint
    "ds_paid_above_global_avg",      # r14: persist→localCheckpoint
    "dedup_minhash_lsh",             # r14 bucket-agg + r15 verify/split
    "dedup_clusters",                # same pipeline + graph checkpoint
    "dedup_ngram_jaccard",           # r14 bucket-agg + r15 verify/split
    "dedup_ngram_capped",            # same (df_max counts-first drop)
    "dedup_edit_verify",             # r14 pair expansion consumer
    "dedup_embedding_lsh",           # r14 bucket-agg + r15 split
    "ann_lsh_topk",                  # r14 bucket-agg + r15 split
    "ann_int8_topk",                 # r14 bucket-agg + r15 split
    "bench_minhash_dedup",           # the tracked dedup perf row
    "pagerank_nations",              # r14: checkpoint_every 4→1
    "recursive_numbers",             # r14: repeat_union checkpoint fix
    "q9_product_type_profit",        # r15: localCheckpoint'ed slice
    "source_jdbc_scan",              # r15: per-run Derby temp dir
    # (e) the two r15-rewritten geo paths (binder-level curve folds /
    # shared relation bits, commit 51af4f3) — rotated in mid-r15 under
    # the same rule as (c): their last green driver rows predate the
    # rewrite, and this is the final round, so CORRECTNESS_r15 is the
    # only driver-level chance to re-prove them:
    "func_geo_buffer_poly",
    "func_geo_poly_poly",
    # (d) the first 8 of the r8-vintage cohort in
    # .claude/evidence_vintage.py's mechanical (alphabetical) order
    # (r8 names already listed above are skipped;
    # ds_cumulative_channel_cross and ds_group_count_band were
    # displaced by (e) — both hold green CORRECTNESS_r08 rows and stay
    # covered by the exact oracle-parity pytest lane):
    "bloom_prune_join", "chunk_sliding_windows", "dedup_passage",
    "ds_band_counts", "ds_chained_star_join", "ds_channel_report",
    "ds_cross_channel_band", "ds_cross_channel_items",
]

# The full ROUND-14 slate (all 50 green in CORRECTNESS_r14.json) is
# kept below for the displacement audit trail; it is no longer
# registered. (The r13 record it replaces lives in git history.)
_R14_SLATE_FOR_THE_RECORD = [
    "mv_sql_substitution", "mv_sql_join_substitution",
    "mv_sql_having_substitution", "mv_sql_topn_substitution",
    "mv_sql_daterange_substitution", "sql_date_range_rewrite",
    "sketch_cms_grouped_merge", "stream_chained_dedup_agg",
    "stream_chained_window_rollup", "stream_static_left_enrich",
    "stream_chained_join_agg",
    "case_conditional", "func_geo_buffer", "func_geo_measures",
    "func_geo_poly", "func_geo_st", "func_like_family",
    "func_math_extended", "func_multiset_predicates", "func_similar_to",
    "func_strings_basic", "func_strings_misc", "func_strings_phonetic",
    "func_tz_convert",
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
