"""Query registry: every implemented operator from SURVEY.md §2 appears here
as a (spark_query, oracle_sql) pair consumed by __spark_entry__.py.

Submodules group the inventory:
- tpch      — headline relational queries (scan/filter/project/agg/join/sort spine)
- relops    — per-operator coverage (§2.1: joins, set ops, windows, grouping sets, …)
- funcs     — scalar function batteries (§2.4)
- custom    — operators Spark lacks natively (§2.1 Match, RepeatUnion; as-of join)
- llm       — training-data-pipeline operators (dedup, similarity, text analysis)
- streaming — TUMBLE/HOP/SESSION + live Structured Streaming drains (§2.5)
- sources   — CSV/JSON schema-on-read scans + TableModify DML (§2.3)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


# The driver's per-round CORRECTNESS gate oracles the FIRST 50 registry
# entries (registration order). Rounds 1-2 proved the first 50 slots green,
# so those queries rotate to the back (tests/test_oracle_parity.py keeps
# running the identical comparison over ALL of them every pytest run) and
# the 50 slots below hand the driver the queries that have never had a
# hard-signal row — round-3 features first, then one representative per
# §2 component family (LLM pipeline, streaming, sources/DML, custom
# operators, function batteries, MV/profile/correlate relops).
#
# ROUND-4 ROTATION: after CORRECTNESS_r03 lands green, rotate this list to
# the remaining never-driver-checked oracle-backed names (late round-3
# additions that missed the 50-slot cut): func_bitwise, func_struct_row,
# func_array_hof, func_like_family, func_json_type, func_time_arith,
# sort_nulls_direction, agg_approx_quantile, unnest_map_entries,
# unnest_multi_zip, window_range_frame, pivot_dynamic, join_strategy_hints,
# join_salted_skew, sql_text_entry, subquery_exists_correlated,
# text_trigram_stats, ann_lsh_topk, bench_minhash_dedup,
# modify_snapshot_versions, dedup_ngram/embedding variants and the
# rotated-out r01/r02 batteries.
_DRIVER_PRIORITY = [
    # round-3 features
    "window_ignore_nulls", "agg_grouping_id", "agg_listagg_within",
    "subquery_quantified_some", "func_similar_to", "func_json_family",
    "func_json_agg", "func_char_pad", "match_vshape_all_rows",
    "mv_filter_rewrite", "dedup_ngram_capped",
    # LLM training-data pipeline
    "pipeline_clean_corpus", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "dedup_simhash_buckets", "dedup_embedding_lsh", "ann_cosine_topk",
    "text_lang_id", "stream_sink_cow", "agg_percentiles",
    "pagerank_nations", "multimodal_meta",
    # streaming
    "stream_tumble_hourly", "stream_session_6h",
    "stream_live_tumble", "stream_live_dedup", "stream_stateful_counter",
    "stream_stream_join",
    # sources + DML + physical layout
    "source_jdbc_scan", "source_csv_scan", "source_partition_pruning",
    "source_dynamic_pruning",
    "modify_insert_delete", "subquery_not_in_null", "modify_merge_orders",
    # custom operators
    "recursive_numbers", "recursive_nation_tree", "asof_last_purchase",
    "multimodal_frame_sample", "snapshot_orders_scd",
    # relops tail + function batteries
    "mv_tile_rollup", "profile_orders", "correlate_lateral_topn",
    "collect_nested", "table_function_series", "func_udf_surface",
    "bucketed_join_colocated", "mv_join_rewrite",
    "func_geo_st", "window_distribution_scalable",
]


def _merged(attr: str) -> dict:
    from drill_calcite_spark.queries import custom, funcs, llm, relops, sources, streaming, tpch, tpch2

    out: dict = {}
    for mod in (tpch, tpch2, relops, funcs, custom, llm, streaming, sources):
        out.update(getattr(mod, attr))
    return out


def _prioritized(merged: dict) -> dict:
    missing = [n for n in _DRIVER_PRIORITY if n not in merged]
    assert not missing, f"_DRIVER_PRIORITY names not registered: {missing}"
    head = {n: merged[n] for n in _DRIVER_PRIORITY}
    head.update((n, f) for n, f in merged.items() if n not in head)
    return head


def all_queries() -> dict[str, QueryFn]:
    return _prioritized(_merged("QUERIES"))


def all_oracles() -> dict[str, str]:
    merged = _merged("ORACLES")
    return {n: merged[n] for n in all_queries() if n in merged}
