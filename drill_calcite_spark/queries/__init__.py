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
# entries (registration order). Rotated-out queries keep full coverage via
# tests/test_oracle_parity.py (the identical comparison over ALL
# oracle-backed entries, every pytest run); the slots below hand the
# driver whatever most needs a fresh hard-signal row.
#
# ROUND-6 ROTATION (executed): rounds 1-5 hard-checked 145 distinct names.
# These 50 slots hold, in order:
# (a) the 18 oracle-backed names with NO driver row ever — the 4 deferred
#     from the round-5 rotation (case_conditional, distinct_projection,
#     func_strings_basic, func_geo_poly) plus the 14 new round-6 queries;
#     after this round every oracle-backed name has had the driver's own
#     hard signal at least once;
# (b) 8 names whose code was touched this round (LSH de-literaling,
#     join_strategy_hints body slim-down, ranks assume_unique param,
#     pattern brace validation, geo advice fixes, profile module);
# (c) 24 names whose newest green row is round 2 — the oldest evidence in
#     the registry: headline TPC-H, core joins, aggregates, windows, set
#     ops — re-validated four rounds of refactors later.
_DRIVER_PRIORITY = [
    # (a) never driver-checked
    "case_conditional", "distinct_projection", "func_strings_basic",
    "func_geo_poly",
    "func_strings_phonetic", "func_tz_convert", "func_json_depth",
    "func_geo_poly_poly", "func_geo_measures", "func_multiset_predicates",
    "agg_fusion", "profile_fd_discovery",
    "func_math_extended", "func_strings_misc", "agg_regression",
    "subquery_single_value", "lattice_candidate_tiles", "func_geo_buffer",
    # (b) code touched in round 6
    "ann_lsh_topk", "dedup_embedding_lsh", "join_strategy_hints",
    "window_distribution_scalable", "func_similar_to", "func_like_family",
    "func_geo_st", "profile_orders",
    # (c) oldest evidence (round 2): TPC-H spine
    "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier_volume",
    "q6_forecast_revenue", "q18_large_volume_customer",
    # (c) joins
    "join_left_outer", "join_right_outer", "join_full_outer", "join_semi",
    "join_anti", "join_cross", "join_band_theta",
    # (c) aggregates
    "agg_rollup", "agg_cube", "agg_grouping_sets", "agg_distinct_filter",
    "agg_stats", "agg_collect_listagg",
    # (c) windows
    "window_rank_topk", "window_lead_lag", "window_value_funcs",
    "window_running_frames", "window_distribution",
    # (c) set ops
    "setop_union_all",
]


def _merged(attr: str) -> dict:
    from drill_calcite_spark.queries import (
        custom, funcs, llm, relops, sources, streaming, tpch, tpch2, tpch3,
    )

    out: dict = {}
    for mod in (tpch, tpch2, tpch3, relops, funcs, custom, llm, streaming, sources):
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
