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
# ROUND-9 ROTATION, in order:
# (a) the ONLY two oracle-backed names without a green driver row ever —
#     round 8's reds, both root-caused and fixed this round (st_srid
#     try_cast + ANSI-conf re-assertion; signed-zero display
#     normalization in both twins);
# (b) NEW r9 surface: func_geo_rings (the Greiner-Hormann intersection
#     ring clipper, operators/polyclip.py — closes the last
#     geometry-engine delegation);
# (c) first-ever driver evidence for the rows-only family (the driver
#     records a rows-only check for head entries without an oracle —
#     these eight have pytest coverage but zero driver rows);
# (d) names whose code or oracle changed in round 9: func_geo_setops
#     (area_union signed-zero normalization), the group-window oracles
#     (floor-mod bucket spelling), ds_inventory_variance (cov>2
#     threshold correction);
# (e) the full round-2-vintage cohort (oldest evidence in the repo, 15
#     names) and the oldest round-4-vintage names with the remaining
#     slots.
_ROWS_ONLY_FIRST_EVIDENCE = [
    "sample_bernoulli", "sample_system", "exchange_repartition",
    "match_vshape", "ann_ivf_topk", "multimodal_features",
    "multimodal_resize", "bench_ann_topk",
]

_DRIVER_PRIORITY = [
    # (a) round-8 reds, fixed r9 — must lead the slate
    "func_geo_srid", "func_geo_concave",
    # (b) new r9
    "func_geo_rings",
    # (c) rows-only first evidence
    *_ROWS_ONLY_FIRST_EVIDENCE,
    # (d) code/oracle touched in round 9 — sql_calcite_dialect re-proves
    # the front door after this round's rewrite additions (projected-IN
    # 3VL, OVERLAPS, COLLECT WITHIN GROUP, INITCAP, MAP unnest, 3-part
    # refs, IS UNKNOWN, DISTINCT-orderby-alias, grouping constant-fold)
    "func_geo_setops", "func_tumble_group", "func_hop_group",
    "ds_inventory_variance", "sql_calcite_dialect",
    # (b2) new mid-round-9: the mergeable quantile sketch completing the
    # CMS/HLL/quantile triad (operators/qsketch.py), and MATCH_RECOGNIZE
    # through the SQL front door (sql_match.py — reuses the islands
    # oracle, so the driver hash proves SQL text ≡ operator ≡ algebra)
    "sketch_qsketch_quantiles", "sql_match_recognize",
    # + two more TPC-DS planning shapes (NEW late r9): q36 ratio-rollup
    # rank partitioned by grouping level (exact integer-quotient
    # margin), q97 channel-overlap counts (one-scan presence-flag
    # rewrite of the FULL OUTER of two DISTINCTs, hash-proven). They
    # take recursive_numbers' and source_csv_scan's (e2) slots — both
    # r4 green, unchanged code, family representatives still slated.
    "ds_margin_rollup_rank", "ds_channel_overlap",
    # (e1) the complete round-2-vintage cohort
    "agg_having", "q13_customer_distribution", "q14_promo_effect",
    "q22_global_sales_opportunity", "q4_order_priority",
    "sample_deterministic", "setop_except_all", "setop_intersect",
    "setop_intersect_all", "setop_union_distinct", "sort_limit_offset",
    "subquery_in", "unnest_with_ordinality", "unnest_words",
    "values_inline",
    # (e2) oldest round-4-vintage names (the rest of the r4 cohort —
    # source_partition_pruning, stream_sink_cow, subquery_quantified_some,
    # table_function_series, text_lang_id, window_ignore_nulls,
    # dedup_ngram_capped, func_char_pad, collect_nested — rotate in r10)
    "agg_grouping_id", "agg_listagg_within", "agg_percentiles",
    "ann_cosine_topk", "bucketed_join_colocated", "dedup_ngram_jaccard",
    "dedup_simhash_buckets", "func_json_agg", "func_json_family",
    "func_udf_surface", "modify_insert_delete", "multimodal_frame_sample",
    "mv_filter_rewrite", "pagerank_nations", "pipeline_clean_corpus",
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
