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
# ROUND-8 ROTATION, in order:
# (a) the two names with NO hard evidence ever: ds_cross_channel_band
#     (r7's one red row — display rounding fixed this round, must prove
#     green) and func_geo_srid (added late r7, never slated);
# (b) new in round 8: CEIL(ts TO unit) through the front door
#     (func_datetime_ceil) and the three TPC-DS stretch shapes the
#     reference plans — q64 chained-star self-join, q23 MAX-over-CTE,
#     q78 three-channel FULL OUTER;
# (c) every name whose code or oracle changed in round 8: the
#     decimal-display-rounding sweep (ds_* five, q9, q11), the exact
#     integer-ratio rounding in the text batteries, the ST_DWithin <=
#     boundary fix (sql_spatial_surface), the connected-components
#     convergence guard (dedup_clusters), and the front-door pi-alias +
#     CEIL rewrites (sql_calcite_dialect);
# (d) round-2-vintage names — the oldest evidence left (eight kept:
#     TPC-H q4/q13/q22, set-op reps, unnest_words, sort; seven ceded
#     their slots to the (b2) first-row names — see the (b2) note);
# (e) seventeen round-4-vintage names from the families VERDICT r7
#     flagged as aging: the r3/r4 LLM battery (minhash/jaccard/simhash
#     dedup, exact-cosine anchor, lang-id, multimodal, pagerank,
#     corpus pipeline) and the r4 sources (partition/dynamic pruning,
#     bucketed join, jdbc, csv, DML insert/delete + merge).
# Rotated out (all with r6/r7 green rows + exact-gate pytest coverage):
# the r7 TPC-H six, the geo batteries, kafka/dynamic-star, the r7 LLM
# additions, and the r4-refreshed mv/recursion/snapshot/match family.
_DRIVER_PRIORITY = [
    # (a) zero-evidence names
    "ds_cross_channel_band", "func_geo_srid",
    # (b) new in round 8 (func_geo_buffer_poly: the convex curve-buffer
    # closure of the last documented geometry gap, trig-free bit-exact
    # tessellation; func_geo_concave: concave x concave set-op AREAS via
    # the signed fan decomposition — takes ann_cosine_topk's refresh
    # slot: r3 green, unchanged code, pinned exact-baseline anchor with
    # exact-gate pytest coverage, and the similarity family keeps
    # ann_int8_topk + dedup_minhash_lsh slots)
    "func_datetime_ceil", "ds_chained_star_join", "ds_max_over_cte",
    "ds_three_channel_full", "func_geo_buffer_poly", "func_geo_concave",
    # (c) code/oracle touched in round 8
    "ds_sales_rollup_rank", "ds_channel_report", "ds_returns_above_avg",
    "ds_multi_supplier_orders", "q9_product_type_profit",
    "q11_important_stock", "text_quality_score", "text_token_stats",
    "sql_spatial_surface", "dedup_clusters", "sql_calcite_dialect",
    # (b2) new mid-round-8: three training-pipeline operators (Gopher
    # repetition metrics, passage-level cross-doc dedup, sequence
    # packing) + two more TPC-DS planning shapes (q88 one-scan
    # multi-band counts, q34/q73 group-count band). They take the five
    # slots previously refreshing setop_intersect_all/setop_except_all/
    # values_inline/sample_deterministic/subquery_in — each of those has
    # r1+r2 green rows, unchanged code, a family representative still
    # slated, and exact-gate pytest coverage; new names NEED first rows
    # (tests/test_registry_evidence.py enforces it).
    "text_repetition_stats", "dedup_passage", "pack_token_chunks",
    "ds_band_counts", "ds_group_count_band",
    # + the bucketed interval range join (operators/range_join.py) —
    # takes agg_having's slot (r1+r2 green, unchanged, family covered)
    "range_join_attribution",
    # + vocabulary induction (takes q14_promo_effect's slot — r1+r2
    # green, unchanged code, exact-gate pytest coverage)
    "text_vocab_topk",
    # + the HTML-table file source (takes source_csv_scan's slot — r4
    # green, unchanged; the sources family keeps jdbc/partition/dml
    # slots and gains this first-row name)
    "source_html_table",
    # + TPC-DS q51 cumulative-crossover shape (takes
    # q13_customer_distribution's slot — r1+r2 green, unchanged code)
    "ds_cumulative_channel_cross",
    # + the seeded RAND/RAND_INTEGER battery (java.util.Random LCG in
    # pure Catalyst, functions/randfn.py — takes setop_intersect's slot:
    # r1+r2 green, unchanged code, setop_union_distinct still represents
    # the family)
    "func_rand_seeded",
    # + BPE merge induction (queries/llm.py text_bpe_merges — the
    # tokenizer-training loop completing vocab_topk; takes
    # setop_union_distinct's slot: r1+r2 green, unchanged code, the
    # set-op family keeps setop_except's fresh r7 row)
    "text_bpe_merges",
    # + incremental MV refresh (plans/materialized.py — delta-merge ≡
    # full recompute; takes q4_order_priority's slot: r1+r2 green,
    # unchanged code, the TPC-H family holds eleven r7/r8 rows)
    "mv_incremental_refresh",
    # + count-min-sketch heavy hitters (operators/sketch.py — takes
    # q22_global_sales_opportunity's slot: r1+r2 green, unchanged code,
    # TPC-H family holds eleven r7/r8 rows)
    "sketch_cms_heavy_hitters",
    # + bloom-filter join pruning (operators/bloom.py — takes
    # sort_limit_offset's slot: r1+r2 green, unchanged code, the
    # sort family keeps quidem sort.iq coverage + exact-gate pytest)
    "bloom_prune_join",
    # + HyperLogLog distinct sketch (operators/sketch.py — takes
    # unnest_words's slot: r1+r2 green, unchanged code, the unnest
    # family keeps exact-gate pytest + collect/uncollect quidem cases)
    "sketch_hll_distinct",
    # (unnest_with_ordinality ceded its slot to func_sequence_next —
    # the unnest family keeps unnest_words here + r2 evidence; sequences
    # are NEW surface closing the last SURVEY §2 'no')
    "func_sequence_next",
    # + int8-quantized rerank ANN (operators/similarity.py int8_ann_topk
    # — NEW late r8, needs a first row; takes dedup_ngram_capped's slot:
    # r3 green, unchanged code, dedup_ngram_jaccard still represents the
    # n-gram family in the refresh group below)
    "ann_int8_topk",
    # + unigram-LM surprisal scoring and data-mixture reweighting
    # (queries/llm.py — NEW late r8, need first rows; they take
    # dedup_simhash_buckets' and multimodal_frame_sample's slots: both
    # r3 green with unchanged code, and the dedup/multimodal families
    # keep dedup_minhash_lsh / multimodal_meta in the refresh group)
    "text_surprisal_score", "mix_domain_weights",
    # + three more TPC-DS planning shapes (NEW late r8, need first
    # rows): q4/q11 YoY growth (lag-window rewrite of the aggregate
    # self-join, hash-proven), q14 cross-channel INTERSECT (one-scan
    # conditional-aggregate rewrite, hash-proven), q39 demand-variance
    # month pairs (pure-integer cov predicate, lag-window rewrite).
    # They take text_lang_id's, pipeline_clean_corpus', and
    # modify_insert_delete's slots: r3/r3/r4 green, unchanged code;
    # the text family gains text_surprisal_score above and keeps
    # quality/token slots, the pipeline composes stages that are all
    # individually slated, and modify_merge_orders still represents
    # TableModify below.
    "ds_yoy_growth", "ds_cross_channel_items", "ds_inventory_variance",
    # + TUMBLE group-window family through the front door (NEW late r8,
    # sql._rewrite_tumble; takes source_partition_pruning's slot — r4
    # green, unchanged code, source_dynamic_pruning still pins the
    # pruning family below)
    "func_tumble_group",
    # + HOP and SESSION — the other two Calcite group-window functions
    # through the front door onto Spark's native sliding window() /
    # session_window() (NEW late r8, sql._rewrite_hop/_rewrite_session;
    # they take dedup_ngram_jaccard's and bucketed_join_colocated's
    # slots: r3/r4 green, unchanged code, the dedup family keeps
    # dedup_minhash_lsh + dedup_passage + dedup_clusters here and the
    # bucketed join keeps its no-Exchange plan test + exact-gate pytest)
    "func_hop_group", "func_session_group",
    # + sliding-window chunking with overlap (queries/llm.py — the
    # RAG/embedding-prep fan-out step; NEW late r8, needs a first row;
    # takes pagerank_nations's slot: r3 green, unchanged code, and the
    # label-propagation machinery it shares is re-proven this round by
    # dedup_clusters above)
    "chunk_sliding_windows",
    # (e) round-4-vintage LLM + sources families (VERDICT r7 item 5)
    "dedup_minhash_lsh",
    "multimodal_meta",
    "source_dynamic_pruning",
    "source_jdbc_scan",
    "modify_merge_orders",
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
