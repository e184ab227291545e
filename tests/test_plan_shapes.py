"""Physical-plan shape assertions for the flagship queries — the
`.explain()` claims made in docstrings, pinned as tests:

- filters reach the parquet scan (PushedFilters) and projection prunes
  the read schema (ReadSchema),
- small dimensions broadcast (BroadcastHashJoin),
- top-N queries use TakeOrderedAndProject, not a global sort,
- aggregations are two-phase (map-side partial + final),
- the LSH/banding pipelines never materialize a cartesian product.

Plan strings come from the executed plan pre-AQE-finalization; every
marker asserted here is stable across Spark 4.x plan rendering.
"""

from __future__ import annotations


import __spark_entry__ as entrymod

from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q6_filter_pushdown_and_column_pruning(spark):
    plan = _plan(entrymod.queries()["q6_forecast_revenue"](spark, SF_DIR))
    assert "PushedFilters: [" in plan and "l_shipdate" in plan.split(
        "PushedFilters:"
    )[1][:400], "shipdate filter did not reach the scan"
    # the scan must not read the full 7-column lineitem row
    read = plan.split("ReadSchema:")[1][:400]
    assert "l_extendedprice" in read and "l_returnflag" not in read, \
        "projection did not prune the read schema"


def test_q5_broadcasts_dimensions(spark):
    plan = _plan(entrymod.queries()["q5_local_supplier_volume"](spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 2, \
        "dimension joins are not broadcast"


def test_q3_top_n_uses_take_ordered(spark):
    plan = _plan(entrymod.queries()["q3_shipping_priority"](spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan, \
        "top-10 executed as a global sort instead of TakeOrderedAndProject"


def test_q1_two_phase_aggregation(spark):
    plan = _plan(entrymod.queries()["q1_pricing_summary"](spark, SF_DIR))
    assert plan.count("HashAggregate") >= 2, \
        "aggregation is not map-side partial + final"


def test_dedup_and_ann_have_no_cartesian_product(spark):
    qs = entrymod.queries()
    for name in ["dedup_minhash_lsh", "dedup_ngram_capped",
                 "dedup_embedding_lsh", "ann_lsh_topk"]:
        plan = _plan(qs[name](spark, SF_DIR))
        assert "CartesianProduct" not in plan, \
            f"{name} materializes a cartesian product"


def test_scalable_distribution_no_single_partition_window(spark):
    df = entrymod.queries()["window_distribution_scalable"](spark, SF_DIR)
    plan = _plan(df)
    assert "Window [" not in plan or "SinglePartition" not in plan


def test_round6_batteries_are_map_only(spark):
    """The new scalar batteries (geo relations/measures/buffers, JSON
    scans, phonetics) are pure per-row column math: their physical plans
    must contain no Exchange (no shuffle) and stay in whole-stage
    codegen — a projection over the parquet scan."""
    qs = entrymod.queries()
    for name in ["func_geo_poly_poly", "func_geo_measures",
                 "func_geo_buffer", "func_json_depth",
                 "func_strings_phonetic", "func_tz_convert",
                 "func_geo_relations", "func_geo_wkt"]:
        plan = _plan(qs[name](spark, SF_DIR))
        assert "Exchange" not in plan, f"{name} shuffles: {plan[:400]}"
        # codegen renders as the '*(n)' star marker in the tree string
        assert "*(" in plan, f"{name} fell out of codegen: {plan[:400]}"


def test_tpch3_plan_shapes(spark):
    """The six round-7 TPC-H queries keep their docstring plan claims:
    no cartesian products anywhere; q2 takes its top-100 via
    TakeOrderedAndProject; q9's part filter broadcast-semi-prunes
    lineitem; q16/q20 decorrelate to semi/anti joins (LeftSemi /
    LeftAnti in the physical plan, never a subquery re-execution); q21
    (r14 single-aggregate form) answers both correlated sub-queries
    from ONE per-order min/max aggregate — no semi/anti lineitem legs
    left, and lineitem is scanned exactly twice (l1 + the aggregate),
    not three times."""
    qs = entrymod.queries()
    plans = {n: _plan(qs[n](spark, SF_DIR)) for n in [
        "q2_min_cost_supplier", "q9_product_type_profit",
        "q11_important_stock", "q16_parts_supplier_relationship",
        "q20_potential_promotion", "q21_suppliers_kept_waiting"]}
    for name, plan in plans.items():
        assert "CartesianProduct" not in plan, f"{name} cartesian"
    assert "TakeOrderedAndProject" in plans["q2_min_cost_supplier"]
    # q9 (r15 form): the broadcast-semi part-prune happens once inside
    # the localCheckpoint'ed slice; the outer plan must read that ONE
    # materialized slice for both consumers and never rescan lineitem.
    q9 = plans["q9_product_type_profit"]
    assert "lineitem.parquet" not in q9, \
        "q9 rescans lineitem outside the checkpointed slice"
    assert q9.count("Scan ExistingRDD") == 2, \
        "q9 must read the checkpointed slice exactly twice"
    # the slice itself is built by the broadcast-semi prune
    from drill_calcite_spark.queries.tpch3 import _q9_pruned_slice
    slice_plan = _plan(_q9_pruned_slice(spark, SF_DIR))
    assert "LeftSemi" in slice_plan and "lineitem.parquet" in slice_plan, \
        "q9 slice is not a semi-join prune of lineitem"
    assert "LeftAnti" in plans["q16_parts_supplier_relationship"], \
        "q16 NOT IN is not an anti join"
    assert "LeftSemi" in plans["q20_potential_promotion"]
    q21 = plans["q21_suppliers_kept_waiting"]
    assert "LeftSemi" not in q21 and "LeftAnti" not in q21, \
        "q21 regressed to the three-leg semi/anti form"
    assert q21.count("lineitem.parquet") == 2, \
        "q21 must scan lineitem exactly twice (l1 + per-order aggregate)"
    # the per-order aggregate partial-aggregates min/max before its
    # exchange (map-side combine of the detail leg)
    assert "partial_min" in q21 or "min(l_suppkey" in q21, \
        "q21 per-order min/max aggregate missing"
    # q11's global scalar enters through a broadcast, not a window
    assert "BroadcastNestedLoopJoin" in plans["q11_important_stock"] \
        or "BroadcastHashJoin" in plans["q11_important_stock"]
    assert "Window" not in plans["q11_important_stock"]


def test_approximate_fd_discovery_single_pass_no_expand(spark):
    """discover_fds(approximate=True) pins the 100 TB contract (VERDICT r6
    #3): HLL sketches keep the whole FD/unique-key discovery ONE
    partial-aggregable aggregate — exactly one exchange and no Expand
    node (exact mode's multi-countDistinct expansion)."""
    from drill_calcite_spark.operators.profile import discover_fds

    df = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    plan = _plan(discover_fds(
        df, ["o_orderkey", "o_custkey", "o_orderstatus"], approximate=True))
    assert "Expand" not in plan, f"approximate FD plan expands: {plan[:400]}"
    assert plan.count("Exchange") <= 1, \
        f"approximate FD plan has multiple exchanges: {plan[:400]}"
    # partial aggregation before the exchange (map-side combine)
    assert "partial_approx_count_distinct" in plan.lower() \
        or "HashAggregate" in plan, plan[:400]


def test_single_value_lookup_broadcasts(spark):
    plan = _plan(entrymod.queries()["subquery_single_value"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, \
        "single-value nation lookup is not a broadcast join"


def test_round7_batteries_are_map_only(spark):
    """func_geo_types (type/identity tail) and func_json_hostile
    (Jackson-parsed arbitrary documents) are pure per-row column math —
    no Exchange, codegen stays on."""
    qs = entrymod.queries()
    for name in ["func_geo_types", "func_json_hostile"]:
        plan = _plan(qs[name](spark, SF_DIR))
        assert "Exchange" not in plan, f"{name} shuffles: {plan[:400]}"
        assert "*(" in plan, f"{name} fell out of codegen: {plan[:400]}"


def test_tpcds_round7_plan_shapes(spark):
    """The four TpcdsTest-mirroring shapes keep their docstring claims:
    ds_returns_above_avg broadcasts its 25-row per-nation thresholds;
    ds_cross_channel_band aggregates all three channels in ONE pass over
    the fact (a single aggregate pair, not three scans); 
    ds_multi_supplier_orders decorrelates EXISTS/NOT-EXISTS to
    semi + anti joins; ds_quantity_stats semi-join-prunes on the
    returned-item key set and broadcasts part. No cartesian products
    anywhere."""
    qs = entrymod.queries()
    plans = {n: _plan(qs[n](spark, SF_DIR)) for n in [
        "ds_returns_above_avg", "ds_cross_channel_band",
        "ds_multi_supplier_orders", "ds_quantity_stats"]}
    for name, plan in plans.items():
        assert "CartesianProduct" not in plan, f"{name} cartesian"
    assert "BroadcastHashJoin" in plans["ds_returns_above_avg"], \
        "per-nation thresholds are not broadcast"
    # one conditional-agg pass: lineitem parquet appears in exactly one scan
    assert plans["ds_cross_channel_band"].count("lineitem.parquet") == 1, \
        "cross-channel band re-scans the fact per channel"
    assert ("LeftSemi" in plans["ds_multi_supplier_orders"]
            and "LeftAnti" in plans["ds_multi_supplier_orders"]), \
        "q95-shape EXISTS pair did not become semi + anti joins"
    assert ("LeftSemi" in plans["ds_quantity_stats"]
            and "BroadcastHashJoin" in plans["ds_quantity_stats"]), \
        "q17-shape returned-item prune / part broadcast missing"


def test_tpcds_round8_stretch_plan_shapes(spark):
    """The three r8 stretch shapes keep their docstring claims:
    ds_chained_star_join broadcast-semi-prunes lineitem on the filtered
    part set and broadcasts part for the display join, no cartesian;
    ds_max_over_cte turns both IN predicates into left-semi joins and
    broadcasts the 1-row MAX scalar (never a global window);
    ds_three_channel_full chains genuine FULL OUTER joins with all
    exchanges hashing the same part key."""
    qs = entrymod.queries()
    plans = {n: _plan(qs[n](spark, SF_DIR)) for n in [
        "ds_chained_star_join", "ds_max_over_cte", "ds_three_channel_full"]}
    for name, plan in plans.items():
        assert "CartesianProduct" not in plan, f"{name} cartesian"
        assert "Window" not in plan, f"{name} sneaked in a window"
    p64 = plans["ds_chained_star_join"]
    assert "LeftSemi" in p64 and "BroadcastHashJoin" in p64, \
        "q64-shape part prune / broadcast missing"
    # the self-join must materialize the expensive CTE ONCE: the year
    # step is a residual predicate so both sides hash pk alone, and AQE
    # stage-reuses the identical exchange at runtime
    df64 = qs["ds_chained_star_join"](spark, SF_DIR)
    df64.collect()
    final64 = df64._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in final64, \
        "q64-shape self-join recomputes the fact aggregate twice"
    p23 = plans["ds_max_over_cte"]
    assert p23.count("LeftSemi") >= 2, \
        "q23-shape IN predicates did not both become semi joins"
    assert "BroadcastNestedLoopJoin" in p23 or "BroadcastHashJoin" in p23, \
        "q23-shape MAX scalar is not broadcast"
    p78 = plans["ds_three_channel_full"]
    assert p78.count("FullOuter") >= 2, \
        "q78-shape is not a genuine FULL OUTER chain"


def test_quantified_expansion_merges_scalar_subqueries(spark):
    """100 TB contract for the quantified SOME/ALL textual expansion
    (sql.py): its four count/min-max scalar subqueries over the same
    relation must collapse into ONE shared aggregate (Catalyst's
    MergeScalarSubqueries emits a single named_struct mergedValue) —
    one scan of the subquery relation, not four."""
    from drill_calcite_spark.sources.test_schemas import register_scott
    from drill_calcite_spark.sql import calcite_sql

    register_scott(spark)
    df = calcite_sql(
        spark,
        'select ename from "scott".emp '
        'where sal > all (select comm * 2 from "scott".emp)',
        schema_views={"scott": "scott_"})
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "mergedValue" in plan, (
        "quantified expansion's subqueries were not merged:\n" + plan[:500])


def test_geo_setops_map_only_and_kafka_single_shuffle(spark):
    """func_geo_setops is pure column algebra (no Exchange);
    source_kafka_convert is map-side encode/decode + ONE partial-agg
    shuffle on MSG_PARTITION."""
    qs = entrymod.queries()
    geo = _plan(qs["func_geo_setops"](spark, SF_DIR))
    assert "Exchange" not in geo, f"geo setops shuffles: {geo[:400]}"
    kafka = _plan(qs["source_kafka_convert"](spark, SF_DIR))
    n_exchange = kafka.count("Exchange hashpartitioning")
    # 2 = the count(DISTINCT event_type) expansion: partial agg on
    # (partition, type) then final on partition — both partial-aggregated
    # map-side; the encode/decode itself adds no shuffle.
    assert n_exchange == 2, (
        f"kafka convert expected the 2-phase distinct-agg exchanges, "
        f"saw {n_exchange}:\n" + kafka[:400])
    assert "Exchange rangepartitioning" not in kafka


def test_sql_spatial_surface_map_only_jvm_side(spark):
    """sql_spatial_surface: the SQL-UDF ST_* calls macro-inline into
    plain Catalyst expressions — the whole battery is ONE map-only
    projection over the scan with no Exchange and no Python boundary
    (the higher-order lambdas run interpreted-eval on the executor JVM;
    they are outside whole-stage codegen but never cross into Python) —
    the 100 TB contract of functions/geo_sqlfn.py's binding
    discipline."""
    plan = _plan(entrymod.queries()["sql_spatial_surface"](spark, SF_DIR))
    assert "Exchange" not in plan, f"spatial surface shuffles: {plan[:400]}"
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, \
        "spatial surface crossed into Python"
    assert plan.count("Scan parquet") == 1, "expected exactly one scan"


def test_decontaminate_broadcasts_benchmark_grams(spark):
    """decontaminate_ngrams: the benchmark n-gram set is the small side
    and must BROADCAST — a shuffled join here would reshuffle the whole
    exploded corpus at 100 TB."""
    plan = _plan(entrymod.queries()["decontaminate_ngrams"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, \
        f"benchmark grams not broadcast:\n{plan[:500]}"
    assert "SortMergeJoin" not in plan


def test_repetition_stats_single_shuffle_no_explode_no_python(spark):
    """text_repetition_stats: every metric is a higher-order array
    expression inside the row — the plan must contain exactly ONE
    Exchange (the balancing repartition), no Generate (no explode —
    grams never become rows), and no Python evaluation."""
    plan = _plan(entrymod.queries()["text_repetition_stats"](spark, SF_DIR))
    assert plan.count("Exchange") == 1, plan[:800]
    assert "Generate" not in plan
    assert "EvalPython" not in plan


def test_passage_dedup_shuffles_hashes_not_text(spark):
    """dedup_passage: one explode, then the frequency aggregate and the
    count-back join shuffle md5 hashes only; no cartesian product and
    no Python anywhere."""
    plan = _plan(entrymod.queries()["dedup_passage"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan
    # partial counts combine map-side before the hash exchange
    assert plan.count("HashAggregate") >= 2


def test_pack_token_chunks_partitioned_window(spark):
    """pack_token_chunks: the running sum windows per source shard —
    never a SinglePartition global window — and needs exactly one
    shuffle (the window's own partitioning)."""
    plan = _plan(entrymod.queries()["pack_token_chunks"](spark, SF_DIR))
    assert "Window" in plan
    assert "SinglePartition" not in plan, \
        "packing window collapsed to a single task"
    assert plan.count("Exchange") == 1, plan[:800]


def test_chunk_sliding_windows_map_only(spark):
    """chunk_sliding_windows: one Generate (the per-doc chunk explode),
    NO shuffle, no window function, no Python — the fan-out streams
    through the map stage."""
    plan = _plan(entrymod.queries()["chunk_sliding_windows"](spark, SF_DIR))
    assert "Generate" in plan
    assert "Exchange" not in plan, f"chunking shuffles: {plan[:600]}"
    assert "Python" not in plan


def test_band_counts_single_scan_no_join(spark):
    """ds_band_counts: all eight band populations come out of ONE scan
    as conditional counts — the naive q88 form is eight scans
    cross-joined."""
    plan = _plan(entrymod.queries()["ds_band_counts"](spark, SF_DIR))
    assert plan.count("Scan parquet") == 1, "more than one fact scan"
    assert "Join" not in plan, "band counts should not join"


def test_group_count_band_aggregates_before_joins(spark):
    """ds_group_count_band: the HAVING band reduces the fact on its
    native key before any join; partial aggregation is map-side."""
    plan = _plan(entrymod.queries()["ds_group_count_band"](spark, SF_DIR))
    assert plan.count("HashAggregate") >= 2
    assert "CartesianProduct" not in plan


def test_range_join_is_equi_not_nested_loop(spark):
    """range_join_attribution: the bucketed rewrite must execute as an
    EQUI join on (user_id, bucket) — never a nested-loop/cartesian theta
    join, which is quadratic in per-key history at scale."""
    plan = _plan(entrymod.queries()["range_join_attribution"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan), plan[:800]


def test_cumulative_channel_cross_windows_after_aggregate(spark):
    """ds_cumulative_channel_cross: the cumulative windows must run over
    POST-aggregate (pk, month) rows with per-pk partitions — never a
    SinglePartition window and never over fact rows — and the FULL OUTER
    join must be an equi join."""
    plan = _plan(entrymod.queries()["ds_cumulative_channel_cross"](
        spark, SF_DIR))
    assert "SinglePartition" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "FullOuter" in plan, plan[:600]


def test_bpe_merges_broadcast_argmax_no_cartesian(spark):
    """text_bpe_merges: each round's 1-row argmax joins back into the
    vocabulary by BROADCAST (crossJoin(broadcast(best)) — a
    BroadcastNestedLoopJoin over one row), never a CartesianProduct;
    the whole K-round loop stays JVM-side (no Python), and the only
    corpus-scale pass is the word-frequency aggregate — every
    per-round pair count aggregates the bounded vocab table."""
    plan = _plan(entrymod.queries()["text_bpe_merges"](spark, SF_DIR))
    assert "CartesianProduct" not in plan, plan[:600]
    assert "BroadcastNestedLoopJoin" in plan, \
        f"argmax not broadcast:\n{plan[:600]}"
    assert "EvalPython" not in plan
    # partial aggregation combines map-side before every exchange
    assert plan.count("HashAggregate") >= 2


def test_cms_sketch_broadcast_estimate(spark):
    """sketch_cms_heavy_hitters: the 192-cell counter table must
    BROADCAST into the estimate join (a shuffled join would move the
    probe side for nothing), and nothing crosses into Python."""
    plan = _plan(entrymod.queries()["sketch_cms_heavy_hitters"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, f"sketch not broadcast:\n{plan[:500]}"
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_bloom_prune_below_join_exchange(spark):
    """bloom_prune_join: the membership probes (array_contains over the
    broadcast one-row bit set) must run BELOW the orders-side shuffle
    that feeds the SortMergeJoin — pruning after the exchange would
    move the dropped rows for nothing. Textually the Exchange line
    precedes (sits above) the probe filter in the plan tree."""
    plan = _plan(entrymod.queries()["bloom_prune_join"](spark, SF_DIR))
    assert "SortMergeJoin" in plan, plan[:400]
    assert "array_contains" in plan
    probe_side = plan.index("Exchange hashpartitioning(o_custkey")
    assert probe_side < plan.index("array_contains"), \
        "bloom probe evaluated above the join exchange"
    assert "EvalPython" not in plan


def test_int8_ann_quantization_stays_jvm_side(spark):
    """ann_int8_topk: bucketing + quantization + integer scoring are all
    Catalyst expressions — no Python evaluation, no cartesian product
    (candidates come from the LSH equi-join on (tbl, bkt))."""
    plan = _plan(entrymod.queries()["ann_int8_topk"](spark, SF_DIR))
    assert "EvalPython" not in plan, "quantized ANN crossed into Python"
    assert "CartesianProduct" not in plan, "all-pairs leak in int8 ANN"


def test_surprisal_no_python_no_cartesian_broadcast_scalar(spark):
    """text_surprisal_score: the vocab join is token-keyed (shuffle, AQE
    skew-splittable — NOT a cartesian), the only cross join is the 1-row
    global-total broadcast, and everything stays JVM-side (bin/div are
    codegen expressions, no log())."""
    plan = _plan(entrymod.queries()["text_surprisal_score"](spark, SF_DIR))
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" in plan  # the 1-row total scalar


def test_mix_domain_weights_broadcast_only(spark):
    """mix_domain_weights: strata aggregates are tiny — the lang join and
    the global 1-row join must both be broadcasts; never a sort-merge."""
    plan = _plan(entrymod.queries()["mix_domain_weights"](spark, SF_DIR))
    assert "SortMergeJoin" not in plan, plan[:600]
    assert "EvalPython" not in plan


def test_yoy_growth_window_not_self_join(spark):
    """ds_yoy_growth: the year-over-year pairing is a lag() window over
    the ONE customer-year aggregate — the executed plan must contain a
    Window and NO sort-merge self-join (the only join is the broadcast
    orders⋈lineitem below the aggregate); exactly one fact scan."""
    plan = _plan(entrymod.queries()["ds_yoy_growth"](spark, SF_DIR))
    assert "Window" in plan, plan[:600]
    assert "SortMergeJoin" not in plan, f"self-join survived:\n{plan[:600]}"
    assert plan.count("Scan parquet") == 2  # lineitem + orders, once each


def test_inventory_variance_window_not_self_join(spark):
    """ds_inventory_variance: the month-pair comes from a lag() window
    over the one filtered aggregate — no join anywhere in the plan, and
    the window partitions by (suppkey, yr), never a single partition."""
    plan = _plan(entrymod.queries()["ds_inventory_variance"](spark, SF_DIR))
    assert "Window" in plan
    assert "Join" not in plan, f"self-join survived:\n{plan[:600]}"
    assert "SinglePartition" not in plan


def test_cross_channel_items_semi_join_broadcast(spark):
    """ds_cross_channel_items: the cross-item set reaches the fact as a
    BROADCAST left-semi join (an item-id set is dimension-sized at any
    scale); the INTERSECT itself is one conditional aggregate, so no
    Intersect operator and no cartesian appears."""
    plan = _plan(entrymod.queries()["ds_cross_channel_items"](spark, SF_DIR))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan[:600]
    assert "CartesianProduct" not in plan


def test_qsketch_partial_agg_and_sketch_sized_window(spark):
    """sketch_qsketch_quantiles: the capped-keyspace build must map-side
    combine (partial + final HashAggregate on bucket_lo) so the exchange
    carries <= tasks x 2048 cells, never raw values; everything stays
    JVM-side; and the quantile window runs over the SKETCH (post-
    aggregate), so the aggregate appears below the window in the tree."""
    plan = _plan(entrymod.queries()["sketch_qsketch_quantiles"](
        spark, SF_DIR))
    assert plan.count("HashAggregate") >= 2, plan[:600]
    assert "EvalPython" not in plan
    win_at = plan.index("Window")
    assert plan.rindex("HashAggregate") > win_at, \
        "quantile window must consume the aggregated sketch (the build " \
        "aggregate belongs BELOW the window in the tree)"


def test_ds_margin_rollup_broadcast_and_post_agg_window(spark):
    """ds_margin_rollup_rank: part broadcasts into the fact join; the
    rank window consumes EXPANDED+aggregated rollup rows, never the fact
    table (the bottom-most HashAggregate sits below the Window)."""
    plan = _plan(entrymod.queries()["ds_margin_rollup_rank"](
        spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan[:400]
    assert "Expand" in plan  # ROLLUP grouping-set expansion
    assert "Window" in plan
    assert plan.rindex("HashAggregate") > plan.index("Window"), \
        "rank window must run over aggregated rollup rows"
    assert "EvalPython" not in plan


def test_ds_channel_overlap_single_scan_no_join_of_distincts(spark):
    """ds_channel_overlap: the presence-flag rewrite must touch lineitem
    ONCE and never materialize q97's FULL OUTER join of two distincts —
    one orders-lineitem join, no outer join, no second fact scan."""
    plan = _plan(entrymod.queries()["ds_channel_overlap"](spark, SF_DIR))
    assert plan.count("lineitem.parquet") == 1, \
        "fact table scanned more than once"
    assert "FullOuter" not in plan and "full_outer" not in plan
    assert "EvalPython" not in plan


def test_sql_match_recognize_one_shuffle_grouped_pandas(spark):
    """sql_match_recognize: the SQL-text path must execute exactly like
    the hand-built operator — ONE exchange on the partition keys feeding
    a grouped-pandas node (FlatMapGroupsInPandas); pattern matching is
    sequential only WITHIN a partition, never a driver-side loop."""
    plan = _plan(entrymod.queries()["sql_match_recognize"](spark, SF_DIR))
    assert "FlatMapGroupsInPandas" in plan, plan[:400]
    assert plan.count("Exchange") <= 2, \
        f"MR front door added exchanges: {plan[:500]}"


def test_grouping_having_lift_adds_no_exchange(spark):
    """agg_grouping_having: the HAVING-grouping subquery lift must stay
    a post-aggregate Filter over the rollup's own projection — one
    expand + one two-phase aggregate (a single shuffle), no extra
    Exchange or Join introduced by the rewrite."""
    plan = _plan(entrymod.queries()["agg_grouping_having"](spark, SF_DIR))
    assert "Expand" in plan, "rollup did not plan as Expand"
    n_ex = plan.count("Exchange")
    assert n_ex <= 2, f"HAVING lift introduced extra shuffles: {n_ex}"
    assert "Join" not in plan, "HAVING lift must not plan a join"


def test_ds_multichannel_rollup_broadcast_dims_preagg_union(spark):
    """ds_multichannel_rollup (q5 shape): supplier/part dims broadcast
    into the channel branches; each branch pre-aggregates BEFORE the
    union, so the rollup's Expand sees branch aggregates, not fact rows
    (the Expand sits above a Union of HashAggregates); the top-100 is a
    TakeOrdered, never a global sort."""
    plan = _plan(entrymod.queries()["ds_multichannel_rollup"](
        spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, plan[:400]
    assert "Expand" in plan and "Union" in plan
    assert plan.index("Expand") < plan.index("Union"), \
        "rollup Expand must consume the union of PRE-AGGREGATED branches"
    assert "TakeOrdered" in plan, "ordered LIMIT must be a TakeOrdered"
    assert "EvalPython" not in plan


def test_ds_inventory_demand_window_bucketed_equi_join(spark):
    """ds_inventory_demand_window (q72 shape): the week-window
    inventory join must run as the BUCKETED equi join — hash-partitioned
    on (wh, bucket) with the inequalities as residual filters — never a
    nested-loop/cartesian theta join; item and low-balance supplier dims
    broadcast."""
    plan = _plan(entrymod.queries()["ds_inventory_demand_window"](
        spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan, \
        "range predicate leaked into a nested-loop join"
    assert "__bucket" in plan, "bucketed range-join key missing"
    assert plan.count("BroadcastHashJoin") >= 2, plan[:400]
    assert "EvalPython" not in plan


def test_ds_weekly_ratio_yoy_reuses_exchange(spark):
    """ds_weekly_ratio_yoy (q59 shape): the weekly pivot aggregate is
    built once and self-joined at the 52-week offset — AQE must REUSE
    the aggregate's shuffle (one fact scan + one exchange feed both
    join sides), never re-evaluate the CTE as q59's textbook form
    spells it. Exchange reuse is an AQE stage-level decision, so this
    test executes the query and asserts on the FINALIZED adaptive
    plan."""
    df = entrymod.queries()["ds_weekly_ratio_yoy"](spark, SF_DIR)
    assert len(df.collect()) > 0
    plan = _plan(df)
    assert "isFinalPlan=true" in plan
    assert "ReusedExchange" in plan, \
        f"weekly aggregate re-evaluated instead of reused: {plan[:500]}"
    # (no scan-count string check: the finalized adaptive render prints
    # each query stage's full lineage, so the byte count over-counts —
    # the ReusedExchange node IS the one-scan/one-shuffle proof)
    assert "EvalPython" not in plan


def test_ds_channel_intersect_single_scan_no_intersect(spark):
    """ds_channel_intersect (q38 shape): the presence-flag rewrite must
    touch lineitem ONCE and materialize no INTERSECT/join of distinct
    sets."""
    plan = _plan(entrymod.queries()["ds_channel_intersect"](spark, SF_DIR))
    assert plan.count("lineitem.parquet") == 1
    assert "LeftSemi" not in plan  # Spark plans INTERSECT as semi joins
    assert "EvalPython" not in plan


def test_ds_monthly_deviation_single_scan_one_window_exchange(spark):
    """ds_monthly_deviation_neighbors (q47/q57 shape): the lag/lead
    rewrite must scan the fact ONCE (the textbook form instantiates
    the CTE three times) and both window passes must share ONE
    shuffle — the lag/lead exchange on (brand, store) already
    co-locates the yearly-total window's (brand, store, yr) groups."""
    plan = _plan(entrymod.queries()["ds_monthly_deviation_neighbors"](
        spark, SF_DIR))
    assert plan.count("lineitem.parquet") == 1, \
        "fact table scanned more than once"
    shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert shuffles <= 2, \
        f"expected agg + one shared window shuffle, got {shuffles}"
    assert plan.count("Window") == 2
    assert "SortMergeJoin" not in plan, \
        "rn-offset self-join leaked into the plan"
    assert "EvalPython" not in plan


def test_ds_cumulative_channel_max_single_scan_no_full_outer(spark):
    """ds_cumulative_channel_max (q51 shape): the conditional-sum
    rewrite must scan the fact ONCE and never materialize q51's FULL
    OUTER join of the two windowed channel CTEs; one window pass
    computes both running totals."""
    plan = _plan(entrymod.queries()["ds_cumulative_channel_max"](
        spark, SF_DIR))
    assert plan.count("lineitem.parquet") == 1, \
        "fact table scanned more than once"
    assert "FullOuter" not in plan and "full_outer" not in plan
    assert plan.count("Window") == 1, \
        "both running sums must ride one window pass"
    assert "EvalPython" not in plan


def test_ds_return_ratio_ranks_single_scan_shared_exchange(spark):
    """ds_return_ratio_ranks (q49 shape): the channel-as-a-column
    rewrite must scan the fact ONCE (vs the textbook three-branch
    UNION ALL) and the two rank windows — same partition key,
    different order keys — must share one exchange (two sorts, no
    second shuffle)."""
    plan = _plan(entrymod.queries()["ds_return_ratio_ranks"](
        spark, SF_DIR))
    assert plan.count("lineitem.parquet") == 1, \
        "fact table scanned more than once"
    assert "Union" not in plan, "three-branch union leaked into the plan"
    shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert shuffles <= 2, \
        f"expected agg + one shared rank shuffle, got {shuffles}"
    assert plan.count("Window") == 2
    assert "EvalPython" not in plan


def test_split_train_holdout_map_only_assignment(spark):
    """split_train_holdout: the hash-split assignment must be pure
    column algebra on the scan side — the ONLY exchange is the small
    per-(source, split) report aggregate; no Python eval, no second
    pass over the corpus."""
    plan = _plan(entrymod.queries()["split_train_holdout"](spark, SF_DIR))
    shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert shuffles == 1, f"split assignment shuffled the corpus: {shuffles}"
    assert "EvalPython" not in plan
    assert plan.count("documents.parquet") == 1


def test_ds_top_states_rollup_rank_single_scan(spark):
    """ds_top_states_rollup_rank (q70 shape): the top-5-states
    subquery must be served from the (state, county) pre-aggregate by
    a dense-rank window — ONE fact scan total (the textbook IN-rank
    form scans twice; a semi-join formulation gets split by
    PushDownLeftSemiAntiJoin into a second scan) and NO join of any
    kind above the dimension broadcasts."""
    plan = _plan(entrymod.queries()["ds_top_states_rollup_rank"](
        spark, SF_DIR))
    assert plan.count("lineitem.parquet") == 1, \
        "fact table scanned more than once"
    assert "LeftSemi" not in plan and "SortMergeJoin" not in plan
    assert "Expand" in plan, "rollup did not plan as Expand"
    assert "EvalPython" not in plan


def test_ds_quarter_growth_compare_single_scan_no_self_join(spark):
    """ds_quarter_growth_compare (q31 shape): the lag-window rewrite
    must scan the fact ONCE (the textbook form instantiates the
    quarterly aggregate six times and chains five joins) — one
    aggregate shuffle + one window shuffle, no join above the
    dimension broadcasts."""
    plan = _plan(entrymod.queries()["ds_quarter_growth_compare"](
        spark, SF_DIR))
    assert plan.count("lineitem.parquet") == 1, \
        "fact table scanned more than once"
    assert "SortMergeJoin" not in plan, \
        "quarter-offset self-join leaked into the plan"
    shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert shuffles <= 2, f"extra shuffles: {shuffles}"
    assert plan.count("Window") == 1
    assert "EvalPython" not in plan


def test_ds_channel_presence_single_scan_no_existence_joins(spark):
    """ds_channel_presence_demographics (q35/q69 shape): the
    presence-flag rewrite must scan orders ONCE (the textbook form
    runs three correlated EXISTS, and the OR of two EXISTS forces
    existence joins) — one flags aggregate, one equi join to customer,
    zero semi/existence joins."""
    plan = _plan(entrymod.queries()["ds_channel_presence_demographics"](
        spark, SF_DIR))
    assert plan.count("orders.parquet") == 1, \
        "orders scanned more than once"
    assert "LeftSemi" not in plan and "ExistenceJoin" not in plan
    assert "EvalPython" not in plan


def test_ds_warehouse_monthly_pivot_single_scan_one_exchange(spark):
    """ds_warehouse_monthly_pivot (q66 shape): all 12 monthly columns
    plus the total ride ONE two-phase aggregate over ONE fact scan (the
    textbook form unions two per-channel 12-column blocks and
    re-aggregates) — no Union node, a single shuffle, partial
    aggregation before it."""
    plan = _plan(entrymod.queries()["ds_warehouse_monthly_pivot"](
        spark, SF_DIR))
    assert plan.count("lineitem.parquet") == 1
    assert "Union" not in plan
    shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert shuffles == 1, f"wide aggregate split into {shuffles} shuffles"
    assert plan.count("HashAggregate") >= 2, "no map-side partial"
    assert "EvalPython" not in plan


def test_ds_excess_discount_one_scan_shared_partitioning(spark):
    """ds_excess_discount (q32/q92 shape): the correlated-average
    decorrelation must scan the fact ONCE, and the post-filter per-item
    aggregate must REUSE the window's hash partitioning on l_partkey —
    exactly one shuffle in the whole plan, no join."""
    plan = _plan(entrymod.queries()["ds_excess_discount"](spark, SF_DIR))
    assert plan.count("lineitem.parquet") == 1
    shuffles = plan.count("Exchange") - plan.count("BroadcastExchange")
    assert shuffles == 1, f"decorrelation added shuffles: {shuffles}"
    assert "Join" not in plan, "correlated subquery planned as a join"
    assert "EvalPython" not in plan


def test_ds_bucket_stats_one_scan_no_join(spark):
    """ds_bucket_stats (q28 shape): the six-subquery CROSS JOIN must be
    rewritten to ONE fact scan — all 18 measures (incl. the six distinct
    counts sharing one Expand) come from a single pass, no join."""
    plan = _plan(entrymod.queries()["ds_bucket_stats"](spark, SF_DIR))
    assert plan.count("lineitem.parquet") == 1, "textbook six-scan form"
    assert "Join" not in plan, "bucket subqueries planned as joins"
    assert "EvalPython" not in plan


def test_ds_best_worst_items_one_scan_broadcast_names(spark):
    """ds_best_worst_items (q44 shape): the per-item aggregate is built
    ONCE (one fact scan feeds both rank windows), rank pairing is the
    tiny conditional-explode groupBy (no self-join of ranked lists), and
    the two part-name lookups broadcast."""
    plan = _plan(entrymod.queries()["ds_best_worst_items"](spark, SF_DIR))
    assert plan.count("lineitem.parquet") == 1, \
        "textbook two-instance aggregate"
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") == 2, "part lookups not broadcast"
    assert "EvalPython" not in plan


def test_ds_channel_except_single_scan_no_except(spark):
    """ds_channel_except (q87 shape): three DISTINCTs + two EXCEPTs must
    fold to ONE scan with presence flags — no set-op nodes, one
    fact-side aggregation on the pair key."""
    plan = _plan(entrymod.queries()["ds_channel_except"](spark, SF_DIR))
    assert plan.count("lineitem.parquet") == 1, "textbook three-scan form"
    for marker in ("Except", "SortMergeJoin"):
        assert marker not in plan, f"set-op survived as {marker}"
    assert "EvalPython" not in plan


def test_ds_returns_adjusted_yoy_single_scan_lag_window(spark):
    """ds_returns_adjusted_yoy (q75 shape): the channel-union branches
    fold to ONE fact scan, the returns adjustment is a map-side CASE,
    and the prior-year comparison is a LAG window over the aggregate —
    no self-join of the yearly aggregate."""
    plan = _plan(entrymod.queries()["ds_returns_adjusted_yoy"](
        spark, SF_DIR))
    assert plan.count("lineitem.parquet") == 1, "branch union re-scanned"
    assert plan.count("Window") >= 1, "lag window missing"
    assert "SortMergeJoin" not in plan or plan.count("SortMergeJoin") <= 1
    assert "EvalPython" not in plan


def test_ds_promo_ratio_one_scan_conditional_sums(spark):
    """ds_promo_ratio (q61/q90 shape): the two star-join CTEs must fold
    to ONE scan with a conditional sum — no CROSS JOIN of one-row
    aggregates, no second pass."""
    plan = _plan(entrymod.queries()["ds_promo_ratio"](spark, SF_DIR))
    assert plan.count("lineitem.parquet") == 1, "textbook two-scan form"
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_ds_bucket_case_select_one_scan_no_subqueries(spark):
    """ds_bucket_case_select (q9 shape): fifteen scalar subqueries must
    collapse to ONE scan of conditional aggregates — a single pass, no
    joins, the CASE ladder evaluated over one aggregated row."""
    plan = _plan(entrymod.queries()["ds_bucket_case_select"](spark, SF_DIR))
    assert plan.count("lineitem.parquet") == 1, "scalar subqueries re-scan"
    assert "Join" not in plan
    assert "EvalPython" not in plan


def test_ds_disjunctive_semijoin_distinct_reduced_flag(spark):
    """ds_disjunctive_semijoin (q45 shape): the OR'd IN-subquery must
    run as a presence-flag join over the DISTINCT-reduced subquery side
    — never a nested loop / cartesian fallback."""
    plan = _plan(entrymod.queries()["ds_disjunctive_semijoin"](
        spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashAggregate" in plan, "subquery side not distinct-reduced"
    assert "EvalPython" not in plan


def test_ds_item_attr_exists_window_not_self_join(spark):
    """ds_item_attr_exists (q41 shape): the correlated dim count must
    decorrelate to ONE dim scan with a window — no dim self-join."""
    plan = _plan(entrymod.queries()["ds_item_attr_exists"](spark, SF_DIR))
    assert plan.count("part.parquet") == 1, "correlated count re-scans dim"
    assert "Join" not in plan
    assert plan.count("Window") == 1
    assert "EvalPython" not in plan


def test_ds_pricey_state_customers_dim_window_broadcast(spark):
    """ds_pricey_state_customers (q6 shape): the category-average
    decorrelation scans the item dim ONCE (window, not self-join), and
    the reduced dim enters the fact star as a BROADCAST."""
    plan = _plan(entrymod.queries()["ds_pricey_state_customers"](
        spark, SF_DIR))
    assert plan.count("part.parquet") == 1, "correlated avg re-scans dim"
    assert plan.count("Window") == 1
    assert plan.count("BroadcastHashJoin") >= 1
    assert "EvalPython" not in plan


def test_embed_random_projection_map_only_flat_literal(spark):
    """embed_random_projection: the JL projection must be map-only —
    no exchange of any kind, no Python, and the projection matrix rides
    as data (not 512 Literal nodes — plan stays small)."""
    plan = _plan(entrymod.queries()["embed_random_projection"](
        spark, SF_DIR))
    assert "Exchange" not in plan, "projection is not map-only"
    assert "EvalPython" not in plan
    assert len(plan) < 20000, "plan exploded with per-weight literals"


def test_shuffle_epoch_order_sharded_window_not_global(spark):
    """shuffle_epoch_order: ranking must be windowed PER SHARD (hash
    partitioned), never a global single-task sort/window."""
    plan = _plan(entrymod.queries()["shuffle_epoch_order"](spark, SF_DIR))
    assert "hashpartitioning(shard" in plan, "window not sharded"
    assert "SinglePartition" not in plan, "global single-task window"
    assert "EvalPython" not in plan


def test_ds_manufacturer_channel_total_one_scan_one_agg(spark):
    """ds_manufacturer_channel_total (q33/q56/q60 shape): three channel
    CTEs + re-aggregation must fold to ONE scan and ONE aggregation —
    no Union node, part broadcast."""
    plan = _plan(entrymod.queries()["ds_manufacturer_channel_total"](
        spark, SF_DIR))
    assert plan.count("lineitem.parquet") == 1, "textbook three-scan form"
    assert "Union" not in plan, "channel union survived"
    assert plan.count("BroadcastHashJoin") >= 1
    assert "EvalPython" not in plan


def test_ds_ship_lag_buckets_single_scan_no_explode(spark):
    """ds_ship_lag_buckets (q62/q50 shape): the band pivot is map-side
    conditional counting — one fact scan, no Generate/Expand row
    explosion."""
    plan = _plan(entrymod.queries()["ds_ship_lag_buckets"](spark, SF_DIR))
    assert plan.count("lineitem.parquet") == 1
    assert "Generate" not in plan and "Expand" not in plan
    assert "EvalPython" not in plan


def test_text_bpe_encode_map_only_no_explode(spark):
    """text_bpe_encode: tokenizer application must be MAP-ONLY — the
    per-doc token count folds in-row, so there is no Generate, no
    exchange of any kind, and no Python."""
    plan = _plan(entrymod.queries()["text_bpe_encode"](spark, SF_DIR))
    assert "Exchange" not in plan, "encode is not map-only"
    assert "Generate" not in plan, "words exploded to rows"
    assert "EvalPython" not in plan


def test_ds_cross_nation_orders_broadcast_dims_one_shuffle(spark):
    """ds_cross_nation_orders (q46/q68 shape): both dims broadcast, the
    inequality is a residual filter (no nested loop), and the fact
    shuffles once for the composite-key aggregation."""
    plan = _plan(entrymod.queries()["ds_cross_nation_orders"](
        spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 2
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_ds_band_reason_averages_residual_hash_join(spark):
    """ds_band_reason_averages (q85/q48 shape): the OR-of-bands must be
    a residual on hash joins — never a nested-loop fallback."""
    plan = _plan(entrymod.queries()["ds_band_reason_averages"](
        spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_ds_price_band_stock_pushdown_semi(spark):
    """ds_price_band_stock (q82/q37 shape): the price band reaches the
    part scan (PushedFilters) and the existence test is a semi join."""
    plan = _plan(entrymod.queries()["ds_price_band_stock"](spark, SF_DIR))
    assert "LeftSemi" in plan, "EXISTS not planned as a semi join"
    pushed = plan.split("PushedFilters:")
    assert any("p_retailprice" in seg[:300] for seg in pushed[1:]), \
        "price band did not reach the scan"
    assert "EvalPython" not in plan


def test_sketch_gate_broadcast_threshold_no_global_sort(spark):
    """pipeline_quality_sketch_gate: the threshold must come from the
    sketch (quantile window over ≤2048 cells) and join back as a
    BROADCAST scalar — no global sort or exact percentile of the
    corpus anywhere."""
    plan = _plan(entrymod.queries()["pipeline_quality_sketch_gate"](
        spark, SF_DIR))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "rangepartitioning" not in plan.lower().replace(
        "rangepartitioning(bucket_lo", ""), "corpus-wide sort leaked"
    assert "EvalPython" not in plan


def test_text_boilerplate_mask_two_stage_topk(spark):
    """text_boilerplate_mask: the per-source top-20 ranking must be
    TWO-STAGE — a partial top-K windowed over (source, shuffle
    partition) feeding a merge window — so no single task ever sorts
    a source's full distinct-shingle population (the r10 verdict's
    scale-killer). The stage-1 partition key (`__pid`) and BOTH window
    nodes must appear; the boilerplate set must join back broadcast."""
    df = entrymod.queries()["text_boilerplate_mask"](spark, SF_DIR)
    # r12: the join-back is no longer hint-forced (the set is ≤ 20
    # rows/source but |sources| is data-dependent) — execute and pin
    # that AQE still chooses broadcast at test SFs
    df.collect()
    plan = _plan(df).split("== Initial Plan ==")[0]
    assert "__pid" in plan, "stage-1 partial top-K missing (no __pid key)"
    assert plan.count("Window") >= 2, "two-stage ranking collapsed"
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, \
        "boilerplate set not broadcast back"
    assert "EvalPython" not in plan


def test_dedup_keep_best_no_cartesian_bounded_window(spark):
    """dedup_keep_best: candidates must come from LSH banding (no
    cartesian product anywhere) and the argmax window partitions by
    cluster_id — cluster-sized partitions, never a global sort."""
    plan = _plan(entrymod.queries()["dedup_keep_best"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "hashpartitioning(cluster_id" in plan, \
        "argmax window not partitioned by cluster"
    assert "SinglePartition" not in plan, "global single-task stage leaked"


def test_ds_cross_sales_yoy_one_scan_no_self_join(spark):
    """ds_cross_sales_yoy (q64 shape): the textbook two-instance CTE
    self-join must fold to ONE fact scan with conditional per-year
    aggregates — no join of two aggregates, a single exchange on the
    grouped key."""
    plan = _plan(entrymod.queries()["ds_cross_sales_yoy"](spark, SF_DIR))
    assert plan.count("lineitem.parquet") == 1, "CTE instantiated twice"
    assert "SortMergeJoin" not in plan, "self-join of aggregates leaked"
    assert "EvalPython" not in plan


def test_ds_iceberg_cross_channel_one_scan_flags_broadcast(spark):
    """ds_iceberg_cross_channel (q14 shape): the three-way INTERSECT +
    three channel branches must fold to ONE fact scan; the channel-
    presence count is a window over per-item aggregate rows; the
    average threshold joins back as a one-row BROADCAST; the ROLLUP
    expands aggregate-sized rows (Expand node present)."""
    plan = _plan(entrymod.queries()["ds_iceberg_cross_channel"](
        spark, SF_DIR))
    # the per-(item, channel) aggregate is localCheckpoint'd (r14:
    # per-run, no CacheManager entry) and BOTH consumers (presence
    # window + scalar threshold) read the SAME checkpointed RDD — no
    # live fact scan remains in the serving plan
    assert plan.count("Scan ExistingRDD") >= 2, \
        "aggregate not reused via the shared checkpoint"
    assert "lineitem.parquet" not in plan, "a consumer re-scans the fact"
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "Expand" in plan, "ROLLUP lost its Expand"
    assert "EvalPython" not in plan


def test_ds_frequent_best_sales_broadcast_semi_joins(spark):
    """ds_frequent_best_sales (q23 shape): the frequent-item and
    best-customer sets must attach to the final pass as BROADCAST semi
    joins (never a shuffle of the fact on a filter key), and the two
    textbook UNION branches must fold into one final scan — three fact
    passes total, one per distinct aggregation key.

    r12: the broadcasts are no longer FORCED (the sets are data-
    dependent; AQE's runtime size check decides and falls back to a
    shuffled join instead of OOMing at a pathological scale), so this
    test EXECUTES the query and pins the final adaptive plan — AQE
    must still choose broadcast at test SFs."""
    df = entrymod.queries()["ds_frequent_best_sales"](spark, SF_DIR)
    df.collect()  # drive AQE to its final plan
    full = _plan(df)
    assert "isFinalPlan=true" in full, "adaptive plan did not finalize"
    # the localCheckpoint'd customer aggregate (r14: per-run, no
    # CacheManager entry) serves both its consumers (max scalar +
    # threshold filter) as the same checkpointed RDD — materialized
    # AQE stages print as leaf references in the final section, so the
    # RDD scan is only visible in the initial-plan section
    assert "Scan ExistingRDD" in full, "customer aggregate not reused"
    # the adaptive toString carries BOTH the final and the initial
    # plan — count only the final section below
    plan = full.split("== Initial Plan ==")[0]
    assert plan.count("BroadcastHashJoin") >= 2, "semi joins not broadcast"
    assert plan.count("LeftSemi") >= 2, "IN-subqueries not semi joins"
    # two live fact scans remain (frequent-item aggregation and the
    # target-year pass); the customer aggregate's own scan happened
    # once, inside the checkpoint materialization
    assert plan.count("lineitem.parquet") == 2, \
        "UNION branches did not fold (or an aggregation re-scans)"
    assert "CartesianProduct" not in plan
    assert "EvalPython" not in plan


def test_ds_brand_monthly_report_broadcast_take_ordered(spark):
    """ds_brand_monthly_report (q3/q42/q52/q55 shape): pruned item dim
    broadcasts, ordered LIMIT is TakeOrderedAndProject (never a global
    sort), one fact scan."""
    plan = _plan(entrymod.queries()["ds_brand_monthly_report"](
        spark, SF_DIR))
    assert "BroadcastHashJoin" in plan, "item dim not broadcast"
    assert "TakeOrderedAndProject" in plan, "top-10 ran a global sort"
    assert plan.count("lineitem.parquet") == 1
    assert "EvalPython" not in plan


def test_ds_segment_priority_averages_dims_broadcast_one_exchange(spark):
    """ds_segment_priority_averages (q7/q26 shape): the customer and
    item dims broadcast; exactly ONE shuffle exchange (the brand
    group-by) plus the broadcast exchanges."""
    plan = _plan(entrymod.queries()["ds_segment_priority_averages"](
        spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 2, "dims not broadcast"
    import re
    shuffles = len(re.findall(r"Exchange hashpartitioning", plan))
    assert shuffles <= 2, f"{shuffles} hash exchanges — fact re-shuffled"
    assert "EvalPython" not in plan


def test_ds_monthly_deviation_filter_window_on_aggregate(spark):
    """ds_monthly_deviation_filter (q53/q63/q89 shape): the deviation
    window partitions by brand over AGGREGATE rows (hashpartitioning on
    p_brand), never a single global partition; one fact scan."""
    plan = _plan(entrymod.queries()["ds_monthly_deviation_filter"](
        spark, SF_DIR))
    assert "hashpartitioning(p_brand" in plan, \
        "deviation window not partitioned by brand"
    assert "SinglePartition" not in plan.split("TakeOrdered")[0], \
        "global single-task window leaked"
    assert plan.count("lineitem.parquet") == 1
    assert "EvalPython" not in plan


def test_ds_class_revenue_share_pushdown_and_agg_window(spark):
    """ds_class_revenue_share (q12/q20/q98 shape): the 30-day ship-date
    window reaches the fact scan (PushedFilters), the share window
    partitions by p_type over aggregate rows."""
    plan = _plan(entrymod.queries()["ds_class_revenue_share"](
        spark, SF_DIR))
    pushed = plan.split("PushedFilters:")[1][:400]
    assert "l_shipdate" in pushed, "date window not pushed to the scan"
    assert "hashpartitioning(p_type" in plan, \
        "share window not partitioned by class"
    assert plan.count("lineitem.parquet") == 1
    assert "EvalPython" not in plan


def test_ds_multi_supplier_noreturn_one_scan_no_semi_joins(spark):
    """ds_multi_supplier_noreturn (q16/q94 shape): both correlated
    EXISTS collapse into the per-order aggregate — ONE fact scan, no
    row-level semi/anti join of the fact against itself."""
    plan = _plan(entrymod.queries()["ds_multi_supplier_noreturn"](
        spark, SF_DIR))
    assert plan.count("lineitem.parquet") == 1, "EXISTS re-scanned fact"
    assert "LeftAnti" not in plan, "NOT EXISTS ran as an anti join"
    assert "EvalPython" not in plan


def test_ds_sold_returned_repurchased_one_scan_no_self_join(spark):
    """ds_sold_returned_repurchased (q25/q29 shape): the textbook
    three-instance fact self-join must fold to ONE fact scan of
    conditional per-channel aggregates — no join between fact-derived
    streams; the segment dim broadcasts."""
    plan = _plan(entrymod.queries()["ds_sold_returned_repurchased"](
        spark, SF_DIR))
    assert plan.count("lineitem.parquet") == 1, "fact scanned per channel"
    assert "SortMergeJoin" not in plan, "fact-sized self-join leaked"
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan


def test_ds_inventory_pivot_ratio_pushdown_one_scan(spark):
    """ds_inventory_pivot_ratio (q21/q40 shape): the one-year window
    reaches the fact scan; the before/after pivot is conditional sums
    in ONE pass; the part dim broadcasts onto aggregate rows."""
    plan = _plan(entrymod.queries()["ds_inventory_pivot_ratio"](
        spark, SF_DIR))
    pushed = plan.split("PushedFilters:")[1][:400]
    assert "l_shipdate" in pushed, "year window not pushed"
    assert plan.count("lineitem.parquet") == 1
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan


def test_ds_weekday_sales_pivot_single_pass(spark):
    """ds_weekday_sales_pivot (q43 shape): seven weekday buckets from
    ONE fact pass (conditional sums, two-phase aggregate), supplier dim
    broadcast, ordered LIMIT via TakeOrderedAndProject."""
    plan = _plan(entrymod.queries()["ds_weekday_sales_pivot"](
        spark, SF_DIR))
    assert plan.count("lineitem.parquet") == 1, "a bucket re-scanned"
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "EvalPython" not in plan


def test_ds_return_ratio_vs_state_broadcast_not_window(spark):
    """ds_return_ratio_vs_state (q30/q81 shape): the correlated state
    average decorrelates to per-nation stats broadcast-joined BACK to
    the customer rollup — ONE fact scan (the textbook replays the
    derived table per correlated subquery), and NO window partitioned
    by nation (one nation's whole customer population in a single task
    at 100 TB)."""
    plan = _plan(entrymod.queries()["ds_return_ratio_vs_state"](
        spark, SF_DIR))
    # the localCheckpoint'd customer rollup (r14) serves both
    # consumers as ONE shared checkpointed RDD; no live fact scan
    # remains in the serving plan
    assert plan.count("Scan ExistingRDD") >= 2, \
        "customer rollup not reused via the shared checkpoint"
    assert "lineitem.parquet" not in plan, "a consumer re-scans the fact"
    assert "BroadcastHashJoin" in plan, "nation stats not broadcast"
    assert "Window" not in plan, "nation-partitioned window leaked"
    assert "EvalPython" not in plan


def test_ds_rollup_level_averages_expand_partial_agg(spark):
    """ds_rollup_level_averages (q18/q22/q27 shape): the ROLLUP runs
    through Expand with map-side partial aggregation (sums+counts
    decompose; the quotient is post-aggregate); all dims broadcast."""
    plan = _plan(entrymod.queries()["ds_rollup_level_averages"](
        spark, SF_DIR))
    assert "Expand" in plan, "ROLLUP lost its Expand"
    assert "partial_" in plan.lower() or "HashAggregate" in plan
    assert plan.count("BroadcastHashJoin") >= 3, "a dim was shuffled"
    assert plan.count("lineitem.parquet") == 1
    assert "EvalPython" not in plan


def test_ds_hour_band_user_counts_map_side_residual(spark):
    """ds_hour_band_user_counts (q96 shape): the demographic filter is
    a scan residual (no join to produce it), the band aggregate is
    two-phase over the events fact."""
    plan = _plan(entrymod.queries()["ds_hour_band_user_counts"](
        spark, SF_DIR))
    assert plan.count("events.parquet") == 1
    assert "HashAggregate" in plan
    assert "Join" not in plan, "a join crept into a single-fact count"
    assert "EvalPython" not in plan


def test_ds_acctbal_band_geography_dim_only_broadcast(spark):
    """ds_acctbal_band_geography (q84/q8/q15 shape): a dim-only chained
    lookup — the region pin prunes nations before the customer join,
    both lookups broadcast, the acctbal band pushes to the customer
    scan."""
    plan = _plan(entrymod.queries()["ds_acctbal_band_geography"](
        spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 2, "lookup not broadcast"
    pushed = plan.split("PushedFilters:")[1][:400]
    assert "c_acctbal" in pushed, "band filter not pushed"
    assert "lineitem" not in plan, "a fact scan in a dim-only query"
    assert "EvalPython" not in plan


def test_ds_customer_best_order_window_argmax_one_scan(spark):
    """ds_customer_best_order (q79 shape): the per-customer argmax is a
    rank window over the order-grain AGGREGATE (the textbook
    re-aggregates the derived table and joins back) — one fact scan,
    customer-partitioned window, customer dim broadcast."""
    plan = _plan(entrymod.queries()["ds_customer_best_order"](
        spark, SF_DIR))
    assert plan.count("lineitem.parquet") == 1, "derived table replayed"
    assert "hashpartitioning(o_custkey" in plan, \
        "argmax window not per-customer"
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan


def test_ds_net_of_returns_one_scan_both_sides(spark):
    """ds_net_of_returns (q93/q80 netting shape): the textbook
    sold-LEFT-JOIN-returns folds to conditional aggregates inside ONE
    (order, part) group-by — one fact scan, no self-join of
    fact-derived streams, no nested loop."""
    plan = _plan(entrymod.queries()["ds_net_of_returns"](spark, SF_DIR))
    assert plan.count("lineitem.parquet") == 1, "fact scanned per side"
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan


def test_ds_weekly_dow_ratio_yoy_lag_window_one_scan(spark):
    """ds_weekly_dow_ratio_yoy (q2 shape): the year-over-year pairing is
    a lag window over the (year, weekday) aggregate — the textbook's
    second aggregate instance must not exist (one orders scan), and no
    self-join of aggregates appears."""
    plan = _plan(entrymod.queries()["ds_weekly_dow_ratio_yoy"](
        spark, SF_DIR))
    assert plan.count("orders.parquet") == 1, "aggregate instantiated twice"
    assert "SortMergeJoin" not in plan, "self-join of aggregates leaked"
    assert "EvalPython" not in plan


def test_ds_paid_above_global_avg_broadcast_scalar(spark):
    """ds_paid_above_global_avg (q24 shape): the global (N, total)
    threshold reduces from the checkpointed aggregate and attaches as
    a one-row broadcast (BroadcastNestedLoopJoin or BroadcastExchange)
    — the fact is scanned once; the aggregate feeds both consumers as
    the SAME localCheckpoint'd RDD (r14)."""
    plan = _plan(entrymod.queries()["ds_paid_above_global_avg"](
        spark, SF_DIR))
    assert plan.count("Scan ExistingRDD") >= 2, \
        "aggregate not reused via the shared checkpoint"
    assert ("BroadcastNestedLoopJoin" in plan
            or "BroadcastExchange" in plan)
    assert "lineitem.parquet" not in plan, "a consumer re-scans the fact"
    assert "EvalPython" not in plan


def test_ds_channel_missing_attr_counts_one_scan_left_broadcast(spark):
    """ds_channel_missing_attr_counts (q76 shape): the three-branch
    UNION folds to ONE fact scan (channel is a column); the pruned dim
    attaches as a broadcast LEFT join."""
    plan = _plan(entrymod.queries()["ds_channel_missing_attr_counts"](
        spark, SF_DIR))
    assert plan.count("lineitem.parquet") == 1, "union re-scanned fact"
    assert "BroadcastHashJoin" in plan and "LeftOuter" in plan
    assert "EvalPython" not in plan


def test_ds_returns_window_overlap_one_scan_conditional(spark):
    """ds_returns_window_overlap (q83 shape): the three derived-table
    instances fold to one scan of conditional counts — no join between
    fact-derived streams."""
    plan = _plan(entrymod.queries()["ds_returns_window_overlap"](
        spark, SF_DIR))
    assert plan.count("lineitem.parquet") == 1, "fact scanned per window"
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan


def test_ds_segment_priority_loss_pushdown_broadcast(spark):
    """ds_segment_priority_loss (q91 shape): month window + return flag
    push to the fact scan; the customer dim broadcasts."""
    plan = _plan(entrymod.queries()["ds_segment_priority_loss"](
        spark, SF_DIR))
    pushed = plan.split("PushedFilters:")[1][:400]
    assert "l_returnflag" in pushed or "l_shipdate" in pushed
    assert "BroadcastHashJoin" in plan
    assert plan.count("lineitem.parquet") == 1
    assert "EvalPython" not in plan


def test_sketch_qsketch_double_capped_map_side(spark):
    """sketch_qsketch_double: the double-bucket build must map-side
    combine to the capped cell space before the exchange (two-phase
    HashAggregate), stay fully JVM-side, and window only the sketch."""
    plan = _plan(entrymod.queries()["sketch_qsketch_double"](
        spark, SF_DIR))
    assert "HashAggregate" in plan
    assert "EvalPython" not in plan, "bucket math fell out of codegen"
    assert plan.count("events.parquet") == 1


def test_dedup_edit_verify_lsh_only_no_python(spark):
    """dedup_edit_verify: the O(L^2) verifier must run ONLY on LSH
    candidate pairs — no cartesian/nested-loop anywhere — and the
    Levenshtein kernel stays JVM-side (no Python evaluation)."""
    plan = _plan(entrymod.queries()["dedup_edit_verify"](spark, SF_DIR))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "EvalPython" not in plan, "verifier fell out of codegen"


def test_ds_brand_nation_mismatch_residual_broadcast(spark):
    """ds_brand_nation_mismatch (q19 shape): the cross-dim inequality is
    a residual on the joined row (hash joins only, no nested loop); all
    dims broadcast; one fact scan."""
    plan = _plan(entrymod.queries()["ds_brand_nation_mismatch"](
        spark, SF_DIR))
    assert plan.count("BroadcastHashJoin") >= 3, "dims not broadcast"
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("lineitem.parquet") == 1
    assert "EvalPython" not in plan


def test_ds_warehouse_mode_lag_buckets_one_scan(spark):
    """ds_warehouse_mode_lag_buckets (q99 shape): the four delay bands
    are conditional counts in ONE pass (no per-band re-scan, no
    explode), supplier dim broadcast."""
    plan = _plan(entrymod.queries()["ds_warehouse_mode_lag_buckets"](
        spark, SF_DIR))
    assert plan.count("lineitem.parquet") == 1, "a band re-scanned"
    assert "Generate" not in plan, "band pivot exploded rows"
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan


def test_ds_rollup_level_rank_window_on_rollup_rows(spark):
    """ds_rollup_level_rank (q86 shape): ROLLUP through Expand; the
    lochierarchy rank window runs over rollup rows only (partition keys
    include the grouping level, never the fact)."""
    plan = _plan(entrymod.queries()["ds_rollup_level_rank"](
        spark, SF_DIR))
    assert "Expand" in plan, "ROLLUP lost its Expand"
    assert "hashpartitioning(lochierarchy" in plan, \
        "rank window not partitioned by grouping level"
    assert plan.count("lineitem.parquet") == 1
    assert "EvalPython" not in plan


def test_ds_brand_hourband_channels_union_folds(spark):
    """ds_brand_hourband_channels (q71 shape): the three-branch UNION
    ALL folds to ONE fact scan (channel is a column); pruned item dim
    broadcast; ordered LIMIT via TakeOrderedAndProject."""
    plan = _plan(entrymod.queries()["ds_brand_hourband_channels"](
        spark, SF_DIR))
    assert plan.count("lineitem.parquet") == 1, "union re-scanned fact"
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    assert "EvalPython" not in plan


def test_ds_customer_channel_growth_one_scan_four_cells(spark):
    """ds_customer_channel_growth (q74 shape): the four year_total CTE
    instances fold to ONE fact scan of conditional sums — no self-join
    of aggregates, a single customer-grain exchange, customer dim
    broadcast."""
    plan = _plan(entrymod.queries()["ds_customer_channel_growth"](
        spark, SF_DIR))
    assert plan.count("lineitem.parquet") == 1, "CTE instantiated again"
    assert "SortMergeJoin" not in plan, "aggregate self-join leaked"
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan


def test_ds_county_active_profile_one_fact_scan_window_pushed(spark):
    """ds_county_active_profile (q10 own row): the textbook's THREE
    correlated EXISTS fact scans must fold to ONE orders scan with the
    four-month date window pushed to parquet; the 5-nation county gate
    attaches as a broadcast dim join."""
    plan = _plan(entrymod.queries()["ds_county_active_profile"](
        spark, SF_DIR))
    assert plan.count("orders.parquet") == 1, \
        "EXISTS trio re-scanned the fact"
    pushed = plan.split("PushedFilters:")
    assert any("o_orderdate" in seg[:400] for seg in pushed[1:]), \
        "date window did not reach the orders scan"
    assert "BroadcastHashJoin" in plan, "nation gate not broadcast"
    assert "EvalPython" not in plan


def test_ds_nation_revenue_salted_salt_in_shuffle_keys(spark):
    """ds_nation_revenue_salted: the nation leg must be a SHUFFLED hash
    join whose partitioning keys include the salt (each nation split
    across 8 reducers), with the 25-row build side replicated via
    explode — not broadcast (which would make the salt a no-op)."""
    plan = _plan(entrymod.queries()["ds_nation_revenue_salted"](
        spark, SF_DIR))
    assert "__salt" in plan, "salt column missing from the plan"
    # the salt must be a co-key of the SAME exchange clause (r12 advice:
    # a trailing "__salt" elsewhere in the plan must not satisfy this)
    import re as _re
    assert _re.search(r"hashpartitioning\(nk[^)]*__salt", plan), \
        "salt not part of the join shuffle keys"
    assert "ShuffledHashJoin" in plan, \
        "salted leg not planned as a shuffled hash join"
    assert "explode" in plan, "build-side salt replication missing"
    assert "EvalPython" not in plan


def test_pipeline_source_quality_gate_aqe_broadcast_no_global_sort(spark):
    """pipeline_source_quality_gate: per-source thresholds must come
    from the grouped sketch (group-partitioned windows over ≤ capped
    cells) and join back WITHOUT a forced hint — executed here so AQE's
    size check is what chooses broadcast at test SFs (r12 un-hinting);
    no corpus-wide sort anywhere."""
    df = entrymod.queries()["pipeline_source_quality_gate"](
        spark, SF_DIR)
    df.collect()
    plan = _plan(df).split("== Initial Plan ==")[0]
    assert "isFinalPlan=true" in _plan(df), "adaptive plan did not finalize"
    assert "BroadcastHashJoin" in plan, \
        "AQE did not broadcast the threshold table"
    assert "rangepartitioning" not in plan.lower().replace(
        "rangepartitioning(bucket_lo", ""), "corpus-wide sort leaked"
    assert "EvalPython" not in plan


def test_sketch_cms_grouped_capped_map_side_one_scan(spark):
    """sketch_cms_grouped: the per-source counter build must map-side
    combine to the ≤ 192-cells-per-source space before the exchange
    (two-phase HashAggregate), stay fully JVM-side, read the documents
    fact ONCE live (the candidate picker reuses the same word-frequency
    aggregate), and use the two-stage bounded ranking (__pid) rather
    than a per-source full-vocabulary sort."""
    plan = _plan(entrymod.queries()["sketch_cms_grouped"](
        spark, SF_DIR))
    assert "HashAggregate" in plan
    assert "EvalPython" not in plan, "hash math fell out of codegen"
    assert "__pid" in plan, "candidate picker not two-stage bounded"
    assert "CartesianProduct" not in plan


def test_mv_sql_substitution_scans_tile_never_fact(spark):
    """Front-door MV substitution (r13): the executed plan of the
    SQL-served query must scan ONLY the tile parquet — the fact table
    (orders.parquet) must be completely absent, the exact plan shape
    Calcite's AbstractMaterializedViewRule produces."""
    df = entrymod.queries()["mv_sql_substitution"](spark, SF_DIR)
    plan = _plan(df)
    assert "mv_sql_tile" in plan, "tile scan missing from the plan"
    assert "orders.parquet" not in plan, \
        "fact table scanned despite MV substitution"


def test_sql_date_range_rewrite_pushes_to_scan(spark):
    """DateRangeRules port (r13): the rewritten EXTRACT(YEAR)=1996
    predicate must reach the parquet scan as a pushed half-open range
    on o_orderdate — the whole point of the rewrite (row-group min/max
    skipping + partition pruning at scale)."""
    df = entrymod.queries()["sql_date_range_rewrite"](spark, SF_DIR)
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters:")[1][:400]
    assert "GreaterThanOrEqual(o_orderdate" in pushed, \
        "range lower bound did not reach the scan"
    assert "LessThan(o_orderdate" in pushed, \
        "range upper bound did not reach the scan"


def test_shorthand_pair_range_pushes_to_scan(spark):
    """The date-shorthand normalization (r13 late): a
    ``month(d) = m AND year(d) = y`` pair — the spelling users write —
    must fold through the same pair rule as the extract form and land
    as one month-wide half-open range in the parquet scan's
    PushedFilters."""
    from drill_calcite_spark.catalog import register_tables
    from drill_calcite_spark.sql import calcite_sql

    register_tables(spark, SF_DIR)
    df = calcite_sql(spark, """
        SELECT count(*) AS n FROM orders
        WHERE month(o_orderdate) = 4 AND year(o_orderdate) = 1996
    """)
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    # the explain string truncates filter listings at
    # spark.sql.maxMetadataStringLength — the month-wide lower bound
    # is fully visible, the upper bound's column suffices (the fuzzer
    # lane proves the bound's VALUE; this pins that it reaches the scan)
    pushed = plan.split("PushedFilters:")[1].split("ReadSchema", 1)[0]
    assert "GreaterThanOrEqual(o_orderdate,1996-04-01" in pushed, \
        "shorthand pair lower bound did not reach the scan"
    assert "LessThan(o_orderdate" in pushed, \
        "shorthand pair upper bound did not reach the scan"


def test_mv_sql_join_substitution_never_reexecutes_join(spark):
    """Front-door join-MV substitution (r13): the executed plan must
    scan only the join tile — neither base table appears and no join
    operator of the two base relations exists in the plan."""
    df = entrymod.queries()["mv_sql_join_substitution"](spark, SF_DIR)
    plan = _plan(df)
    assert "mv_sql_join_tile" in plan, "join tile scan missing"
    assert "orders.parquet" not in plan and \
        "customer.parquet" not in plan, \
        "base table scanned despite join-MV substitution"


def test_mv_sql_having_substitution_gate_bites_both_ways(spark):
    """Front-door HAVING substitution (r13): the plan scans only the
    tile, and the HAVING gate is non-vacuous — it keeps SOME sources
    and cuts OTHERS (a threshold that filtered nothing, or everything,
    would make the hidden-measure path untested)."""
    df = entrymod.queries()["mv_sql_having_substitution"](spark, SF_DIR)
    plan = _plan(df)
    assert "mv_sql_having_tile" in plan
    assert "documents.parquet" not in plan, \
        "fact table scanned despite substitution"
    kept = {r.source for r in df.collect()}
    all_sources = {r.source for r in spark.read.parquet(
        f"{SF_DIR}/documents.parquet").select("source").distinct()
        .collect()}
    assert kept and kept < all_sources, \
        f"HAVING gate vacuous: kept {len(kept)} of {len(all_sources)}"


def test_mv_sql_daterange_substitution_composes(spark):
    """The two r13 front-door layers composing (r13 late): the
    YEAR+QUARTER conjunction folds to one sargable range, the
    substitution serves the aggregate from the tile, and the range
    atoms land in the TILE scan's PushedFilters — so the tile itself
    gets row-group min/max skipping. The fact table must be absent,
    and the distinct count must expand at tile grain (a count(distinct
    o_orderstatus) over the rolled group, visible as the two-phase
    distinct aggregate keyed by status below the final rollup)."""
    df = entrymod.queries()["mv_sql_daterange_substitution"](
        spark, SF_DIR)
    plan = _plan(df)
    assert "mv_sql_daterange_tile" in plan, "tile scan missing"
    assert "orders.parquet" not in plan, \
        "fact table scanned despite substitution"
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters:")[1][:400]
    assert "GreaterThanOrEqual(o_orderdate" in pushed, \
        "quarter range lower bound did not reach the tile scan"
    assert "LessThan(o_orderdate" in pushed, \
        "quarter range upper bound did not reach the tile scan"
    assert "count(distinct o_orderstatus" in plan, \
        "distinct count did not roll up from tile grain"


def test_mv_sql_topn_substitution_heap_over_tile(spark):
    """Front-door top-N substitution (r13): the plan must be a top-K
    heap (TakeOrderedAndProject) over the TILE rollup — no base scan,
    no global Sort of anything fact-sized."""
    df = entrymod.queries()["mv_sql_topn_substitution"](spark, SF_DIR)
    plan = _plan(df)
    assert "mv_sql_topn_tile" in plan
    assert "documents.parquet" not in plan, \
        "fact table scanned despite substitution"
    assert "TakeOrderedAndProject" in plan, \
        "LIMIT+ORDER BY did not plan as a top-K heap"


def test_mv_sql_rollup_substitution_expand_over_tile(spark):
    """Front-door ROLLUP substitution (r14): the multi-set aggregate
    runs over the TILE — the plan shows the grouping-sets Expand
    operator feeding the aggregate with the tile scan underneath, and
    the fact table is completely absent (AggregateStarTableRule's
    rollup-query serve). The grouping indicators must be computed in
    the plan (spark_grouping_id), not post-processed."""
    df = entrymod.queries()["mv_sql_rollup_substitution"](spark, SF_DIR)
    plan = _plan(df)
    assert "mv_sql_rollup_tile" in plan, "tile scan missing"
    assert "orders.parquet" not in plan, \
        "fact table scanned despite ROLLUP substitution"
    assert "Expand" in plan, "no grouping-sets Expand over the tile"
    assert "spark_grouping_id" in plan, \
        "grouping indicators not computed in-plan"
    # non-vacuous: subtotal AND grand-total rows exist with correct ids
    gids = {r.gid for r in df.collect()}
    assert {0, 1, 3} <= gids, f"rollup grouping sets incomplete: {gids}"


def test_mv_sql_groupingsets_substitution_gate_and_sets(spark):
    """Front-door GROUPING SETS substitution (r14): arbitrary set list
    (not a rollup prefix chain) over the tile via groupingSets(), with
    the hidden-measure HAVING filtering above the multi-set
    re-aggregation. Plan: tile scan + Expand, no fact scan; data: the
    gate keeps some grouping-set rows and cuts others, and the set
    list is exactly {(status,priority), (priority), ()}."""
    df = entrymod.queries()["mv_sql_groupingsets_substitution"](
        spark, SF_DIR)
    plan = _plan(df)
    assert "mv_sql_gsets_tile" in plan, "tile scan missing"
    assert "orders.parquet" not in plan, \
        "fact table scanned despite GROUPING SETS substitution"
    assert "Expand" in plan
    rows = df.collect()
    gids = {r.gid for r in rows}
    assert gids <= {0, 2, 3} and 0 in gids, \
        f"unexpected grouping-set ids: {gids}"
    # the avg gate must bite both ways: 21 grouping-set rows exist
    # pre-gate at every SF (3 statuses × 5 priorities + 5 + 1)
    assert 0 < len(rows) < 21, f"HAVING gate vacuous: {len(rows)} rows"


def test_mv_sql_subset_substitution_serves_from_join_tile(spark):
    """FK-derivable subset unification (r14): the single-table orders
    aggregate must be served from the orders⋈customer JOIN tile — the
    plan scans only the tile; orders.parquet (the only table the SQL
    names) and customer.parquet are both absent, and no join operator
    exists (the join was paid at materialization)."""
    df = entrymod.queries()["mv_sql_subset_substitution"](spark, SF_DIR)
    plan = _plan(df)
    assert "mv_sql_subset_tile" in plan, "join tile scan missing"
    assert "orders.parquet" not in plan and \
        "customer.parquet" not in plan, \
        "base table scanned despite FK-subset substitution"
    # residual status atom bites: only O and P statuses survive
    assert {r.o_orderstatus for r in df.collect()} == {"O", "P"}


def test_mv_sql_or_daterange_substitution_pushes_or(spark):
    """The `<>`-year composition (r14): the two-range disjunction the
    DateRangeRules rewrite emits must survive the substitution as a
    residual on the TILE and land in the tile scan's PushedFilters as
    Or(LessThan, GreaterThanOrEqual) — row-group min/max skipping on
    the tile itself. No fact scan."""
    df = entrymod.queries()["mv_sql_or_daterange_substitution"](
        spark, SF_DIR)
    plan = _plan(df)
    assert "mv_sql_or_tile" in plan, "tile scan missing"
    assert "orders.parquet" not in plan, \
        "fact table scanned despite OR-range substitution"
    assert "PushedFilters: [" in plan
    pushed = plan.split("PushedFilters:")[1].split("ReadSchema", 1)[0]
    assert "Or(" in pushed and "o_orderdate" in pushed, \
        "two-range disjunction did not reach the tile scan"
    # the complement bites: the excluded 1995 year is really gone
    assert df.count() > 0
