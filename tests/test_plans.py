"""Physical-plan regression tests: the plans that make these operators
scale must not silently degrade. Checks predicate pushdown, column
pruning, broadcast join selection, TakeOrderedAndProject top-k, and
broadcast semi/anti joins (SURVEY §4)."""

import re

import pytest

from wagtail_vector_index_spark.queries import QUERY_FNS

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    return (
        QUERY_FNS[name](spark, SF)._jdf.queryExecution().executedPlan().toString()
    )


def test_q1_pushdown_and_pruning(spark):
    plan = _plan(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    m = re.search(r"ReadSchema: (\S+)", plan)
    assert m, "no ReadSchema in plan"
    # only the 7 needed columns reach the scan — not the full table
    assert m.group(1).count(":") <= 8
    assert "l_orderkey" not in m.group(1)


def test_q3_broadcasts_and_topk(spark):
    plan = _plan(spark, "q3_shipping_priority")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_q5_star_join_all_broadcast(spark):
    plan = _plan(spark, "q5_region_revenue")
    assert plan.count("BroadcastHashJoin") >= 4
    assert "SortMergeJoin" not in plan


def test_knn_is_take_ordered_not_global_sort(spark):
    plan = _plan(spark, "knn_cosine")
    assert "TakeOrderedAndProject" in plan


def test_semi_anti_are_broadcast(spark):
    semi = _plan(spark, "q_semi_join")
    anti = _plan(spark, "q_anti_join")
    assert "LeftSemi" in semi and "BroadcastHashJoin" in semi
    assert "LeftAnti" in anti and "BroadcastHashJoin" in anti


def test_search_pipeline_broadcasts_fetchback(spark):
    plan = _plan(spark, "search_hash_knn")
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_asof_join_is_single_window_no_nested_loop(spark):
    """The as-of join must plan as union + one windowed sort per key —
    never a BroadcastNestedLoopJoin over the inequality predicate."""
    plan = _plan(spark, "q_asof_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Window" in plan
    assert "Union" in plan


def test_range_join_is_hash_join_not_nested_loop(spark):
    """The binned range join must hash-join on the bin key; a raw BETWEEN
    theta join would plan BroadcastNestedLoopJoin."""
    plan = _plan(spark, "q_range_join_bands")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan


def test_bm25_broadcasts_stats_and_df(spark):
    """Corpus stats and document frequencies are broadcast — the only
    wide shuffles are the two doc-id aggregations."""
    plan = _plan(spark, "text_bm25")
    assert plan.count("BroadcastHashJoin") + plan.count(
        "BroadcastNestedLoopJoin"
    ) >= 2  # df join + single-row stats cross join
    assert "SortMergeJoin" not in plan


def test_simhash_dense_is_jvm_broadcast_join(spark):
    """No Python stage and no shuffle exchange: fingerprints broadcast,
    pairs evaluated by the codegen'd bit_count(xor) predicate."""
    plan = _plan(spark, "dedup_simhash")
    assert "BroadcastNestedLoopJoin" in plan
    assert "ArrowEvalPython" not in plan and "FlatMapsInPandas" not in plan


def test_q6_all_predicates_pushed(spark):
    """TPC-H Q6 is the canonical pushdown query: every predicate must
    reach the parquet scan, and only the four needed columns are read."""
    plan = _plan(spark, "q6_forecast_revenue")
    # the plan string truncates long filter lists — assert the visible
    # prefix proves all three columns reached the scan
    assert (
        "PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_discount), "
        "IsNotNull(l_quantity), GreaterThanOrEqual(l_shipda" in plan
    )
    m = re.search(r"ReadSchema: (\S+)", plan)
    assert m and m.group(1).count(":") <= 4


def test_q10_broadcast_and_topk(spark):
    plan = _plan(spark, "q10_returned_items")
    assert "TakeOrderedAndProject" in plan
    assert "PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)" in plan


def test_q19_pushes_quantity_band_union_to_scan(spark):
    """The disjunctive brand/size/quantity bands must not block pushdown:
    Catalyst extracts the common quantity range (the union of the three
    bands) and pushes it to the lineitem scan; the join stays broadcast."""
    plan = _plan(spark, "q19_disjunctive_revenue")
    assert "PushedFilters" in plan and "l_quantity" in plan.split("PushedFilters")[1].split("]")[0]
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q21_semi_anti_shapes(spark):
    """The EXISTS/NOT EXISTS subqueries are replaced by per-order
    min/max supplier aggregations (r12): no semi/anti join remains —
    the old shape broadcast the full lineitem projection as a LeftSemi
    BUILD side, a non-starter at scale — and never a nested loop."""
    plan = _plan(spark, "q21_waiting_suppliers")
    assert "LeftSemi" not in plan and "LeftAnti" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "HashAggregate" in plan
    assert "TakeOrderedAndProject" in plan


def test_source_cap_uses_window_group_limit(spark):
    """The per-source cap must rank-prune inside each partition before the
    full sort materializes (WindowGroupLimit), not sort whole partitions."""
    plan = _plan(spark, "pipeline_source_cap")
    assert "WindowGroupLimit" in plan


def test_quality_classifier_is_pure_map(spark):
    """Model-based scoring is a single scan projection: no exchange, no
    join, no Python stage."""
    plan = _plan(spark, "text_quality_classifier")
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_semantic_dedup_assignment_is_arrow_map(spark):
    """Centroid assignment is a zero-shuffle Arrow-batched map stage —
    the first exchange in the semantic-dedup plan is the within-cluster
    pair join, not assignment."""
    plan = _plan(spark, "dedup_semantic")
    assert "ArrowEvalPython" in plan


def test_funnel_is_single_entity_shuffle_no_joins(spark):
    """The window-chained funnel shuffles ONCE on the entity key (plus the
    final single-row agg) and never joins the event table to itself."""
    plan = _plan(spark, "q_funnel_conversion")
    assert "Join" not in plan
    assert plan.count("Exchange") <= 2


def test_ann_ivf_filtered_pushes_label_filter(spark):
    """Filtered ANN: the metadata predicate must reach the parquet
    reader of the probed posting lists as a pushed filter (and the
    posting-list prune as partition filters) — not a post-scan drop."""
    plan = _plan(spark, "ann_ivf_filtered")
    assert "PushedFilters: [In(label" in plan or "PushedFilters: [IsNotNull(label), In(label" in plan or re.search(r"PushedFilters: \[[^\]]*label", plan)
    assert re.search(r"PartitionFilters: \[[^\]]*cid", plan)


def test_matryoshka_is_one_linear_plan(spark):
    """All five truncation levels (brute + 8/16/32/64) are computed in
    ONE scan projection and ranked by ONE rank-limited window over the
    exploded (level, sim) rows (r12): no per-level scan branches, no
    union, and the recall join is collect_set membership — not a
    broadcast self-join of a second scan of the vectors."""
    plan = _plan(spark, "knn_matryoshka_recall")
    assert "Union" not in plan
    assert "WindowGroupLimit" in plan
    # one vectors scan + one probe scan
    assert plan.count("Scan parquet") <= 2
