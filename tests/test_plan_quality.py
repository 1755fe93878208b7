"""Physical-plan regression guards: the oracle gate proves results right;
these prove the plans stay the plans we designed for 100 TB (pushdown,
pruning, broadcast, top-k codegen, no cartesian products). A future edit
that silently turns a broadcast join into a cartesian product would still
pass the oracle — it would just be 1000× slower at scale; this suite is
what catches it."""

import pytest

from poc_juma_etl_spark import all_queries

from .conftest import SF_ORACLE

SPECS = all_queries()


def plan_of(spark, name: str) -> str:
    df = SPECS[name].fn(spark, SF_ORACLE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_q1_pushdown_and_pruning(spark):
    plan = plan_of(spark, "q1_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the 11-column table reads only the 7 needed
    assert "l_orderkey" not in plan.split("ReadSchema")[1][:400]
    assert "HashAggregate" in plan  # map-side partial + final


def test_q5_broadcasts_every_dim(spark):
    plan = plan_of(spark, "q5_region_nation_revenue")
    assert plan.count("BroadcastHashJoin") >= 4
    assert "CartesianProduct" not in plan


def test_global_topk_avoids_full_sort(spark):
    plan = plan_of(spark, "q_global_topk_orders")
    assert "TakeOrderedAndProject" in plan
    # corpus bigram top-20 must use the same top-k operator, never full sort
    assert "TakeOrderedAndProject" in plan_of(spark, "q_text_top_bigrams")


def test_broadcast_join_hint_respected(spark):
    plan = plan_of(spark, "q_broadcast_brand_volume")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_semi_anti_join_strategies(spark):
    assert "LeftSemi" in plan_of(spark, "q_semi_join_active_customers")
    assert "LeftAnti" in plan_of(spark, "q_anti_join_inactive_customers")


def test_decontaminate_broadcasts_eval_set(spark):
    # r8: the forced hint is gone (the stand-in eval slice is 1/97 of the
    # corpus — a mandatory broadcast OOMs at high SF), so the broadcast is
    # now AQE's runtime decision: assert it on the FINAL adaptive plan
    # after execution, where the measured eval side is small. At 100 TB
    # the same query degrades to a shuffle join instead of crashing.
    df = SPECS["q_text_decontaminate"].fn(spark, SF_ORACLE)
    df.collect()  # count() would plan a NEW query; collect finalizes THIS one
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "BroadcastHashJoin" in plan


def test_embedding_dedup_is_bucket_equijoin(spark):
    # the SRP rewrite's whole point: candidates come from a hash-joinable
    # bucket equality, never an inequality-only (nested-loop) join
    plan = plan_of(spark, "q_dedup_embedding_cosine")
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_pack_sequences_partitions_by_shard(spark):
    # packing must window per source shard — a global (single-partition)
    # window would serialize the whole corpus through one task
    plan = plan_of(spark, "q_text_pack_sequences")
    assert "SinglePartition" not in plan


def test_range_frame_window_is_partitioned(spark):
    # the interval RANGE frame must run per customer partition — a global
    # (single-partition) window would serialize all orders through one task
    plan = plan_of(spark, "q_window_range_frame")
    assert "Window" in plan
    assert "SinglePartition" not in plan.split("Window")[0][-600:]


def test_histogram_bounds_ride_a_broadcast(spark):
    # pass one reduces to 2 scalars; pass two must consume them via a
    # broadcast nested-loop (1-row build side), never a shuffle join
    plan = plan_of(spark, "q_histogram_prices")
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_dq_audit_uses_anti_joins(spark):
    # referential checks must be LEFT ANTI joins — a NOT IN rewrite can
    # degrade to a nested-loop under nullable keys
    plan = plan_of(spark, "q_dq_audit")
    assert "LeftAnti" in plan


def test_shuffle_hash_hint_respected(spark):
    # the fact-fact join must use ShuffledHashJoin (no sort phase), with
    # the dimension still broadcast
    plan = plan_of(spark, "q_shuffle_hash_join")
    assert "ShuffledHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan


def test_tfidf_query_side_broadcasts(spark):
    # the per-query-term weight table is tiny and must broadcast; the
    # full-vocab weight stream must never be the build side
    plan = plan_of(spark, "q_text_tfidf_search")
    assert "BroadcastHashJoin" in plan


def test_q8_market_share_broadcasts_all_dims(spark):
    # the 7-way star must broadcast all six non-fact sides; a sort-merge
    # join on any dimension would shuffle the fact once per dimension
    plan = plan_of(spark, "q8_market_share")
    assert plan.count("BroadcastHashJoin") >= 6
    assert "SortMergeJoin" not in plan or plan.count("SortMergeJoin") <= 1


def test_q21_blame_joins_are_hash_equi(spark):
    # EXISTS / NOT EXISTS must plan as hash semi/anti joins keyed on
    # l_orderkey with the suppkey inequality as a residual — never a
    # nested-loop over the fact
    plan = plan_of(spark, "q21_suppliers_kept_waiting")
    assert "LeftSemi" in plan and "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q6_filters_reach_the_scan(spark):
    # Q6 is the pushdown benchmark: shipdate/discount/quantity predicates
    # must all appear as PushedFilters on the parquet scan
    plan = plan_of(spark, "q6_forecast_revenue")
    pushed = plan.split("PushedFilters")[1][:300]
    assert "l_shipdate" in pushed and "l_discount" in pushed and "l_quantity" in pushed


def test_q16_not_in_rides_a_broadcast(spark):
    # the 6-row negative-balance supplier set must broadcast for the
    # anti-join; shuffling 60k (→ billions at scale) lineitem rows against
    # 6 rows would be absurd
    plan = plan_of(spark, "q16_supplier_counts")
    assert "BroadcastHashJoin" in plan


# every read-only query swept for accidental cartesian products — including
# the embedding near-dup, whose SRP-bucket equi-join is its own scale plan.
# q_stream_* are excluded: invoking them drains a real stream (their batch
# convergence is oracle-gated instead).
SWEEP = [
    n
    for n in SPECS
    if n.startswith("q") and "e2e" not in n and not n.startswith("q_stream_")
]


@pytest.mark.parametrize("name", sorted(SWEEP), ids=str)
def test_no_cartesian_product_or_global_window(spark, name):
    plan = plan_of(spark, name)
    assert "CartesianProduct" not in plan, name
    # no partition-less windowspec anywhere in the registry: a global window
    # moves ALL rows to a single partition — fine on a 3-row summary today,
    # a 100 TB serialization point the day someone feeds it a corpus. A
    # spec whose first argument is already a sort direction has no
    # partition keys.
    for start in _iter_windowspec_args(plan):
        first_arg = _first_toplevel_arg(plan, start)
        assert not (
            first_arg.endswith(" ASC NULLS FIRST")
            or first_arg.endswith(" ASC NULLS LAST")
            or first_arg.endswith(" DESC NULLS FIRST")
            or first_arg.endswith(" DESC NULLS LAST")
        ), f"{name}: partition-less window: {first_arg[:120]}"


def _iter_windowspec_args(plan):
    """Offsets just past each 'windowspecdefinition(' in the plan."""
    needle = "windowspecdefinition("
    i = plan.find(needle)
    while i != -1:
        yield i + len(needle)
        i = plan.find(needle, i + 1)


def _first_toplevel_arg(plan: str, start: int) -> str:
    """The windowspec's first argument with balanced parens/brackets —
    a first partition expression like cast(x#3 as bigint) must come back
    whole, not truncated at its inner ')' (which would silently defeat
    the sort-direction check below)."""
    depth = 0
    for j in range(start, len(plan)):
        ch = plan[j]
        if ch in "([":
            depth += 1
        elif ch in ")]":
            if depth == 0:
                return plan[start:j]
            depth -= 1
        elif ch == "," and depth == 0:
            return plan[start:j]
    return plan[start:]


def test_first_toplevel_arg_handles_nested_parens():
    # the guard itself is load-bearing: a parenthesized first partition key
    # must not be truncated into a never-matching fragment
    s = "windowspecdefinition(cast(x#3 as bigint), y#4 ASC NULLS FIRST, frame())"
    (start,) = _iter_windowspec_args(s)
    assert _first_toplevel_arg(s, start) == "cast(x#3 as bigint)"
    s2 = "windowspecdefinition(cast(x#3 as bigint) ASC NULLS FIRST, frame())"
    (start2,) = _iter_windowspec_args(s2)
    assert _first_toplevel_arg(s2, start2).endswith(" ASC NULLS FIRST")


def test_winnow_is_shuffle_free(spark):
    # winnowing is document-local: the whole fingerprint query must be an
    # in-row map + sort — no window operator, no hash-partitioned exchange
    # (the window formulation this replaced shuffled every shingle hash)
    plan = plan_of(spark, "q_text_winnow_fingerprint")
    assert "Window" not in plan
    assert "hashpartitioning" not in plan


def test_vocab_is_topk_and_broadcast(spark):
    # the top-V vocabulary must come from a top-k (never a full sort of the
    # frequency table) and must ride a broadcast back over the token stream
    plan = plan_of(spark, "q_text_vocab_coverage")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan


def test_salted_join_shuffles_on_salted_key(spark):
    # the whole point of the salt: a shuffled hash join on (key, salt) —
    # a broadcast would bypass the salt and make the demo a lie
    plan = plan_of(spark, "q_salted_skew_join")
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan


def test_frame_sample_is_arrow_map(spark):
    # the frame kernel must be an Arrow-batched python map, not a UDF row path
    plan = plan_of(spark, "q_multimodal_frame_sample")
    assert "MapInPandas" in plan


def test_ivf_assign_is_map_only(spark):
    # cell assignment must be a narrow codegen map over the centroid
    # literal: no hash-partitioned exchange, no window, no python — the
    # only exchange allowed is the presentation sort's range partitioning
    plan = plan_of(spark, "q_ann_ivf_assign")
    assert "hashpartitioning" not in plan
    assert "Window" not in plan
    assert "MapInPandas" not in plan and "BatchEvalPython" not in plan


def test_pq_adc_broadcasts_query_luts(spark):
    # the 10-query LUT side must ride a broadcast across the code scan
    # (non-equi join -> nested-loop is fine with a 10-row build side);
    # a sort-merge join would shuffle the full corpus codes
    plan = plan_of(spark, "q_ann_pq_adc")
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_mixture_windows_per_source_and_broadcasts_totals(spark):
    # the budget cumsum must run per source partition, and both 1-row
    # aggregates (corpus tokens, weight sum) must ride broadcasts
    plan = plan_of(spark, "q_sample_mixture")
    assert "Window" in plan
    assert "SinglePartition" not in plan.split("Window")[0][-600:]
    assert plan.count("BroadcastNestedLoopJoin") >= 2


def test_cms_lookup_rides_a_broadcast(spark):
    # the 3x512 sketch is tiny and must broadcast to the candidate lookups;
    # shuffling the lookups against it would add a pointless exchange
    plan = plan_of(spark, "q_sketch_cms_heavy_hitters")
    assert "BroadcastHashJoin" in plan


def test_token_budget_window_is_partition_parallel(spark):
    # the global ordered cumsum must run as per-partition windows keyed on
    # the range-partition id — a windowspec with NO partition key would pull
    # the whole corpus through one task at 100 TB
    plan = plan_of(spark, "q_sample_token_budget")
    assert "windowspecdefinition(pid#" in plan
    assert "BroadcastHashJoin" in plan  # offsets ride a broadcast


def test_interval_overlap_is_bin_equijoin(spark):
    # the range join must candidate-generate through the bin equi-join —
    # never a nested-loop over the raw inequality predicate
    import re

    plan = plan_of(spark, "q_interval_overlap_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert re.search(r"(SortMergeJoin|BroadcastHashJoin|ShuffledHashJoin) \[bin#", plan)


def test_bloom_prune_probes_inline_and_broadcasts_truth(spark):
    # the bloom check itself is pure projection (literal bitmap, no join);
    # the only join in the plan is the broadcast ground-truth semi/outer
    plan = plan_of(spark, "q_bloom_filter_prune")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # nothing shuffles for the bloom path


def test_null_skew_join_routes_nulls_around_the_join(spark):
    # the split-union shape: a Union above (join leg, null leg); the null
    # leg must reach the Union without any join operator over it
    plan = plan_of(spark, "q_outer_join_null_skew")
    assert "Union" in plan
    assert "LeftOuter" in plan or "BroadcastHashJoin" in plan


# --------------------------------------------------------------------------
# Round-5 plan guards: the shapes the sf1 soak and the drift rewrite fixed.


def test_scd2_pit_is_carry_forward_not_candidate_join(spark):
    """The sf1 soak lesson pinned: the point-in-time lookup must be the
    merge-and-carry-forward window (one Union feeding a Window), never a
    keys x versions range-condition join (whose candidate fan-out ground
    a single task's hash map to 1.8 GB at sf1)."""
    plan = plan_of(spark, "q_scd2_point_in_time_join")
    assert "Window" in plan and "Union" in plan
    # the dim lookup must not appear as a non-equi join: every join in the
    # plan is an equi join (SortMerge/Hash/BroadcastHash all print join
    # keys; a range-only condition would force BroadcastNestedLoop)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_table_fingerprint_has_no_wide_shuffle(spark):
    """Commutative hash sums need no hashpartitioning exchange — each
    table contributes one partial-agg row per partition; only the
    single-partition final merge moves data."""
    plan = plan_of(spark, "q_table_fingerprint")
    assert "Exchange hashpartitioning" not in plan


def test_feature_drift_two_fact_scans(spark):
    """Bounds pass + one flagged bucketing pass: the cached tiny tables
    must absorb every other reference (the pre-cache form re-scanned the
    fact table five times)."""
    df = SPECS["q_feature_drift"].fn(spark, SF_ORACLE)
    df.count()  # materialize the scoped caches
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan
    from poc_juma_etl_spark.plans.queries import release_caches

    release_caches()


def test_triplet_mining_broadcasts_anchor_set(spark):
    plan = plan_of(spark, "q_triplet_mining")
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "CartesianProduct" not in plan


def test_containment_uses_posting_lists_not_self_join(spark):
    """Candidate pairs come from in-row posting-list expansion (Generate/
    explode over collect_list), never a shingle-table self-join."""
    plan = plan_of(spark, "q_dedup_containment")
    assert "Generate explode" in plan or "Generate" in plan
    assert "CartesianProduct" not in plan


def test_kmv_sketch_is_takeordered_over_partial_distinct(spark):
    """The round-10-queue KMV sketch must keep its mergeable shape: the
    segment predicate pushed to the parquet scan, a 2-column ReadSchema,
    partial+final HashAggregate for the distinct, and TakeOrderedAndProject
    (per-partition bottom-k heaps = the KMV merge) — never a global sort."""
    from poc_juma_etl_spark.catalog import load_table
    from poc_juma_etl_spark.operators.kmv import K, PRED_A, SPARK_H44

    df = (
        load_table(spark, SF_ORACLE, "orders")
        .where(PRED_A)
        .selectExpr(f"{SPARK_H44} AS h")
        .distinct()
        .orderBy("h")
        .limit(K)
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert plan.count("HashAggregate") >= 2  # partial + final distinct
    assert "PushedFilters: [In(o_orderpriority" in plan
    read = plan.split("ReadSchema")[1][:200]
    assert "o_custkey" in read and "o_totalprice" not in read
