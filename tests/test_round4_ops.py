"""Round-4 operator guards: the approx-percentile RFM default, the
large-graph PageRank branch, and other semantics the oracle gate can't see
(it always runs the oracle-parity paths)."""

from pyspark.sql import functions as F

from .conftest import SF_SMOKE


def test_rfm_sketch_path_tracks_exact(spark):
    # the operator DEFAULT is the approx_percentile sketch path (the 100 TB
    # design); the registered query pins exact=True for oracle parity. The
    # sketch cuts may move boundary users between adjacent segments, but
    # every user must still land in exactly one segment and the per-segment
    # drift must stay small at 1e-4 rank accuracy.
    from poc_juma_etl_spark.catalog import load_table
    from poc_juma_etl_spark.plans.behavior import rfm_segments

    from .conftest import SF_ORACLE

    # sf0.01, not the smoke fixture: with only ~15 purchasing users, the
    # approx cut (an actual data value) vs the interpolated exact cut moves
    # whole-quartile fractions of users; at 150 users the drift collapses
    # to boundary ties (measured: 2 of 150)
    ev = load_table(spark, SF_ORACLE, "events")
    exact = {r.segment: r.n_users for r in rfm_segments(ev, exact=True).collect()}
    approx = {r.segment: r.n_users for r in rfm_segments(ev).collect()}
    total = sum(exact.values())
    assert sum(approx.values()) == total
    drift = sum(
        abs(approx.get(s, 0) - exact.get(s, 0)) for s in set(exact) | set(approx)
    )
    assert drift <= max(4, 0.05 * total), (exact, approx)


def test_rfm_sketch_path_has_no_exact_percentile(spark):
    # the default path must compile to approx_percentile (mergeable sketch),
    # never the exact percentile aggregate that holds all values in the
    # final 1-row reduce
    from poc_juma_etl_spark.catalog import load_table
    from poc_juma_etl_spark.plans.behavior import rfm_segments

    ev = load_table(spark, SF_SMOKE, "events")
    plan = rfm_segments(ev)._jdf.queryExecution().optimizedPlan().toString()
    assert "approx_percentile" in plan
    assert "percentile(" not in plan.replace("approx_percentile(", "")


def test_semantic_dedup_keeps_cell_minimum(spark):
    # keep-first semantics: the lowest vec_id of every cell can never be
    # dominated (no lower-id cell-mate exists), so it must always survive;
    # and every cell retains at least one vector
    from poc_juma_etl_spark.operators.vectors import q_semantic_dedup
    from poc_juma_etl_spark.plans.queries import release_caches

    try:
        rows = q_semantic_dedup(spark, SF_SMOKE).collect()
    finally:
        release_caches()
    by_cell: dict[int, list] = {}
    for r in rows:
        by_cell.setdefault(r.cell, []).append(r)
    for cell, members in by_cell.items():
        lowest = min(members, key=lambda r: r.vec_id)
        assert lowest.kept, f"cell {cell}: min-id vector was dropped"
        assert any(r.kept for r in members)


def test_scalar_quantize_error_bounded_by_half_step(spark):
    # SQ8 guarantee: |recon - val| <= step/2 where step = (hi-lo)/255, so
    # per-dim SSE <= n * (step/2)^2 / ... with the 255-scaling, each
    # err_num is bounded by (hi-lo)/2 + rounding slack
    from poc_juma_etl_spark.operators.vectors import q_vector_scalar_quantize

    rows = q_vector_scalar_quantize(spark, SF_SMOKE).collect()
    assert len(rows) == 64
    for r in rows:
        step = (r.hi - r.lo) / 255.0
        max_sse = r.n_values * (step / 2 + 1) ** 2
        assert 0 <= r.sse <= max_sse, (r.pos, r.sse, max_sse)


def test_equidepth_histogram_is_equi_depth(spark):
    # decile buckets must each hold ~n/10 items (exact up to cut ties)
    from poc_juma_etl_spark.plans.extra5 import q_equidepth_histogram

    rows = q_equidepth_histogram(spark, SF_SMOKE).collect()
    n = sum(r.n_items for r in rows)
    assert len(rows) == 10
    for r in rows:
        assert abs(r.n_items - n / 10) <= max(2, 0.02 * n), (r.bucket, r.n_items)
    # buckets tile the value range in order
    for a, b in zip(rows, rows[1:]):
        assert a.hi_price <= b.lo_price


def test_pagerank_large_graph_branch_shuffles_node_side_only(spark):
    # the measured node-count switch (>500k nodes) re-cuts the edge list
    # hash-partitioned on src ONCE, so per-iteration joins shuffle only the
    # node-size contrib side. Fixture graphs never cross the threshold, so
    # force the branch with large_threshold=0 and assert its plan shape:
    # with broadcast joins disabled (emulating contrib too big to ship),
    # the large branch plans exactly ITERS src-exchanges (contrib side
    # only — the checkpointed edges keep their partitioning), while the
    # small branch re-shuffles the edge side too, planning 2×ITERS.
    from poc_juma_etl_spark.operators.graph import pagerank_top

    ITERS = 2
    edges = spark.createDataFrame(
        [(i, (i + 1) % 6) for i in range(6)] + [((i + 1) % 6, i) for i in range(6)],
        "src long, dst long",
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        small = pagerank_top(edges, iters=ITERS, top=3, large_threshold=500_000)
        large = pagerank_top(edges, iters=ITERS, top=3, large_threshold=0)
        # both branches converge to identical ranks (a 6-cycle: uniform pr)
        rows_s = [(r.node, round(r.pr, 9)) for r in small.collect()]
        rows_l = [(r.node, round(r.pr, 9)) for r in large.collect()]
        assert rows_s == rows_l

        def src_exchanges(df):
            # ENSURE_REQUIREMENTS only: the large branch's one-time
            # REPARTITION_BY_COL re-cut (visible inside the cached-plan
            # printout) is the idiom, not a per-iteration shuffle
            import re

            plan = df._jdf.queryExecution().executedPlan().toString()
            return len(
                re.findall(
                    r"Exchange hashpartitioning\(src[^)]*\), ENSURE_REQUIREMENTS", plan
                )
            )

        # large branch: exactly one src-shuffle per iteration — the contrib
        # (node-size) side; the cached re-cut feeds the edge side shuffle-free
        assert src_exchanges(large) == ITERS
        # small branch: the edge side shuffles too (AQE may dedupe repeats
        # into ReusedExchange, so assert presence, not an exact count)
        assert src_exchanges(small) > ITERS
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_cdc_apply_edge_ops(spark):
    # D on a key absent from the base is a no-op row (nothing to delete,
    # nothing inserted); I on an EXISTING key replaces it (upsert
    # semantics); an op sandwich U->D->U resurrects with the last payload
    from poc_juma_etl_spark.operators.merge import cdc_apply

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    changes = spark.createDataFrame(
        [
            (9, 1, "D", None),      # delete of unknown key
            (2, 1, "I", "b2"),      # insert-on-existing == replace
            (3, 1, "U", "x"),
            (3, 2, "D", None),
            (3, 3, "U", "c3"),      # resurrect: last write wins
        ],
        "k long, seq int, op string, v string",
    )
    rows = {r.k: (r.v, r.last_op) for r in cdc_apply(base, changes, "k").collect()}
    assert rows == {
        1: ("a", ""),
        2: ("b2", "I"),
        3: ("c3", "U"),
        # key 9: D won; no base row -> filtered out entirely
    }


def test_interval_overlap_counts_each_pair_once(spark):
    # a pair overlapping across SEVERAL shared bins must count exactly once:
    # intervals [0,7) and [1,4) share bins 0 — and with BIN=7 d couldn't
    # split, so craft starts spanning a bin boundary instead
    from pyspark.sql import functions as F

    BIN = 7
    a = spark.createDataFrame([(1, 5)], "id long, sa int")  # [5, 12) spans bins 0,1
    b = spark.createDataFrame([(6,)], "sb int")  # [6, 9) spans bins 0,1 too
    ab = a.withColumn(
        "bin", F.explode(F.sequence(F.expr(f"sa div {BIN}"), F.expr(f"(sa + 7 - 1) div {BIN}")))
    )
    bb = b.withColumn(
        "bin", F.explode(F.sequence(F.expr(f"sb div {BIN}"), F.expr(f"(sb + 3 - 1) div {BIN}")))
    )
    n = (
        ab.join(bb, "bin")
        .filter(
            (F.col("sa") < F.col("sb") + 3)
            & (F.col("sb") < F.col("sa") + 7)
            & (F.col("bin") == F.expr(f"greatest(sa, sb) div {BIN}"))
        )
        .count()
    )
    assert n == 1  # both bins match the raw join; the canonical filter dedupes


def test_bloom_prune_never_misses_and_fp_bounded(spark):
    # a Bloom filter has NO false negatives (every true match must pass)
    # and at 1008 bits / ~150 keys x 3 hashes the fill ratio keeps the
    # false-positive rate low — bound it loosely to catch hash-layout bugs
    from poc_juma_etl_spark.plans.extra5 import q_bloom_filter_prune

    rows = q_bloom_filter_prune(spark, SF_SMOKE).collect()
    total = sum(r.n_orders for r in rows)
    passed = sum(r.n_bloom_pass for r in rows)
    true = sum(r.n_true_match for r in rows)
    assert passed >= true  # no false negatives, aggregated
    for r in rows:
        assert r.n_bloom_pass >= r.n_true_match, r
    non_match = total - true
    fp = passed - true
    assert fp <= max(5, 0.2 * non_match), (fp, non_match)


def test_weighted_sample_monotone_under_upweight(spark):
    # raising every weight (threshold) must keep the old sample as a
    # subset — the property that makes hash sampling re-mixable. Verified
    # directly on the bucket/threshold formula over the fixture docs.
    from poc_juma_etl_spark.catalog import load_table
    from poc_juma_etl_spark.operators.sampling import sample_bucket

    d = load_table(spark, SF_SMOKE, "documents")
    b = d.select(
        "doc_id",
        sample_bucket(F.col("doc_id")).alias("bucket"),
        F.expr("(least(n_chars, 2000) * 500) div 2000").alias("t1"),
        F.expr("(least(n_chars, 2000) * 800) div 2000").alias("t2"),
    )
    rows = b.collect()
    kept1 = {r.doc_id for r in rows if r.bucket < r.t1}
    kept2 = {r.doc_id for r in rows if r.bucket < r.t2}
    assert kept1 <= kept2
    assert len(kept2) > len(kept1)  # up-weighting actually adds docs
