"""TPC-H-extra coverage: approx-sketch error bounds and the bucketed-join
no-shuffle plan property (results are oracle-gated; these pin what the
oracle can't see)."""

from pyspark.sql import functions as F

from poc_juma_etl_spark import all_queries
from poc_juma_etl_spark.catalog import load_table

from .conftest import SF_ORACLE

SPECS = all_queries()


def test_approx_sketches_error_bounds(spark):
    """Round 5 moved the error-bound verification IN-PLAN: the query now
    emits exact counts plus boolean verdicts (and its oracle expects both
    TRUE). This test pins the exact columns against an independent
    computation and that the in-plan verdicts hold."""
    out = {r.event_type: r for r in SPECS["q_approx_sketches"].fn(spark, SF_ORACLE).collect()}
    exact = {
        r.event_type: r
        for r in load_table(spark, SF_ORACLE, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("users"),
        )
        .collect()
    }
    assert set(out) == set(exact)
    for et in exact:
        assert out[et].n_events == exact[et].n
        assert out[et].exact_users == exact[et].users
        assert out[et].hll_within_bounds is True, et
        assert out[et].p50_rank_within_bounds is True, et


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """The point of bucketing: the join plan must contain no Exchange on
    either side."""
    o = load_table(spark, SF_ORACLE, "orders")
    c = load_table(spark, SF_ORACLE, "customer")
    o.write.bucketBy(8, "o_custkey").sortBy("o_custkey").option(
        "path", str(tmp_path / "ob")
    ).mode("overwrite").saveAsTable("t_ob")
    c.write.bucketBy(8, "c_custkey").sortBy("c_custkey").option(
        "path", str(tmp_path / "cb")
    ).mode("overwrite").saveAsTable("t_cb")
    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the sort-merge path: with broadcast on, Catalyst broadcasts
        # the small side and ignores bucketing entirely (fine at this SF —
        # but the property under test is the 100TB fact-fact case)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        ob, cb = spark.table("t_ob"), spark.table("t_cb")
        joined = ob.join(cb, ob.o_custkey == cb.c_custkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, (
            f"bucketed join still shuffles:\n{plan[:2000]}"
        )
        assert joined.count() == o.count()  # FK join preserves fact rows
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.sql("DROP TABLE IF EXISTS t_ob")
        spark.sql("DROP TABLE IF EXISTS t_cb")
