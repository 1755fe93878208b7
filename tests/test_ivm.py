"""Incremental join-view maintenance (plans/ivm.py): the full
Spark-vs-DuckDB parity its future driver gate will run, equivalence with a
direct full recompute, and the no-fact-rescan property of the dim repair."""

import duckdb

from pyspark.sql import functions as F

from poc_juma_etl_spark.catalog import load_table
from poc_juma_etl_spark.plans.ivm import (
    IVM_JOIN_ORACLE,
    NEW_SEGMENT,
    UPD_PRED,
    _join_view,
    etl_incremental_join_e2e,
)

from .conftest import SF_ORACLE


def test_ivm_join_matches_duckdb_oracle(spark):
    """The exact check the registry gate will run in round 10: the
    incrementally maintained view equals the oracle's FULL recompute."""
    got = [tuple(r) for r in etl_incremental_join_e2e(spark, SF_ORACLE).collect()]
    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_ORACLE}/{t}.parquet'")
    want = [tuple(r) for r in con.execute(IVM_JOIN_ORACLE).fetchall()]
    assert got == want
    assert len(got) > 0


def test_ivm_equals_direct_spark_recompute(spark):
    o = load_table(spark, SF_ORACLE, "orders")
    c = load_table(spark, SF_ORACLE, "customer").withColumn(
        "c_mktsegment",
        F.when(F.expr(UPD_PRED), F.lit(NEW_SEGMENT)).otherwise(
            F.col("c_mktsegment")
        ),
    )
    full = {tuple(r) for r in _join_view(o, c).collect()}
    inc = {tuple(r) for r in etl_incremental_join_e2e(spark, SF_ORACLE).collect()}
    assert inc == full


def test_update_really_changes_rows(spark):
    """The fixture exercises all three maintenance branches: some view rows
    are repaired (MIGRATED), some untouched, and the fact delta is
    non-empty."""
    rows = etl_incremental_join_e2e(spark, SF_ORACLE).collect()
    segs = {r.mktsegment for r in rows}
    assert NEW_SEGMENT in segs and len(segs) > 1
    migrated = sum(1 for r in rows if r.mktsegment == NEW_SEGMENT)
    assert 0 < migrated < len(rows)


def test_dim_repair_never_rescans_the_fact(spark):
    """The IVM point: a dimension-attribute update is repaired FROM THE
    VIEW — the repair subplan must not read the orders table."""
    import tempfile

    o = load_table(spark, SF_ORACLE, "orders")
    c = load_table(spark, SF_ORACLE, "customer")
    with tempfile.TemporaryDirectory() as tmp:
        _join_view(o.limit(1000), c).write.parquet(f"{tmp}/v1")
        j = spark.read.parquet(f"{tmp}/v1")
        changed = c.filter(UPD_PRED).select("c_custkey", "c_mktsegment")
        repaired = j.join(F.broadcast(changed), j.o_custkey == changed.c_custkey)
        plan = repaired._jdf.queryExecution().executedPlan().toString()
        assert "orders.parquet" not in plan
        assert "BroadcastHashJoin" in plan
