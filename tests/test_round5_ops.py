"""Round-5 operator tests: r4 ADVICE regressions (pagerank dangling-in
nodes, empty-fact dimension guard) and the round's new operators."""

import pytest
from pyspark.sql import functions as F

from .conftest import SF_SMOKE


def test_pagerank_keeps_zero_in_degree_nodes(spark):
    """A directed caller meeting the documented out-degree>=1 contract must
    not lose source-only nodes: a node nobody links to receives no
    messages but keeps the teleport term 0.15/n (r4 ADVICE — the old
    inner degree-join dropped it from the rank table entirely)."""
    from poc_juma_etl_spark.operators.graph import pagerank_top

    # node 0 has out-degree 1 and in-degree 0; nodes 1,2 form a 2-cycle
    edges = spark.createDataFrame([(0, 1), (1, 2), (2, 1)], "src long, dst long")
    ranks = {r.node: r.pr for r in pagerank_top(edges, iters=3, top=None).collect()}
    assert set(ranks) == {0, 1, 2}
    # pure teleport mass for the dangling-in node, every iteration
    assert ranks[0] == pytest.approx(0.15 / 3, abs=0, rel=0)
    assert ranks[1] > ranks[0] and ranks[2] > ranks[0]


def test_user_tier_dim_empty_fact_table(spark, tmp_path):
    """max(user_id) over an empty events table is NULL; the dimension must
    come back empty instead of crashing on int(None) (r4 ADVICE)."""
    from poc_juma_etl_spark.streaming.enrich import user_tier_dim

    empty_dir = str(tmp_path / "sf_empty")
    (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .limit(0)
        .write.parquet(f"{empty_dir}/events.parquet")
    )
    dim = user_tier_dim(spark, empty_dir)
    assert dim.count() == 0
    assert dim.columns == ["user_id", "tier"]
