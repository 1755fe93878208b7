"""Streaming KMV sketch maintenance (streaming/sketch.py): batch-equality
(the future gate — same DuckDB oracle as the batch operator), mergeability
across different micro-batch slicings, and state-table boundedness."""

import duckdb

from poc_juma_etl_spark.operators.kmv import K, KMV_ORACLE
from poc_juma_etl_spark.streaming.sketch import (
    q_stream_kmv_sketch,
    stream_kmv_state,
)

from .conftest import SF_ORACLE


def test_stream_kmv_matches_duckdb_oracle(spark):
    """The exact check the registry gate will run in round 10: the stream's
    final estimates equal the one-pass batch SQL value for value."""
    got = [tuple(r) for r in q_stream_kmv_sketch(spark, SF_ORACLE).collect()]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF_ORACLE}/orders.parquet'")
    want = [tuple(r) for r in con.execute(KMV_ORACLE).fetchall()]
    assert got == want


def test_stream_kmv_merge_is_slicing_invariant(spark):
    """The KMV merge is associative and order-independent: the final state
    must be IDENTICAL whether the table arrives as 2 or 5 micro-batches."""
    two = stream_kmv_state(spark, SF_ORACLE, n_batches=2)
    five = stream_kmv_state(spark, SF_ORACLE, n_batches=5)
    assert two == five
    # and bounded: never more than k hashes per segment
    assert all(len(v) <= K for v in two.values())
    # sketches are sorted ascending (bottom-k, not any-k)
    assert all(v == sorted(v) for v in two.values())
