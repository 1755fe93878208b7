"""Streaming q-digest maintenance (streaming/quantile.py): batch equality
against the batch operator AND its DuckDB oracle, micro-batch slicing
invariance, epoch-log idempotency under re-delivery, and the empty guard."""

import duckdb

from poc_juma_etl_spark.operators.qdigest import (
    q_sketch_quantile_digest,
    qdigest_oracle_sql,
)
from poc_juma_etl_spark.streaming.quantile import (
    merge_quantile_state,
    q_stream_quantile_digest,
    read_quantile_state,
    stream_quantile_state,
)

from .conftest import SF_ORACLE, SF_SMOKE


def test_stream_equals_batch_and_oracle(spark):
    got = [tuple(r) for r in q_stream_quantile_digest(spark, SF_ORACLE).collect()]
    batch = [tuple(r) for r in q_sketch_quantile_digest(spark, SF_ORACLE).collect()]
    assert got == batch
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{SF_ORACLE}/orders.parquet'"
    )
    want = [tuple(r) for r in con.execute(qdigest_oracle_sql()).fetchall()]
    assert got == want


def test_slicing_invariance(spark):
    """2 micro-batches and 5 micro-batches fold to the identical histogram
    (and therefore the identical digest) — the mergeability statement."""
    h2 = {
        (r.v, r.cnt) for r in stream_quantile_state(spark, SF_SMOKE, 2).collect()
    }
    h5 = {
        (r.v, r.cnt) for r in stream_quantile_state(spark, SF_SMOKE, 5).collect()
    }
    assert h2 == h5 and h2


def test_epoch_redelivery_is_idempotent(spark, tmp_path):
    """Re-applying the same epoch (the at-least-once restart case) must not
    double-count: the epoch id is the log key, so the overwrite lands on
    itself."""
    state = str(tmp_path / "state")
    df = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").limit(100)
    merge_quantile_state(state, df, 0)
    once = {(r.v, r.cnt) for r in read_quantile_state(spark, state).collect()}
    merge_quantile_state(state, df, 0)  # redelivery of epoch 0
    twice = {(r.v, r.cnt) for r in read_quantile_state(spark, state).collect()}
    assert once == twice
    merge_quantile_state(state, df, 1)  # a genuinely new epoch DOES add
    three = dict(
        (r.v, r.cnt) for r in read_quantile_state(spark, state).collect()
    )
    assert three == {v: 2 * c for v, c in dict(once).items()}


def test_stream_quantile_empty_input(spark, tmp_path):
    empty = str(tmp_path / "sf_empty")
    spark.read.parquet(f"{SF_SMOKE}/orders.parquet").limit(0).write.parquet(
        f"{empty}/orders.parquet"
    )
    assert q_stream_quantile_digest(spark, empty).collect() == []
