"""Streaming ingestion into the warehouse: foreachBatch + checkpointed
exactly-once.

The streaming twin of etl.run_table's batch load: a bounded (or unbounded)
event stream lands in the same parquet warehouse the batch writers maintain.
``foreachBatch`` hands each micro-batch to the engine's own writer, and the
checkpoint makes redelivery impossible — re-running the stream with the same
checkpoint location writes nothing new (the reference achieved idempotency
by delete+insert on every run, utils.py:391-398; a checkpointed stream
doesn't need to redo work to be safe).

Each batch lands date-partitioned via append; duplicate protection across
*restarts* comes from the checkpoint, duplicate protection across *manual
re-ingestion* comes from running R1 replace_range over the affected window —
the two compose (see tests/test_stream_sink.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.range_replace import append_table


def stream_events_to_warehouse(
    spark: SparkSession, sf_dir: str, table_path: str, checkpoint_dir: str
) -> int:
    """Drain the bounded events stream into a date-partitioned warehouse
    table; returns the number of micro-batches written. Safe to call again
    with the same checkpoint: already-committed batches are not reprocessed."""
    raw_schema = (
        "event_id long, ts long, user_id long, event_type string, value double, props string"
    )
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    )
    n_batches = [0]

    def write_batch(df: DataFrame, epoch_id: int) -> None:
        append_table(df, table_path, "ts")
        n_batches[0] += 1

    q = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return n_batches[0]
