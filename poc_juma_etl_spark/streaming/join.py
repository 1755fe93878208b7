"""Stream-stream interval join: pairs of same-user events within a time
bound, computed incrementally.

The hardest streaming primitive the engine exposes: both sides are
unbounded, so each side buffers state and the watermark + time-range
condition bound how much state is retained (without them the join would
buffer forever — Spark rejects it in append mode). The batch twin is
q_range_join_close_events (plans/advanced.py); the test drives this bounded
stream and checks it converges to exactly the batch answer."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

RANGE_GAP_S = 300  # keep in lockstep with plans/advanced.q_range_join_close_events


def _event_stream(spark: SparkSession, sf_dir: str, alias: str) -> DataFrame:
    raw_schema = (
        "event_id long, ts long, user_id long, event_type string, value double, props string"
    )
    return (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .select(
            F.col("event_id").alias(f"{alias}_event_id"),
            F.col("user_id").alias(f"{alias}_user_id"),
            F.expr("timestamp_micros(ts div 1000)").alias(f"{alias}_ts"),
        )
    )


def stream_close_event_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the bounded stream-stream join; returns (event_a, event_b,
    user_id, gap_s) as a batch DataFrame."""
    left = _event_stream(spark, sf_dir, "a").withWatermark("a_ts", "1 hour")
    right = _event_stream(spark, sf_dir, "b").withWatermark("b_ts", "1 hour")
    joined = left.join(
        right,
        F.expr(
            f"""
            a_user_id = b_user_id AND
            b_ts > a_ts AND
            b_ts <= a_ts + INTERVAL {RANGE_GAP_S} SECONDS
            """
        ),
    ).select(
        F.col("a_event_id").alias("event_a"),
        F.col("b_event_id").alias("event_b"),
        F.col("a_user_id").alias("user_id"),
        (F.col("b_ts").cast("long") - F.col("a_ts").cast("long")).alias("gap_s"),
    )
    sink = "stream_pairs_out"
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)
