"""Stream-static enrichment: an unbounded event stream joined to a static
(slowly-changing) dimension.

The most common production streaming join: the stream side is unbounded,
the dimension side is a plain batch DataFrame re-read per micro-batch and
broadcast to the stream tasks — no stream-side state, no watermark needed
(unlike the stream-stream join in streaming/join.py, nothing buffers).
With a table format underneath, dimension updates between micro-batches
are picked up automatically; on plain parquet the snapshot at query start
is used. The test drives the bounded stream and checks exact convergence
to the equivalent batch join + aggregation."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def user_tier_dim(spark: SparkSession) -> DataFrame:
    """Static dimension: user_id → tier (a deterministic derivation standing
    in for a customer-tier table)."""
    return spark.range(0, 1000).select(
        F.col("id").alias("user_id"),
        F.when(F.col("id") % 10 == 0, "gold")
        .when(F.col("id") % 3 == 0, "silver")
        .otherwise("bronze")
        .alias("tier"),
    )


def stream_enriched_tier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Drain the bounded events stream enriched with the tier dimension;
    returns per-tier event counts and decimal-exact value sums."""
    raw_schema = (
        "event_id long, ts long, user_id long, event_type string, value double, props string"
    )
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .select("event_id", "user_id", "value")
    )
    enriched = stream.join(F.broadcast(user_tier_dim(spark)), "user_id", "left")
    agg = enriched.groupBy("tier").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("total_value"),
    )
    sink = "stream_tier_out"
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)
