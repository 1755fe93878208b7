"""Stream-static enrichment must converge to the equivalent batch join."""

from pyspark.sql import functions as F

from poc_juma_etl_spark.streaming.enrich import stream_enriched_tier_counts, user_tier_dim

from .conftest import SF_SMOKE


def test_stream_enrich_converges_to_batch(spark):
    got = {
        r.tier: (r.n_events, r.total_value)
        for r in stream_enriched_tier_counts(spark, SF_SMOKE).collect()
    }
    batch = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("user_id", "value")
        .join(F.broadcast(user_tier_dim(spark, SF_SMOKE)), "user_id", "left")
        .groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(25,6)")).cast("double").alias("total_value"),
        )
    )
    want = {r.tier: (r.n_events, r.total_value) for r in batch.collect()}
    assert got == want
    assert len(got) >= 2, "expected multiple tiers in the fixture"
