"""Stream-stream interval join must converge to the batch range join."""

from poc_juma_etl_spark import all_queries
from poc_juma_etl_spark.streaming.join import stream_close_event_pairs

from .conftest import SF_SMOKE


def test_stream_join_converges_to_batch(spark):
    stream_pairs = {
        (r.event_a, r.event_b, r.user_id, r.gap_s)
        for r in stream_close_event_pairs(spark, SF_SMOKE).collect()
    }
    batch_pairs = {
        (r.event_a, r.event_b, r.user_id, r.gap_s)
        for r in all_queries()["q_range_join_close_events"].fn(spark, SF_SMOKE).collect()
    }
    assert stream_pairs == batch_pairs
    assert stream_pairs, "no pairs found — join produced nothing"
