"""foreachBatch warehouse sink: stream lands exactly the batch rows; re-run
with the same checkpoint writes nothing (exactly-once via checkpoint)."""

from poc_juma_etl_spark.operators.range_replace import read_table
from poc_juma_etl_spark.streaming.sink import stream_events_to_warehouse

from .conftest import SF_SMOKE


def test_stream_sink_exactly_once(spark, tmp_path):
    path = str(tmp_path / "events_wh")
    ckpt = str(tmp_path / "ckpt")
    n1 = stream_events_to_warehouse(spark, SF_SMOKE, path, ckpt)
    assert n1 >= 1
    src_count = spark.read.parquet(f"{SF_SMOKE}/events.parquet").count()
    assert read_table(spark, path).count() == src_count
    # same checkpoint → no reprocessing, no duplicates
    stream_events_to_warehouse(spark, SF_SMOKE, path, ckpt)
    assert read_table(spark, path).count() == src_count
    # distinct event ids: the append path introduced no dup rows either
    assert read_table(spark, path).select("event_id").distinct().count() == src_count
