"""foreachBatch warehouse sink: stream lands exactly the batch rows; re-run
with the same checkpoint writes nothing (checkpoint) and a redelivered
uncommitted batch overwrites itself (epoch-keyed idempotent write)."""

from pyspark.sql import functions as F

from poc_juma_etl_spark.operators.range_replace import read_table
from poc_juma_etl_spark.streaming.sink import stream_events_to_warehouse, write_epoch

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
    # distinct event ids: the epoch-keyed path introduced no dup rows either
    assert read_table(spark, path).select("event_id").distinct().count() == src_count


def test_write_epoch_redelivery_idempotent(spark, tmp_path):
    """Simulate the foreachBatch at-least-once crash window: the same epoch
    delivered twice must leave the table identical, while a new epoch
    appends."""
    path = str(tmp_path / "wh")
    batch = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .limit(100)
    )
    write_epoch(batch, path, 0)
    n0 = read_table(spark, path).count()
    write_epoch(batch, path, 0)  # redelivery of the SAME epoch → no dupes
    assert read_table(spark, path).count() == n0
    write_epoch(batch, path, 1)  # a genuinely new epoch appends
    assert read_table(spark, path).count() == 2 * n0
