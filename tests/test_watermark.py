"""Watermark semantics in append mode: a window emits only in a batch
*after* the watermark passes its end, and events arriving behind the
watermark are dropped — the late-data contract of the streaming layer."""

import shutil
import tempfile

from pyspark.sql import functions as F


def _write_batch(spark, src, name, rows):
    # single parquet FILES: the file stream source ignores non-partition
    # subdirectories, so Spark's directory-per-write output would be invisible
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(src, exist_ok=True)
    table = pa.table(
        {
            "id": pa.array([r[0] for r in rows], pa.int64()),
            "v": pa.array([r[2] for r in rows], pa.float64()),
            "ts": pa.array(
                [__import__("datetime").datetime.fromisoformat(r[1]) for r in rows],
                pa.timestamp("us"),
            ),
        }
    )
    pq.write_table(table, f"{src}/{name}.parquet")


def test_watermark_drops_late_event(spark):
    tmp = tempfile.mkdtemp(prefix="wm_")
    src = f"{tmp}/src"

    def run(sink):
        stream = spark.readStream.schema("id long, v double, ts timestamp").parquet(src)
        agg = (
            stream.withWatermark("ts", "2 hours")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("ws"), "n")
        )
        got: dict[int, int] = {}

        def sink_batch(df, _epoch):
            for r in df.collect():
                got[r.ws.hour] = r.n

        q = (
            agg.writeStream.outputMode("append")
            .foreachBatch(sink_batch)
            .option("checkpointLocation", f"{tmp}/ckpt")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return got

    try:
        # run 1: events at 10:00 and 13:00 → watermark ends at 11:00:05
        # (availableNow may split files into several internal batches, so
        # the hour-10 window may emit during run 1 or only in run 2)
        _write_batch(
            spark, src, "b1",
            [(1, "2024-01-01 10:00:05", 1.0), (2, "2024-01-01 13:00:05", 1.0)],
        )
        emitted1 = run("wm_out1")

        # run 2: a LATE event for hour 10 (behind the 11:00 watermark) plus
        # an on-time 14:00 event
        _write_batch(
            spark, src, "b2",
            [(3, "2024-01-01 10:30:00", 1.0), (4, "2024-01-01 14:00:05", 1.0)],
        )
        emitted2 = run("wm_out2")

        # run 3: one more on-time event (16:00) so a further batch commits
        # and flushes any emission that lagged a batch behind the watermark
        _write_batch(spark, src, "b3", [(5, "2024-01-01 16:00:05", 1.0)])
        emitted3 = run("wm_out3")

        runs = (emitted1, emitted2, emitted3)
        # the invariant: hour 10 emits EXACTLY once across all runs, with
        # n=1 — the late event was dropped, the closed window never reopened
        hour10 = [e[10] for e in runs if 10 in e]
        assert hour10 == [1], f"late-data contract broken: {runs}"
        # a window the watermark never passed (16:00) must not emit
        for e in runs:
            assert 16 not in e
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
