"""Custom stateful streaming operator via applyInPandasWithState.

The arbitrary-state escape hatch for operators that windowed aggregation
can't express (running per-key accumulators, custom eviction, ML feature
state). Demonstrated as a per-user running event counter + value sum: state
is one (count, total) pair per user, updated per micro-batch, emitted on
every update.

At scale the state store shards by key across executors (RocksDB-backed
state store on a real cluster); the pandas function only ever sees one key's
rows per call, so memory is bounded by the largest single-key batch.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _update_user_state(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [total]})


def streaming_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run the stateful counter over the bounded events stream; returns the
    final per-user totals (last state emitted per user)."""
    raw_schema = (
        "event_id long, ts long, user_id long, event_type string, value double, props string"
    )
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    )
    counted = (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    q = (
        counted.writeStream.outputMode("update")
        .format("memory")
        .queryName("stateful_user_totals")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # multiple micro-batches emit multiple updates per user; the final state
    # per user is the row with the highest n_events
    out = spark.table("stateful_user_totals")
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        out.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .drop("rk")
        .orderBy("user_id")
    )
