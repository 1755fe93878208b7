"""Stream-stream interval join: pairs of same-user events within a time
bound, computed incrementally.

The hardest streaming primitive the engine exposes: both sides are
unbounded, so each side buffers state and the watermark + time-range
condition bound how much state is retained (without them the join would
buffer forever — Spark rejects it in append mode). The batch twin is
q_range_join_close_events (plans/advanced.py); the test drives this bounded
stream and checks it converges to exactly the batch answer.

Deliberately absent: the LEFT OUTER variant. Outer-join null rows emit
only when the watermark passes their eviction point BETWEEN micro-batches;
under the gate's availableNow drain the fixture lands in one batch, the
watermark never advances past the tail, and the unmatched rows for the
last watermark-horizon of events are retained in state rather than
emitted — so an outer entry could not converge to any batch oracle and
would be a permanently flaky gate row, not a capability. (Spark documents
this delayed/withheld emission for outer stream-stream joins.) Users who
need unmatched events batch-diff the inner result against the stream
instead — q_snapshot_diff's full-outer classify is the batch shape."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import stream_table
from ..plans.queries import register
from .events import _MEMSINK_LOCK, _SINK_SEQ

RANGE_GAP_S = 300  # keep in lockstep with plans/advanced.q_range_join_close_events


def _event_stream(spark: SparkSession, sf_dir: str, alias: str) -> DataFrame:
    return (
        stream_table(spark, sf_dir, "events")
        .select(
            F.col("event_id").alias(f"{alias}_event_id"),
            F.col("user_id").alias(f"{alias}_user_id"),
            F.col("ts").alias(f"{alias}_ts"),
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
    with _MEMSINK_LOCK:
        _SINK_SEQ[0] += 1
        sink = f"stream_pairs_out_{_SINK_SEQ[0]}"
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)


@register(
    "q_stream_interval_join",
    oracle=f"""
    WITH pairs AS (
      SELECT a.user_id,
             CAST(epoch_us(b.ts) // 1000000 - epoch_us(a.ts) // 1000000 AS BIGINT) AS gap_s
      FROM events a JOIN events b
        ON a.user_id = b.user_id
       AND b.ts > a.ts
       AND epoch_us(b.ts) // 1000000 - epoch_us(a.ts) // 1000000 <= {RANGE_GAP_S}
    )
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(gap_s) AS BIGINT) AS sum_gap_s
    FROM pairs GROUP BY user_id
    ORDER BY user_id
    """,
    doc=f"Stream-stream interval join, driver-gated: same-user event pairs "
    f"within {RANGE_GAP_S}s computed incrementally — both sides watermarked "
    "so the join buffers only the 1h+gap state horizon — then rolled up "
    "per user. The oracle is the batch self-join: incremental execution "
    "with bounded state must produce exactly the pairs a full-table join "
    "produces (integer gap arithmetic, so equality is exact). The batch "
    "twin q_range_join_close_events pins the bucketed O(events·density) "
    "candidate plan; this entry pins the streaming execution of the same "
    "semantics.",
    tags=("streaming", "join", "events"),
)
def q_stream_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = stream_close_event_pairs(spark, sf_dir)
    return (
        pairs.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum("gap_s").cast("bigint").alias("sum_gap_s"),
        )
        .orderBy("user_id")
    )
