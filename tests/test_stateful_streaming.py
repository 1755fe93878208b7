"""applyInPandasWithState: the stateful counter over a bounded stream must
converge to the batch groupBy answer."""

from pyspark.sql import functions as F

from .conftest import SF_SMOKE


def test_stateful_user_totals_converge(spark):
    from poc_juma_etl_spark.catalog import load_table
    from poc_juma_etl_spark.streaming.stateful import streaming_user_totals

    stream = {r.user_id: (r.n_events, r.total_value) for r in
              streaming_user_totals(spark, SF_SMOKE).collect()}
    batch = {
        r.user_id: (r.n, r.t)
        for r in load_table(spark, SF_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    assert set(stream) == set(batch)
    for uid, (n, t) in batch.items():
        sn, st = stream[uid]
        assert sn == n
        assert abs(st - t) < 1e-6 * max(abs(t), 1.0)


import pytest

PROVIDERS = [
    "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    # the real-cluster provider (incremental checkpoints, state larger than
    # executor memory) — recovery must behave identically on it
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
]


@pytest.mark.parametrize("provider", PROVIDERS, ids=["hdfs", "rocksdb"])
def test_stateful_restart_recovers_state(spark, tmp_path, provider):
    """Round-8 drill: applyInPandasWithState across an induced restart. The
    first run drains half the source files and terminates; more files land;
    the second run restarts from the same checkpoint. The recovered run's
    final per-user totals must equal the batch groupBy over ALL rows while
    its own input was only the second half — so the first half's
    accumulators can only have come from state-store recovery. Runs on both
    state-store providers: the default HDFS-backed one and RocksDB."""
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    conf_key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(conf_key, None)
    spark.conf.set(conf_key, provider)
    try:
        _run_restart_drill(spark, tmp_path)
    finally:
        if old is None:
            spark.conf.unset(conf_key)
        else:
            spark.conf.set(conf_key, old)


def _run_restart_drill(spark, tmp_path):
    import pandas as pd
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    from poc_juma_etl_spark.catalog import load_table
    from poc_juma_etl_spark.streaming.stateful import (
        OUT_SCHEMA,
        STATE_SCHEMA,
        _update_user_state,
    )

    ev = load_table(spark, SF_SMOKE, "events").select("user_id", "value")
    # two disjoint row sets that together equal ev, split by a stable row
    # hash instead of by user, so most users appear in BOTH halves
    tagged = ev.withColumn("__h", F.abs(F.hash("user_id", "value")) % 2)
    half_a = tagged.filter(F.col("__h") == 0).drop("__h")
    half_b = tagged.filter(F.col("__h") == 1).drop("__h")
    n_a, n_b = half_a.count(), half_b.count()
    assert n_a > 0 and n_b > 0

    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    half_a.coalesce(1).write.mode("append").parquet(src)
    schema = spark.read.parquet(src).schema

    def run_available():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
        )
        counted = stream.groupBy("user_id").applyInPandasWithState(
            _update_user_state,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

        def sink(batch_df, batch_id):
            batch_df.write.mode("append").parquet(out)

        q = (
            counted.writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return sum(p["numInputRows"] for p in q.recentProgress)

    read_1 = run_available()
    assert read_1 == n_a
    half_b.coalesce(1).write.mode("append").parquet(src)
    read_2 = run_available()
    # state recovery, not a re-read: the restarted query consumed ONLY the
    # newly landed rows
    assert read_2 == n_b

    # final emitted totals (last update per user = max n_events) must equal
    # the batch answer over BOTH halves
    w_final = (
        spark.read.parquet(out)
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("total_cents").alias("total_cents"),
        )
    )
    got = {r.user_id: (r.n_events, r.total_cents) for r in w_final.collect()}
    want = {
        r.user_id: (r.n, r.c)
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.floor(F.col("value") * 100).cast("long")).alias("c"),
        )
        .collect()
    }
    assert got == want
    # the drill only proves recovery if some user actually spanned both
    # halves (otherwise every accumulator could have been built fresh)
    users_a = {r.user_id for r in half_a.select("user_id").distinct().collect()}
    users_b = {r.user_id for r in half_b.select("user_id").distinct().collect()}
    assert users_a & users_b, "no user spans the restart — fixture degenerate"


def test_stateful_cents_skip_null_values():
    """NULL values arrive in the pandas kernel as NaN and must be SKIPPED
    like SQL SUM — an unguarded floor(NaN).astype(int64) is INT64_MIN
    garbage, not a clean diff (r8 review fix)."""
    import numpy as np
    import pandas as pd

    from poc_juma_etl_spark.streaming.stateful import _update_user_state

    class FakeState:
        exists = False

        def update(self, v):
            self.value = v

    st = FakeState()
    pdf = pd.DataFrame({"user_id": [1, 1, 1], "value": [1.25, np.nan, 2.50]})
    out = list(_update_user_state((1,), iter([pdf]), st))
    n, total, cents = st.value
    assert n == 3  # COUNT(*) counts the null-value row
    assert cents == 125 + 250  # SUM skips it
    assert abs(total - 3.75) < 1e-9
    assert out[0]["total_cents"].iloc[0] == 375
