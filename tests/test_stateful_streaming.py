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
