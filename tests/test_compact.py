"""Small-files compaction: fewer files, identical content, layout preserved."""

import datetime as dt

from poc_juma_etl_spark.operators.compact import compact_table, table_file_stats
from poc_juma_etl_spark.operators.range_replace import (
    append_table,
    overwrite_table,
    read_table,
)


def _ev(spark, i, day):
    return spark.createDataFrame(
        [(i, dt.datetime(2024, 1, day, 12), float(i))], "id long, ts timestamp, v double"
    )


def test_compact_partitioned_table(spark, tmp_path):
    p = str(tmp_path / "t")
    overwrite_table(_ev(spark, 0, 1), p, "ts")
    # simulate many tiny incremental appends across two days
    for i in range(1, 9):
        append_table(_ev(spark, i, 1 + (i % 2)), p, "ts")
    before_rows = sorted(r.id for r in read_table(spark, p).collect())
    n_before, _ = table_file_stats(spark, p)
    assert n_before >= 9
    b, a = compact_table(spark, p)
    assert (b, a) == (n_before, a) and a < n_before
    assert sorted(r.id for r in read_table(spark, p).collect()) == before_rows
    # partition layout survives (read with partition pruning still works)
    import pyspark.sql.functions as F

    day1 = read_table(spark, p).filter(F.to_date("ts") == "2024-01-01").count()
    assert day1 == len([i for i in range(9) if i == 0 or i % 2 == 1])


def test_compact_unpartitioned_table(spark, tmp_path):
    p = str(tmp_path / "u")
    df = spark.range(1000).repartition(12)
    df.write.parquet(p)
    n_before, _ = table_file_stats(spark, p)
    assert n_before >= 12
    b, a = compact_table(spark, p)
    assert a < b
    assert spark.read.parquet(p).count() == 1000
