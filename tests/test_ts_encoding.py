"""Fixture ts-encoding robustness (batch AND streaming).

The testdata's ``events.ts`` physical parquet type has flipped between
driver rounds: TIMESTAMP(NANOS) (readable only as bigint nanos under
``spark.sql.legacy.parquet.nanosAsLong=true``) and ``timestamp[us]`` with
isAdjustedToUTC=false (TIMESTAMP_NTZ by default inference). The batch
loader absorbs both via ``catalog.normalize_timestamps``; these tests pin
that the streaming source (``catalog.stream_table``, which derives its read
schema from the parquet footer instead of a hardcoded ``ts timestamp`` DDL)
absorbs the exact same encodings — a flip back to NANOS must not fail every
streaming query at scan while batch keeps working."""

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from poc_juma_etl_spark.catalog import load_table, stream_table
from poc_juma_etl_spark.streaming.events import streaming_tumbling_hour

N_EVENTS = 24


def _write_events(dirpath, unit):
    """Write a small events fixture whose ts column uses the given physical
    resolution ('ns' → TIMESTAMP(NANOS), 'us' → timestamp[us])."""
    pdf = pd.DataFrame(
        {
            "event_id": range(N_EVENTS),
            "ts": pd.date_range("2024-01-01", periods=N_EVENTS, freq="30min"),
            "user_id": [i % 5 for i in range(N_EVENTS)],
            "event_type": ["click" if i % 2 else "view" for i in range(N_EVENTS)],
            "value": [float(i) for i in range(N_EVENTS)],
            "props": ["{}"] * N_EVENTS,
        }
    )
    table = pa.Table.from_pandas(pdf, preserve_index=False)
    idx = table.schema.get_field_index("ts")
    table = table.set_column(idx, "ts", table.column("ts").cast(pa.timestamp(unit)))
    # version 2.6 keeps nanosecond logical type instead of coercing to us
    pq.write_table(table, f"{dirpath}/events.parquet", version="2.6")
    stored = pq.read_schema(f"{dirpath}/events.parquet").field("ts").type
    assert stored == pa.timestamp(unit)


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_batch_load_absorbs_ts_encoding(spark, tmp_path, unit):
    _write_events(tmp_path, unit)
    df = load_table(spark, str(tmp_path), "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    rows = df.selectExpr("min(cast(ts as string))", "max(cast(ts as string))").first()
    assert rows[0] == "2024-01-01 00:00:00"
    assert rows[1] == "2024-01-01 11:30:00"


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_streaming_absorbs_ts_encoding(spark, tmp_path, unit):
    _write_events(tmp_path, unit)
    # streaming must converge to the batch answer on either encoding
    out = streaming_tumbling_hour(spark, str(tmp_path)).orderBy(
        "window_start", "event_type"
    )
    got = [tuple(r) for r in out.collect()]
    # 24 events at 30-min spacing: 12 hourly windows, one view + one click each
    assert len(got) == 24
    assert got[0] == ("2024-01-01 00:00:00", "click", 1, 1.0)
    assert got[1] == ("2024-01-01 00:00:00", "view", 1, 0.0)
    batch = load_table(spark, str(tmp_path), "events")
    expected = [
        tuple(r)
        for r in batch.selectExpr(
            "date_format(date_trunc('hour', ts), 'yyyy-MM-dd HH:mm:ss') AS window_start",
            "event_type",
            "value",
        )
        .groupBy("window_start", "event_type")
        .agg(
            {"*": "count", "value": "sum"},
        )
        .selectExpr(
            "window_start",
            "event_type",
            "`count(1)` AS n_events",
            "`sum(value)` AS total_value",
        )
        .orderBy("window_start", "event_type")
        .collect()
    ]
    assert got == expected


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_stream_table_schema_matches_batch(spark, tmp_path, unit):
    _write_events(tmp_path, unit)
    batch = load_table(spark, str(tmp_path), "events")
    stream = stream_table(spark, str(tmp_path), "events")
    assert stream.isStreaming
    assert [(f.name, f.dataType) for f in stream.schema.fields] == [
        (f.name, f.dataType) for f in batch.schema.fields
    ]
