"""Round-5 operator tests: r4 ADVICE regressions (pagerank dangling-in
nodes, empty-fact dimension guard) and the round's new operators."""

import pytest
from pyspark.sql import functions as F

from .conftest import SF_SMOKE


def test_pagerank_keeps_zero_in_degree_nodes(spark):
    """A directed caller meeting the documented out-degree>=1 contract must
    not lose source-only nodes: a node nobody links to receives no
    messages but keeps the teleport term 0.15/n (r4 ADVICE — the old
    inner degree-join dropped it from the rank table entirely)."""
    from poc_juma_etl_spark.operators.graph import pagerank_top

    # node 0 has out-degree 1 and in-degree 0; nodes 1,2 form a 2-cycle
    edges = spark.createDataFrame([(0, 1), (1, 2), (2, 1)], "src long, dst long")
    ranks = {r.node: r.pr for r in pagerank_top(edges, iters=3, top=None).collect()}
    assert set(ranks) == {0, 1, 2}
    # pure teleport mass for the dangling-in node, every iteration
    assert ranks[0] == pytest.approx(0.15 / 3, abs=0, rel=0)
    assert ranks[1] > ranks[0] and ranks[2] > ranks[0]


def _write_events_file(spark, rows, path):
    """One single-file events fixture (schema = the catalog's events)."""
    import glob
    import shutil

    df = (
        spark.createDataFrame(
            rows, "event_id long, user_id long, ts string"
        )
        .select(
            "event_id",
            F.to_timestamp("ts").alias("ts"),
            "user_id",
            F.lit("click").alias("event_type"),
            F.lit(1.0).alias("value"),
            F.lit("{}").alias("props"),
        )
        .coalesce(1)
    )
    stage = f"{path}__stage"
    df.write.parquet(stage)
    shutil.copy(glob.glob(f"{stage}/part-*.parquet")[0], path)


def _drain_outer(spark, d):
    from poc_juma_etl_spark.catalog import normalize_timestamps
    from poc_juma_etl_spark.streaming.join import RANGE_GAP_S

    physical = spark.read.parquet(f"{d}/events.parquet").schema

    def side(a):
        raw = (
            spark.readStream.schema(physical)
            .option("pathGlobFilter", "*.parquet")
            .parquet(d)
        )
        return normalize_timestamps(raw, "events").select(
            F.col("event_id").alias(f"{a}_event_id"),
            F.col("user_id").alias(f"{a}_user_id"),
            F.col("ts").alias(f"{a}_ts"),
        )

    left = side("a").withWatermark("a_ts", "1 hour")
    right = side("b").withWatermark("b_ts", "1 hour")
    joined = left.join(
        right,
        F.expr(
            f"a_user_id = b_user_id AND b_ts > a_ts AND "
            f"b_ts <= a_ts + INTERVAL {RANGE_GAP_S + 1} SECONDS AND "
            f"CAST(b_ts AS LONG) - CAST(a_ts AS LONG) <= {RANGE_GAP_S}"
        ),
        "leftOuter",
    ).select("a_event_id", "b_event_id")
    import uuid

    sink = f"outer_probe_{uuid.uuid4().hex[:8]}"
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName(sink)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return {(r.a_event_id, r.b_event_id) for r in spark.table(sink).collect()}


def test_outer_interval_join_null_emission_is_watermark_driven(spark, tmp_path):
    """The outer join's NULL rows emit only once the watermark passes an
    event's join horizon: without a flush row, the unmatched tail event is
    WITHHELD in state; a far-future sentinel row releases it. This is the
    semantics q_stream_interval_join_outer's sentinel exists for."""
    # e1-e2 pair within 300s; e3 unmatched, 2 days before the tail (its
    # horizon is long past the final watermark); e4 unmatched AT the tail
    rows = [
        (1, 1, "2024-01-01 00:00:00"),
        (2, 1, "2024-01-01 00:02:00"),
        (3, 2, "2024-01-01 00:00:30"),
        (4, 3, "2024-01-03 00:00:00"),
    ]
    d1 = str(tmp_path / "no_sentinel")
    import os

    os.makedirs(d1)
    _write_events_file(spark, rows, f"{d1}/events.parquet")
    got = _drain_outer(spark, d1)
    assert (1, 2) in got, "matched pair emits immediately"
    assert (3, None) in got, "old unmatched row's horizon passed -> null emitted"
    assert (4, None) not in got, "tail unmatched row is withheld without a flush"

    d2 = str(tmp_path / "with_sentinel")
    os.makedirs(d2)
    _write_events_file(
        spark, rows + [(-1, -1, "2024-02-20 00:00:00")], f"{d2}/events.parquet"
    )
    got2 = _drain_outer(spark, d2)
    assert {(1, 2), (2, None), (3, None), (4, None)} <= got2
    assert (-1, None) not in got2, "the sentinel's own row stays withheld"


def test_stream_outer_join_converges_to_batch_left_join(spark):
    """Row-level convergence on the real fixture: the sentinel-flushed
    outer drain equals the batch LEFT JOIN exactly."""
    from poc_juma_etl_spark.streaming.join import (
        RANGE_GAP_S,
        stream_close_event_pairs_outer,
    )

    got = {
        (r.event_a, r.event_b)
        for r in stream_close_event_pairs_outer(spark, SF_SMOKE).collect()
    }
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select(
        "event_id", "user_id", "ts"
    )
    a = ev.alias("a")
    b = ev.alias("b")
    want_df = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.ts") > F.col("a.ts"))
        & (F.col("b.ts").cast("long") - F.col("a.ts").cast("long") <= RANGE_GAP_S),
        "left",
    ).select(F.col("a.event_id").alias("ea"), F.col("b.event_id").alias("eb"))
    want = {(r.ea, r.eb) for r in want_df.collect()}
    assert got == want


def test_stream_outer_join_multi_batch_staging(spark):
    """Round-9: the outer drain's source is staged as time-ordered file
    groups so the join builds state INCREMENTALLY (one group per
    micro-batch) instead of buffering the whole table in one availableNow
    batch — the r8 soak's 30-minute single-batch stall. Pins (a) the
    staging shape: ~rows_per_batch files, disjoint ascending ts ranges,
    strictly increasing mtimes, sentinel last; (b) row-level convergence
    to the batch LEFT JOIN when the drain really runs multi-batch."""
    import glob
    import os
    import shutil

    from poc_juma_etl_spark.streaming.join import (
        RANGE_GAP_S,
        _sentinel_events_dir,
        stream_close_event_pairs_outer,
    )

    d = _sentinel_events_dir(spark, SF_SMOKE, rows_per_batch=200)
    try:
        parts = sorted(glob.glob(f"{d}/events_*.parquet"))
        assert len(parts) == 5  # 1000 fixture rows / 200 per group
        prev_max, prev_mtime = None, -1.0
        for p in parts:
            lo, hi = (
                spark.read.parquet(p)
                .agg(F.min("ts"), F.max("ts"))
                .collect()[0]
            )
            if prev_max is not None:
                assert lo >= prev_max, "file groups must be time-ordered"
            prev_max = hi
            mtime = os.path.getmtime(p)
            assert mtime > prev_mtime, "batch order needs increasing mtimes"
            prev_mtime = mtime
        sentinel = f"{d}/zz_sentinel.parquet"
        assert os.path.getmtime(sentinel) > prev_mtime, "sentinel drains last"
    finally:
        shutil.rmtree(d, ignore_errors=True)

    got = {
        (r.event_a, r.event_b)
        for r in stream_close_event_pairs_outer(
            spark, SF_SMOKE, rows_per_batch=200
        ).collect()
    }
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet").select(
        "event_id", "user_id", "ts"
    )
    a, b = ev.alias("a"), ev.alias("b")
    want_df = a.join(
        b,
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.ts") > F.col("a.ts"))
        & (F.col("b.ts").cast("long") - F.col("a.ts").cast("long") <= RANGE_GAP_S),
        "left",
    ).select(F.col("a.event_id").alias("ea"), F.col("b.event_id").alias("eb"))
    want = {(r.ea, r.eb) for r in want_df.collect()}
    assert got == want


class TestMediaCodec:
    """The stdlib PNG/WAV codecs under q_multimodal_decode_real."""

    def test_png_all_filter_types_roundtrip(self):
        from poc_juma_etl_spark.operators.multimodal import (
            decode_png,
            encode_png_gray,
        )

        # 7 rows -> filter cycle covers 0..4 plus repeats; ragged content
        rows = [bytes((13 * x + 31 * y) % 256 for x in range(23)) for y in range(7)]
        r = decode_png(encode_png_gray(rows))
        assert (r["width"], r["height"]) == (23, 7)
        assert r["pixel_sum"] == sum(sum(row) for row in rows)
        assert r["n_units"] == 23 * 7

    def test_png_bad_crc_rejected(self):
        import pytest as _pytest

        from poc_juma_etl_spark.operators.multimodal import (
            decode_png,
            encode_png_gray,
        )

        p = bytearray(encode_png_gray([bytes(range(16))]))
        p[40] ^= 0xFF  # flip a byte inside a chunk body
        with _pytest.raises(ValueError, match="CRC"):
            decode_png(bytes(p))

    def test_wav_roundtrip(self):
        from poc_juma_etl_spark.operators.multimodal import (
            decode_wav,
            encode_wav_pcm16,
        )

        samples = [0, 1000, -32768, 32767, -1]
        r = decode_wav(encode_wav_pcm16(samples, 44100))
        assert r["sample_rate"] == 44100
        assert r["n_units"] == len(samples)
        assert r["sample_sq_sum"] == sum(s * s for s in samples)

    def test_jpeg_contract_without_pillow(self):
        """Round-8/9 contract: BASELINE grayscale JPEG decodes for real via
        the stdlib codec (no Pillow needed); round-9 moved PROGRESSIVE
        (SOF2) from the NotImplementedError tier to a real decode. The
        scoped contract error now covers extended/lossless/arithmetic
        frames; truncated/invalid streams stay ValueError."""
        import pytest as _pytest

        from poc_juma_etl_spark.operators.multimodal import (
            decode_real,
            encode_jpeg_progressive,
            synth_jpeg_media,
        )

        try:
            import PIL  # noqa: F401

            _pytest.skip("Pillow installed; JPEG path is Pillow's here")
        except ImportError:
            pass
        d = decode_real(synth_jpeg_media(2))
        assert d["media_kind"] == "jpeg" and d["n_units"] > 0
        # progressive (SOF2) decodes for real as of round 9
        img = [bytes((x + 2 * y) % 256 for x in range(16)) for y in range(16)]
        dp = decode_real(encode_jpeg_progressive(img))
        assert dp["media_kind"] == "jpeg" and dp["n_units"] == 256
        # a progressive stream with no quant tables / no scans is a
        # malformed stream (ValueError), not a crash class
        with _pytest.raises(ValueError):
            decode_real(
                b"\xff\xd8\xff\xc2\x00\x0b\x08\x00\x08\x00\x08\x01\x01\x11\x00"
                + b"\xff\xd9"
            )
        # extended-sequential (SOF1) keeps the scoped contract error
        with _pytest.raises(NotImplementedError, match="extended"):
            decode_real(
                b"\xff\xd8\xff\xc1\x00\x0b\x08\x00\x08\x00\x08\x01\x01\x11\x00"
                + b"\xff\xd9"
            )
        # garbage after the magic is a malformed stream, not a crash class
        with _pytest.raises(ValueError):
            decode_real(b"\xff\xd8\xff\xe0fakejpeg")
        # a truncated entropy stream is the same ValueError class, never a
        # bare IndexError out of the bit reader
        with _pytest.raises(ValueError, match="truncated|malformed"):
            decode_real(synth_jpeg_media(2)[:-12])
        # arithmetic-coded progressive (SOF10) after a DRI: scoped error too
        with _pytest.raises(NotImplementedError):
            decode_real(
                b"\xff\xd8\xff\xdd\x00\x04\x00\x08"
                + b"\xff\xca\x00\x0b\x08\x00\x08\x00\x08\x01\x01\x11\x00\xff\xd9"
            )

    def test_unknown_container_rejected(self):
        import pytest as _pytest

        from poc_juma_etl_spark.operators.multimodal import decode_real

        with _pytest.raises(ValueError, match="unrecognized"):
            decode_real(b"GIF89a....")


def test_scd2_dimension_invariants(spark):
    """Structural SCD2 contract on the real fixture (values are oracle-
    gated; this pins the interval algebra): versions are contiguous from
    1, valid_to chains to the next valid_from, exactly one open (current)
    version per customer, and n_orders tiles the customer's history."""
    from poc_juma_etl_spark.plans.extra6 import scd2_dimension

    rows = scd2_dimension(spark, SF_SMOKE).orderBy("custkey", "version").collect()
    by_cust: dict = {}
    for r in rows:
        by_cust.setdefault(r.custkey, []).append(r)
    order_counts = {
        r.o_custkey: r.n
        for r in spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert set(by_cust) == set(order_counts)
    for ck, vs in by_cust.items():
        assert [v.version for v in vs] == list(range(1, len(vs) + 1)), ck
        for a, b in zip(vs, vs[1:]):
            assert a.valid_to == b.valid_from, ck
            assert a.valid_from <= b.valid_from, ck
            # adjacent versions always change the attribute (run collapse)
            assert a.priority != b.priority, ck
        assert vs[-1].valid_to is None, ck
        assert sum(v.n_orders for v in vs) == order_counts[ck], ck


@pytest.mark.parametrize(
    "split",
    [
        "1990-01-01",  # empty base: everything arrives as delta
        "1995-06-01",  # early split: most history is incremental
        "2000-01-01",
        "2001-07-15",  # thin delta
        "2002-01-01",  # empty delta: base passes through untouched
    ],
)
def test_scd2_incremental_equals_rebuild(spark, split):
    """Incremental-view-maintenance equivalence at arbitrary split dates,
    including both empty edges (the registered query's oracle pins one
    split; this sweeps the seam)."""
    from poc_juma_etl_spark.plans.extra6 import (
        _scd2_from_orders,
        scd2_incremental_from_orders,
    )

    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet").select(
        "o_custkey", "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    cols = ["custkey", "version", "priority", "valid_from", "valid_to", "n_orders"]
    inc = sorted(
        tuple(r) for r in scd2_incremental_from_orders(o, split).select(*cols).collect()
    )
    full = sorted(tuple(r) for r in _scd2_from_orders(o).select(*cols).collect())
    assert inc == full


def test_ann_recall_bounds_and_consistency(spark):
    from poc_juma_etl_spark import all_queries

    rows = all_queries()["q_ann_recall_at_k"].fn(spark, SF_SMOKE).collect()
    assert len(rows) == 10
    for r in rows:
        assert 0 <= r.n_hits <= 5
        assert r.recall_at_k == pytest.approx(r.n_hits / 5.0, abs=0)


def test_rocksdb_state_store_same_results(spark):
    """The at-scale state backend: the watermarked tumbling aggregation
    must produce identical results under the RocksDB state store provider
    (spill-to-disk state, the 100 TB configuration) as under the default
    in-memory HDFSBackedStateStore."""
    from poc_juma_etl_spark.streaming.events import streaming_tumbling_hour

    def run():
        return {
            tuple(r) for r in streaming_tumbling_hour(spark, SF_SMOKE).collect()
        }

    default_res = run()
    key = "spark.sql.streaming.stateStore.providerClass"
    rocks = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    old = spark.conf.get(key, None)
    spark.conf.set(key, rocks)
    try:
        rocks_res = run()
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)
    assert rocks_res == default_res
    assert len(rocks_res) > 0


def test_checkpoint_resume_is_exactly_once(spark, tmp_path):
    """Checkpoint-recovery contract: drain a source dir with a durable
    checkpoint, then land a NEW file and drain again with the SAME
    checkpoint + sink — the second run must process only the new file
    (no reprocessing, no double counting), converging to the batch total
    over all files."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def land(name, rows):
        stage = str(tmp_path / f"stage_{name}")
        spark.createDataFrame(rows, "k long, v long").coalesce(1).write.parquet(stage)
        shutil.copy(glob.glob(f"{stage}/part-*.parquet")[0], str(src / name))

    def drain():
        stream = (
            spark.readStream.schema("k long, v long")
            .option("pathGlobFilter", "*.parquet")
            .parquet(str(src))
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    land("a.parquet", [(1, 10), (2, 20)])
    drain()
    first = spark.read.parquet(out).count()
    assert first == 2
    land("b.parquet", [(3, 30)])
    drain()
    got = (
        spark.read.parquet(out)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()[0]
    )
    # exactly-once: 3 rows total, a.parquet not re-emitted
    assert (got.n, got.s) == (3, 60)


class TestBatchPostSink:
    """Two-phase-commit semantics of the Python DataSource sink,
    pinned at the protocol level (no Spark): only pages named in the
    commit messages publish; staged orphans stay invisible; abort
    removes staged pages."""

    def _stage(self, dest, rows):
        from poc_juma_etl_spark.sources.rest_sink import FixtureSinkTransport

        return FixtureSinkTransport(dest).post_page(rows)

    def test_commit_publishes_only_named_pages(self, tmp_path):
        import json
        import os

        from poc_juma_etl_spark.sources.rest_sink import (
            MANIFEST,
            STAGING,
            FixtureSinkTransport,
        )

        dest = str(tmp_path / "out")
        os.makedirs(dest)
        good = self._stage(dest, [{"k": 1}, {"k": 2}])
        # a failed/speculative task attempt staged this page but its
        # message never reached commit
        orphan = self._stage(dest, [{"k": 99}])
        FixtureSinkTransport(dest).finalize([good], 2)
        manifest = json.load(open(os.path.join(dest, MANIFEST)))
        assert manifest == {"pages": [good], "n_rows": 2, "schema": None}
        assert os.path.exists(os.path.join(dest, good))
        assert not os.path.exists(os.path.join(dest, orphan))
        assert os.path.exists(os.path.join(dest, STAGING, orphan)), (
            "orphan stays quarantined in staging, never published"
        )

    def test_abort_removes_staged_pages(self, tmp_path):
        import os

        from poc_juma_etl_spark.sources.rest_sink import (
            STAGING,
            FixtureSinkTransport,
        )

        dest = str(tmp_path / "out")
        os.makedirs(dest)
        p1 = self._stage(dest, [{"k": 1}])
        p2 = self._stage(dest, [{"k": 2}])
        FixtureSinkTransport(dest).abort([p1, p2])
        assert os.listdir(os.path.join(dest, STAGING)) == []

    def test_reader_sees_only_manifest_pages(self, spark, tmp_path):
        import os

        from poc_juma_etl_spark.sources.rest_sink import (
            FixtureSinkTransport,
            read_published,
        )

        dest = str(tmp_path / "out")
        os.makedirs(dest)
        good = self._stage(dest, [{"k": 1}, {"k": 2}])
        self._stage(dest, [{"k": 99}])  # orphan
        FixtureSinkTransport(dest).finalize([good], 2)
        back, manifest = read_published(spark, dest)
        assert sorted(r.k for r in back.collect()) == [1, 2]
        assert manifest["n_rows"] == 2


def test_user_tier_dim_empty_fact_table(spark, tmp_path):
    """max(user_id) over an empty events table is NULL; the dimension must
    come back empty instead of crashing on int(None) (r4 ADVICE)."""
    from poc_juma_etl_spark.streaming.enrich import user_tier_dim

    empty_dir = str(tmp_path / "sf_empty")
    (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .limit(0)
        .write.parquet(f"{empty_dir}/events.parquet")
    )
    dim = user_tier_dim(spark, empty_dir)
    assert dim.count() == 0
    assert dim.columns == ["user_id", "tier"]
