"""AVI container codec + frame sampling (operators/video.py): the full
Spark-vs-DuckDB parity its future driver gate will run, codec roundtrip
pins (including orientation and stride), the idx1 cross-check, and the
corrupt-stream fuzz contract."""

import struct

import duckdb
import pytest

from poc_juma_etl_spark.operators.video import (
    SAMPLE_EVERY,
    VIDEO_ORACLE,
    decode_avi,
    encode_avi_rgb24,
    pixel_bgr,
    q_multimodal_video_frames,
)

from .conftest import SF_ORACLE, SF_SMOKE


def test_roundtrip_pixels_exact():
    """Decode returns logical top-down rows with stride padding stripped —
    every pixel equals the closed-form generator."""
    for doc_id in (0, 3, 11, 29, 12345):
        v = decode_avi(encode_avi_rgb24(doc_id))
        w, h = v["width"], v["height"]
        assert v["usec_per_frame"] == 40000 + doc_id % 100
        for f, rows in enumerate(v["frames"]):
            assert len(rows) == h
            for y, row in enumerate(rows):
                assert len(row) == 3 * w  # padding stripped
                for x in range(w):
                    assert tuple(row[3 * x : 3 * x + 3]) == pixel_bgr(
                        doc_id, f, x, y
                    ), (doc_id, f, x, y)


def test_bottom_up_flip_matters():
    """The fixture frames are not vertically symmetric: a decoder that
    skipped the bottom-up flip would return different rows (guards the
    orientation-sensitive feature)."""
    v = decode_avi(encode_avi_rgb24(7))
    rows = v["frames"][0]
    assert rows != rows[::-1]


def test_idx1_cross_check_catches_corruption():
    payload = bytearray(encode_avi_rgb24(5))
    i = payload.rindex(b"idx1")
    # corrupt the first index entry's offset field
    off_pos = i + 8 + 8
    payload[off_pos] ^= 0xFF
    with pytest.raises(ValueError, match="idx1"):
        decode_avi(bytes(payload))


def test_frame_count_cross_check():
    payload = bytearray(encode_avi_rgb24(5))
    i = payload.index(b"avih")
    # dwTotalFrames is the 5th DWORD of avih (payload offset 16)
    struct.pack_into("<I", payload, i + 8 + 16, 999)
    with pytest.raises(ValueError, match="frame count"):
        decode_avi(bytes(payload))


def test_unsupported_compression_raises_contract():
    payload = bytearray(encode_avi_rgb24(5))
    i = payload.index(b"strf")
    # biCompression is at strf payload offset 16
    struct.pack_into("<I", payload, i + 8 + 16, 1)  # BI_RLE8
    with pytest.raises(NotImplementedError):
        decode_avi(bytes(payload))


def test_corrupt_stream_fuzz_contract():
    """Truncations and byte flips must decode or raise the documented
    contract classes — never a raw struct.error/IndexError (the JPEG fuzz
    idiom, test_m4_operators.py)."""
    import random

    p = encode_avi_rgb24(9)
    for cut in range(0, len(p), max(len(p) // 41, 1)):
        try:
            decode_avi(p[:cut])
        except (ValueError, NotImplementedError):
            pass
    rng = random.Random(20260816)
    for _ in range(200):
        i = rng.randrange(len(p))
        mutated = p[:i] + bytes([p[i] ^ (1 << rng.randrange(8))]) + p[i + 1 :]
        try:
            decode_avi(mutated)
        except (ValueError, NotImplementedError):
            pass


def test_video_frames_match_duckdb_oracle(spark):
    """The exact check the registry gate will run in round 10."""
    got = [tuple(r) for r in q_multimodal_video_frames(spark, SF_ORACLE).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_ORACLE}/documents.parquet'"
    )
    want = [tuple(r) for r in con.execute(VIDEO_ORACLE).fetchall()]
    assert got == want
    assert len(got) > 0
    # sampling really drops frames
    assert all(r[4] == (r[3] + SAMPLE_EVERY - 1) // SAMPLE_EVERY for r in got)


def test_video_frames_empty_input(spark, tmp_path):
    empty = str(tmp_path / "sf_empty")
    spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(0).write.parquet(
        f"{empty}/documents.parquet"
    )
    assert q_multimodal_video_frames(spark, empty).count() == 0


def test_decode_real_dispatches_avi():
    """The unified media dispatcher recognizes all four container families;
    AVI reports frames as units and the exact whole-clip pixel-byte sum."""
    from poc_juma_etl_spark.operators.multimodal import decode_real

    doc_id = 13
    got = decode_real(encode_avi_rgb24(doc_id))
    v = decode_avi(encode_avi_rgb24(doc_id))
    want_sum = sum(
        sum(pixel_bgr(doc_id, f, x, y))
        for f in range(len(v["frames"]))
        for y in range(v["height"])
        for x in range(v["width"])
    )
    assert got["media_kind"] == "avi"
    assert (got["width"], got["height"]) == (v["width"], v["height"])
    assert got["n_units"] == len(v["frames"])
    assert got["pixel_sum"] == want_sum


def test_avi_roundtrip_property_sweep():
    """Hypothesis sweep over random geometry THROUGH THE PRODUCTION
    ENCODER (keyword overrides on encode_avi_rgb24): encode/decode must
    roundtrip bit-exactly for any (width, height, frames) — including
    4-aligned strides (no padding) and 1-pixel edges — and idx1 must
    verify."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from poc_juma_etl_spark.operators import video as V

    @settings(max_examples=60, deadline=None)
    @given(
        w=st.integers(min_value=1, max_value=17),
        h=st.integers(min_value=1, max_value=9),
        n=st.integers(min_value=1, max_value=7),
        doc_id=st.integers(min_value=0, max_value=10**7),
    )
    def check(w, h, n, doc_id):
        payload = V.encode_avi_rgb24(doc_id, w=w, h=h, n=n)
        v = V.decode_avi(payload)
        assert (v["width"], v["height"]) == (w, h)
        assert len(v["frames"]) == n
        for f, rows in enumerate(v["frames"]):
            for y, row in enumerate(rows):
                assert len(row) == 3 * w
                for x in range(w):
                    assert tuple(row[3 * x : 3 * x + 3]) == V.pixel_bgr(
                        doc_id, f, x, y
                    )

    check()


def test_idx1_absent_is_tolerated():
    """Real-world AVIs frequently omit idx1; the decoder's pure movi
    chunk-walk must accept index-absent files and produce the identical
    decode (round-9 verdict #7 — the cross-check is when-present only)."""
    for doc_id in range(9):
        payload = bytearray(encode_avi_rgb24(doc_id))
        full = decode_avi(bytes(payload))
        i = payload.rindex(b"idx1")
        stripped = bytearray(payload[:i])  # idx1 is the final top-level chunk
        struct.pack_into("<I", stripped, 4, len(stripped) - 8)  # RIFF size
        assert decode_avi(bytes(stripped)) == full
