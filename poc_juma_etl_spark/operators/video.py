"""VIDEO container decode + frame sampling over a REAL AVI parser — the
video leg of the multimodal triple (PNG/JPEG images and WAV audio decode
for real in operators/multimodal.py / operators/audio.py; this closes the
"decode / frame-sample / feature-extract" loop for video the same way).

AVI is RIFF (the container family the WAV path already parses), so a full
uncompressed-DIB AVI is spec-expressible with the standard library alone:

- encoder (:func:`encode_avi_rgb24`): RIFF('AVI ') -> LIST(hdrl){avih,
  LIST(strl){strh('vids'/'DIB '), strf(BITMAPINFOHEADER, 24bpp,
  BI_RGB)}} -> LIST(movi){'00db' frame chunks, BGR bottom-up rows, stride
  padded to 4 bytes} -> idx1 (16-byte entries, offsets relative to the
  'movi' fourcc) — every chunk even-padded per RIFF;
- decoder (:func:`decode_avi`): an INDEPENDENT chunk walker that shares no
  layout constants with the encoder — it parses avih for dimensions and
  timing, enforces the 24bpp/BI_RGB contract (anything else raises the
  NotImplementedError contract, the Pillow-tier idiom), iterates movi
  chunks, strips row padding, flips the bottom-up rows to logical order,
  and CROSS-CHECKS idx1 against the chunks it actually walked;
- the query samples every 2nd frame (the frame-sample stage of a training
  pipeline) and reports integer-exact features: total pixel-byte sum, the
  max single-frame sum, and a row-weighted sum that is deliberately
  ORIENTATION-SENSITIVE — a decoder that forgets the bottom-up flip
  hash-fails even though plain sums would be flip-invariant.

The DuckDB oracle replays the closed-form frame content (three channel
formulas over (x, y, frame, doc_id)) — a flipped bit anywhere in the
encoder, the RIFF walk, the stride strip, the row flip, or the sampling
hash-fails. Both kernels are Arrow-batched narrow maps: decode parallelism
is partition count, the 100 TB shape; no shuffle before the final ORDER BY.

Reference behavior: the reference pipeline (fe-malveira-87/poc-juma-etl)
has no media surface; this extends the engine's multimodal toolbox
(SURVEY.md north-star extension families).

Registered as the driver gate ``q_multimodal_video_frames`` in round 10
(the round-9 queue drain); tests/test_video.py runs the same
Spark-vs-DuckDB parity the gate runs.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_table

SAMPLE_EVERY = 2  # keep frames 0, 2, 4, ... (the frame-sample stride)

# fixture geometry: widths chosen so 3*w is usually NOT 4-aligned (the
# stride-padding path is exercised), several frames per clip
W_BASE, W_MOD = 6, 7  # width  = 6 + doc_id % 7   (6..12)
H_BASE, H_MOD = 4, 5  # height = 4 + doc_id % 5   (4..8)
F_BASE, F_MOD = 4, 6  # frames = 4 + doc_id % 6   (4..9)
USEC_BASE, USEC_MOD = 40000, 100  # per-frame micros = 40000 + doc_id % 100

OUT_SCHEMA = (
    "doc_id long, width long, height long, n_frames long, n_sampled long, "
    "usec_per_frame long, px_sum long, frame_px_max long, row_weighted_sum long"
)


def pixel_bgr(doc_id: int, f: int, x: int, y: int) -> tuple[int, int, int]:
    """Closed-form frame content at logical (x, y), top-left origin."""
    b = (3 * x + 7 * y + 11 * f + doc_id) % 256
    g = (5 * x + y + 2 * f + 3 * doc_id) % 256
    r = (x + 4 * y + 9 * f + 7 * doc_id) % 256
    return b, g, r


def _frames_bytes(doc_id: int, n: int, w: int, h: int) -> list[bytes]:
    """All ``n`` uncompressed DIB frames of a clip: BGR triples, rows
    BOTTOM-UP, each row zero-padded to a 4-byte stride (the BMP/DIB
    on-disk convention). Vectorized across the whole clip (round-13,
    guide §4.2): the per-pixel pixel_bgr walk was the AVI kernel's
    hottest path, and per-frame NumPy calls still paid ~30 µs of array
    overhead on these tiny frames — the closed-form channel formulas
    broadcast over (frame, y, x) at once, byte-identical to the scalar
    reference (pixel_bgr), which tests pin."""
    import numpy as np

    f = np.arange(n)[:, None, None]
    y = np.arange(h)[None, :, None]
    x = np.arange(w)[None, None, :]
    b = (3 * x + 7 * y + 11 * f + doc_id) % 256
    g = (5 * x + y + 2 * f + 3 * doc_id) % 256
    r = (x + 4 * y + 9 * f + 7 * doc_id) % 256
    stride_pad = (-3 * w) % 4
    frames = np.zeros((n, h, 3 * w + stride_pad), dtype=np.uint8)
    frames[..., 0 : 3 * w : 3] = b
    frames[..., 1 : 3 * w : 3] = g
    frames[..., 2 : 3 * w : 3] = r
    flipped = frames[:, ::-1]  # bottom-up
    return [fr.tobytes() for fr in flipped]


def _frame_bytes(doc_id: int, f: int, w: int, h: int) -> bytes:
    """One frame (property sweeps / units); the encoder batches per clip."""
    # frame index enters the formulas linearly, so frame f of an n-frame
    # clip equals frame 0 of a clip whose constants absorb f — simplest
    # exact form: slice the batched producer
    import numpy as np

    fx = np.arange(1)[:, None, None] + f
    y = np.arange(h)[None, :, None]
    x = np.arange(w)[None, None, :]
    b = (3 * x + 7 * y + 11 * fx + doc_id) % 256
    g = (5 * x + y + 2 * fx + 3 * doc_id) % 256
    r = (x + 4 * y + 9 * fx + 7 * doc_id) % 256
    stride_pad = (-3 * w) % 4
    frame = np.zeros((1, h, 3 * w + stride_pad), dtype=np.uint8)
    frame[..., 0 : 3 * w : 3] = b
    frame[..., 1 : 3 * w : 3] = g
    frame[..., 2 : 3 * w : 3] = r
    return frame[0, ::-1].tobytes()


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    """RIFF chunk with even-size padding."""
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(listtype: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", listtype + payload)


def encode_avi_rgb24(
    doc_id: int,
    *,
    w: int | None = None,
    h: int | None = None,
    n: int | None = None,
    usec: int | None = None,
) -> bytes:
    """Spec-valid uncompressed AVI for ``doc_id``: hdrl (avih + one 'vids'
    stream, 'DIB ' handler, 24bpp BI_RGB) + movi ('00db' frames) + idx1.
    Geometry defaults to the doc_id fixture formulas; the keyword overrides
    exist so property sweeps can drive THIS encoder over arbitrary shapes
    instead of maintaining a private copy of the container layout."""
    w = W_BASE + doc_id % W_MOD if w is None else w
    h = H_BASE + doc_id % H_MOD if h is None else h
    n = F_BASE + doc_id % F_MOD if n is None else n
    usec = USEC_BASE + doc_id % USEC_MOD if usec is None else usec
    frame_size = ((3 * w + 3) & ~3) * h

    avih = struct.pack(
        "<14I",
        usec,  # dwMicroSecPerFrame
        frame_size * 25,  # dwMaxBytesPerSec (nominal)
        0,  # dwPaddingGranularity
        0x10,  # dwFlags: AVIF_HASINDEX
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        frame_size,  # dwSuggestedBufferSize
        w,
        h,
        0, 0, 0, 0,  # dwReserved[4]
    )
    strh = (
        b"vids"
        + b"DIB "
        + struct.pack(
            "<10I4H",
            0,  # dwFlags
            0,  # wPriority + wLanguage
            0,  # dwInitialFrames
            usec,  # dwScale (with dwRate = 1e6 -> usec per frame)
            1_000_000,  # dwRate
            0,  # dwStart
            n,  # dwLength
            frame_size,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality
            frame_size,  # dwSampleSize
            0, 0, w, h,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40,  # biSize
        w,
        h,  # positive -> bottom-up
        1,  # biPlanes
        24,  # biBitCount
        0,  # biCompression = BI_RGB
        frame_size,  # biSizeImage
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )

    movi_parts = []
    idx_entries = []
    off = 0
    for data in _frames_bytes(doc_id, n, w, h):
        # idx1 offsets are relative to the 'movi' fourcc; first chunk at 4
        idx_entries.append((4 + off, len(data)))
        ck = _chunk(b"00db", data)
        movi_parts.append(ck)
        off += len(ck)
    movi = _list(b"movi", b"".join(movi_parts))
    idx1 = _chunk(
        b"idx1",
        b"".join(
            b"00db" + struct.pack("<III", 0x10, off, size)  # AVIIF_KEYFRAME
            for off, size in idx_entries
        ),
    )
    riff_payload = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(riff_payload)) + riff_payload


def _walk_chunks(buf: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_size) honoring even padding."""
    pos = start
    while pos + 8 <= end:
        fourcc = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        payload = pos + 8
        if payload + size > end:
            raise ValueError("AVI chunk overruns its parent")
        yield fourcc, payload, size
        pos = payload + size + (size % 2)


def decode_avi(payload: bytes) -> dict:
    """Independent AVI parse: chunk walk -> header extraction -> contract
    checks -> frame unpack (stride strip + bottom-up flip) -> idx1
    cross-check. Returns logical frames as lists of per-row BGR byte rows."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI (RIFF/'AVI ') stream")
    (riff_size,) = struct.unpack_from("<I", payload, 4)
    end = min(8 + riff_size, len(payload))

    avih = None
    bmp = None
    frames: list[bytes] = []
    chunk_offsets: list[tuple[int, int]] = []
    idx1_raw = None
    movi_fourcc_pos = None
    for fourcc, pstart, psize in _walk_chunks(payload, 12, end):
        if fourcc == b"LIST":
            ltype = payload[pstart : pstart + 4]
            if ltype == b"hdrl":
                for f2, s2, z2 in _walk_chunks(payload, pstart + 4, pstart + psize):
                    if f2 == b"avih":
                        if z2 < 56:
                            raise ValueError("avih shorter than MainAVIHeader")
                        avih = struct.unpack_from("<14I", payload, s2)
                    elif f2 == b"LIST" and payload[s2 : s2 + 4] == b"strl":
                        for f3, s3, z3 in _walk_chunks(payload, s2 + 4, s2 + z2):
                            if f3 == b"strf":
                                if z3 < 24:
                                    raise ValueError("strf shorter than BITMAPINFOHEADER core")
                                bmp = struct.unpack_from("<IiiHHI", payload, s3)
            elif ltype == b"movi":
                movi_fourcc_pos = pstart
                for f2, s2, z2 in _walk_chunks(payload, pstart + 4, pstart + psize):
                    if f2 in (b"00db", b"00dc"):
                        frames.append(payload[s2 : s2 + z2])
                        # offset convention: chunk header relative to the
                        # 'movi' fourcc (first chunk lands at 4)
                        chunk_offsets.append(((s2 - 8) - pstart, z2))
        elif fourcc == b"idx1":
            idx1_raw = payload[pstart : pstart + psize]
    if avih is None or bmp is None or movi_fourcc_pos is None:
        raise ValueError("AVI missing avih/strf/movi")
    usec, _, _, _, total, _, _, _, w, h = avih[:10]
    _, bw, bh, planes, bitcount, compression = bmp
    if bitcount != 24 or compression != 0:
        raise NotImplementedError("decoder contract is uncompressed 24bpp DIB")
    if (bw, abs(bh)) != (w, h):
        raise ValueError("strf dimensions disagree with avih")
    if total != len(frames):
        raise ValueError("avih frame count disagrees with movi chunks")
    if idx1_raw is not None:
        if len(idx1_raw) % 16:
            raise ValueError("idx1 size is not a whole number of entries")
        got = [
            struct.unpack_from("<III", idx1_raw, i + 4)[1:]
            for i in range(0, len(idx1_raw), 16)
        ]
        if got != chunk_offsets:
            raise ValueError("idx1 disagrees with walked movi chunks")

    stride = (3 * w + 3) & ~3
    bottom_up = bh > 0
    decoded = []
    for data in frames:
        if len(data) != stride * h:
            raise ValueError("frame chunk size disagrees with geometry")
        rows = [data[y * stride : y * stride + 3 * w] for y in range(h)]
        decoded.append(rows[::-1] if bottom_up else rows)
    return {"width": w, "height": h, "usec_per_frame": usec, "frames": decoded}


def synth_avi_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for b in batches:
        yield pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "payload": [encode_avi_rgb24(int(d)) for d in b["doc_id"]],
            }
        )


def frame_sample_kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Decode, sample every SAMPLE_EVERY-th frame, report integer features;
    row_weighted_sum weights logical row y by (y+1) so a missed bottom-up
    flip changes the value."""
    import numpy as np

    for b in batches:
        rows = []
        for doc_id, payload in zip(b["doc_id"], b["payload"]):
            v = decode_avi(bytes(payload))
            sampled = v["frames"][::SAMPLE_EVERY]
            h = v["height"]
            weights = np.arange(1, h + 1, dtype=np.int64)
            px_sum = 0
            frame_max = 0
            wsum = 0
            for fr in sampled:
                arr = np.frombuffer(b"".join(fr), dtype=np.uint8).astype(np.int64)
                per_row = arr.reshape(h, -1).sum(axis=1)
                fsum = int(per_row.sum())
                px_sum += fsum
                frame_max = max(frame_max, fsum)
                wsum += int((per_row * weights).sum())
            rows.append(
                {
                    "doc_id": int(doc_id),
                    "width": v["width"],
                    "height": h,
                    "n_frames": len(v["frames"]),
                    "n_sampled": len(sampled),
                    "usec_per_frame": v["usec_per_frame"],
                    "px_sum": px_sum,
                    "frame_px_max": frame_max,
                    "row_weighted_sum": wsum,
                }
            )
        yield pd.DataFrame(rows)


def q_multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..catalog import spread

    # spread() (round-12, measured): one-partition fixture scan would run
    # the AVI synth + frame-walk kernels on one core; no-op at scale
    # (catalog.spread docstring)
    d = spread(load_table(spark, sf_dir, "documents").select("doc_id"))
    media = d.mapInPandas(synth_avi_kernel, schema="doc_id long, payload binary")
    return media.mapInPandas(frame_sample_kernel, schema=OUT_SCHEMA).orderBy("doc_id")


VIDEO_ORACLE = f"""
    WITH p AS (
      SELECT doc_id,
             {W_BASE} + doc_id % {W_MOD} AS w,
             {H_BASE} + doc_id % {H_MOD} AS h,
             {F_BASE} + doc_id % {F_MOD} AS n,
             {USEC_BASE} + doc_id % {USEC_MOD} AS usec
      FROM documents
    ),
    fr AS (SELECT doc_id, w, h, n, usec, unnest(range(0, n)) AS f FROM p),
    sampled AS (SELECT * FROM fr WHERE f % {SAMPLE_EVERY} = 0),
    e1 AS (SELECT doc_id, f, w, unnest(range(0, h)) AS yy FROM sampled),
    e2 AS (SELECT doc_id, f, yy, unnest(range(0, w)) AS xx FROM e1),
    px AS (
      SELECT doc_id, f, yy,
             SUM((3 * xx + 7 * yy + 11 * f + doc_id) % 256
                 + (5 * xx + yy + 2 * f + 3 * doc_id) % 256
                 + (xx + 4 * yy + 9 * f + 7 * doc_id) % 256) AS row_sum
      FROM e2
      GROUP BY doc_id, f, yy
    ),
    perframe AS (
      SELECT doc_id, f, SUM(row_sum) AS fsum,
             SUM((yy + 1) * row_sum) AS fwsum
      FROM px GROUP BY doc_id, f
    )
    SELECT p.doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
           CAST(n AS BIGINT) AS n_frames,
           CAST((n + {SAMPLE_EVERY - 1}) // {SAMPLE_EVERY} AS BIGINT) AS n_sampled,
           CAST(usec AS BIGINT) AS usec_per_frame,
           CAST(SUM(fsum) AS BIGINT) AS px_sum,
           CAST(MAX(fsum) AS BIGINT) AS frame_px_max,
           CAST(SUM(fwsum) AS BIGINT) AS row_weighted_sum
    FROM p JOIN perframe pf ON pf.doc_id = p.doc_id
    GROUP BY p.doc_id, w, h, n, usec
    ORDER BY p.doc_id
    """


def _register_video_gate() -> None:
    """Round-10 driver-gate registration (deferred to module end: the
    oracle literal is defined below the query function)."""
    from ..plans.queries import register

    register(
        "q_multimodal_video_frames",
        oracle=VIDEO_ORACLE,
        doc="VIDEO container decode + frame sampling over a REAL AVI "
        "parser: a spec-valid uncompressed-DIB AVI (RIFF hdrl/movi/idx1) "
        "is synthesized per document; an INDEPENDENT chunk-walk decoder "
        "parses headers, enforces the 24bpp/BI_RGB contract, strips row "
        "padding, flips bottom-up rows, cross-checks idx1 when present, "
        "then every 2nd frame is sampled and reduced to integer features "
        "— including a row-weighted sum that is deliberately "
        "orientation-sensitive, so a missed bottom-up flip hash-fails. "
        "The DuckDB oracle replays the closed-form frame content; a "
        "flipped bit anywhere in encode, walk, stride strip, flip, or "
        "sampling hash-fails. Scale shape: two Arrow-batched narrow "
        "maps, decode parallelism = partition count.",
        tags=("multimodal", "pandas-udf", "video", "decode"),
    )(q_multimodal_video_frames)


_register_video_gate()
