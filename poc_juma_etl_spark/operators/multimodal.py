"""Multimodal column handling (extension surface, BASELINE.json north_star).

Pattern for image/audio/video at 100 TB: the payload is an opaque ``binary``
column with typed metadata columns beside it; per-item decode / feature
extraction runs as Arrow-batched Pandas code via ``mapInPandas`` (one
Python worker per partition, whole-column batches over Arrow — never a
row-at-a-time UDF). Parallelism is partition-level; a decode that needs 10k
cores is just a repartition before the map.

The decode itself is STUBBED — image/audio libraries are not in this
container. ``decode_stub`` derives deterministic pseudo-features from the
bytes so the plumbing (schema, batching, partitioning, UDF signature) is
real and testable; ``decode_real`` raises NotImplementedError and documents
where a Pillow/librosa call would slot in. Swapping stub→real changes no
Spark code.

The fixture corpus has no binary table, so the demo query synthesizes a
binary payload from ``documents.text`` (utf-8 bytes standing in for an
encoded image) plus metadata columns — the shape a real ingest would have.
No SQL oracle: mapInPandas is outside DuckDB's surface; the driver records
the rows-only check, and tests/test_m4_operators.py pins exact values.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..plans.queries import register

FEATURE_DIM = 4

OUT_SCHEMA = (
    "doc_id long, media_type string, n_bytes long, "
    "checksum long, features array<float>"
)


def decode_real(payload: bytes) -> list[float]:
    """Real decode slot: Pillow/torchvision/librosa goes here.

    raise until the runtime ships the codec libs; the Spark plumbing above
    it is already correct."""
    raise NotImplementedError(
        "media decode requires an image/audio library not present in this "
        "container; use decode_stub (deterministic fake) for plumbing tests"
    )


def decode_stub(payload: bytes) -> tuple[int, list[float]]:
    """Deterministic fake decode: (checksum, FEATURE_DIM features).

    Features are byte-sum statistics over fixed stripes — stable across
    runs/engines, cheap, and shaped like a real embedding head."""
    n = len(payload)
    checksum = sum(payload) % 1_000_000_007
    stripe = max(n // FEATURE_DIM, 1)
    feats = []
    for i in range(FEATURE_DIM):
        chunk = payload[i * stripe : (i + 1) * stripe] or b"\x00"
        feats.append(float(sum(chunk)) / (255.0 * len(chunk)))
    return checksum, feats


def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: Arrow batch in → feature frame out."""
    for pdf in batches:
        decoded = [decode_stub(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": [len(p) for p in pdf["payload"]],
                "checksum": [c for c, _ in decoded],
                "features": [f for _, f in decoded],
            }
        )


def media_features(df: DataFrame) -> DataFrame:
    """The operator: (doc_id, media_type, payload binary) → features.

    At scale: repartition before this map sets decode parallelism; the
    output is a normal DataFrame (joinable with the ANN operators in
    operators/similarity.py for media near-dup search)."""
    return df.mapInPandas(extract_features, schema=OUT_SCHEMA)


@register(
    "q_multimodal_features",
    oracle="""
    WITH m AS (
      SELECT doc_id,
             CASE WHEN doc_id % 2 = 0 THEN 'image/fake' ELSE 'audio/fake' END
               AS media_type,
             text, length(text) AS n
      FROM documents
    ),
    ck AS (  -- ASCII fixture text: ord(char) == utf-8 byte, so the stub's
             -- byte checksum is expressible as a codepoint sum
      SELECT media_type, n,
             COALESCE(list_sum(list_transform(range(1, n + 1),
                                              i -> ord(substring(text, i, 1)))), 0)
               % 1000000007 AS checksum
      FROM m
    )
    SELECT media_type,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(n) AS BIGINT) AS total_bytes,
           CAST(SUM(checksum) AS BIGINT) AS checksum_sum
    FROM ck GROUP BY media_type ORDER BY media_type
    """,
    doc="Multimodal plumbing: synthesize a binary payload column from "
    "documents (stand-in for encoded images), run the Arrow-batched "
    "mapInPandas decode-stub, aggregate per media_type. The ASCII fixture "
    "payload makes the stub's byte checksum a SQL codepoint sum, so this "
    "Python-kernel pipeline is value-hash-gated like the frame sampler "
    "(the float feature stripes stay pinned by tests/test_m4_operators.py).",
    tags=("multimodal", "pandas-udf"),
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    media = d.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, "image/fake").otherwise("audio/fake").alias(
            "media_type"
        ),
        F.encode("text", "utf-8").alias("payload"),
    )
    feats = media_features(media)
    return (
        feats.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("n_bytes").alias("total_bytes"),
            F.sum("checksum").alias("checksum_sum"),
        )
        .orderBy("media_type")
    )


# --------------------------------------------------------------------------
# Frame sampling: the video path's decode-side primitive. A real pipeline
# seeks N key frames per clip; the plumbing is byte-range extraction per
# item inside an Arrow-batched kernel. Because the synthetic payload is
# utf-8 ASCII text, the oracle can replicate the exact byte slicing and
# md5 in SQL (char slice == byte slice for ASCII) — giving this mapInPandas
# kernel a full value-hash gate, not just a rows-only check.

N_FRAMES = 4

FRAME_SCHEMA = (
    "doc_id long, frame_idx long, offset_bytes long, frame_len long, frame_md5 string"
)


def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: per item, slice N_FRAMES evenly-strided byte
    ranges from the payload and md5 each — the stand-in for an ffmpeg
    keyframe seek, with the same batch shape and output contract."""
    import hashlib

    for pdf in batches:
        out: dict[str, list] = {k: [] for k in
                                ("doc_id", "frame_idx", "offset_bytes", "frame_len", "frame_md5")}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n = len(payload)
            stride = max(n // N_FRAMES, 1)
            for i in range(N_FRAMES):
                off = i * stride
                if off >= n:
                    break
                frame = payload[off : off + stride]
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(i)
                out["offset_bytes"].append(off)
                out["frame_len"].append(len(frame))
                out["frame_md5"].append(hashlib.md5(frame).hexdigest())
        yield pd.DataFrame(out)


@register(
    "q_multimodal_frame_sample",
    oracle=f"""
    WITH m AS (
      SELECT doc_id, text, length(text) AS n_total,
             greatest(length(text) // {N_FRAMES}, 1) AS stride
      FROM documents
    ), f AS (
      SELECT doc_id, text, n_total, stride, unnest(range(0, {N_FRAMES})) AS frame_idx
      FROM m
    )
    SELECT doc_id, frame_idx,
           CAST(frame_idx * stride AS BIGINT) AS offset_bytes,
           CAST(length(substring(text, frame_idx * stride + 1, stride)) AS BIGINT)
             AS frame_len,
           md5(substring(text, frame_idx * stride + 1, stride)) AS frame_md5
    FROM f
    WHERE frame_idx * stride < n_total
    ORDER BY doc_id, frame_idx
    """,
    doc="Multimodal frame sampling: treat each payload as an encoded clip "
    "and extract 4 evenly-strided byte-range 'frames' per item inside an "
    "Arrow-batched mapInPandas kernel (hashlib md5 per frame — the slot "
    "where an ffmpeg/PIL decode goes). Embarrassingly parallel: no "
    "shuffle, decode parallelism = partition count. The ASCII fixture "
    "payload lets DuckDB replicate the byte slicing in SQL, so this "
    "Python-kernel operator is value-hash-gated, not rows-only.",
    tags=("multimodal", "pandas-udf", "frames"),
)
def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    media = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    frames = media.mapInPandas(sample_frames, schema=FRAME_SCHEMA)
    return frames.orderBy("doc_id", "frame_idx")


# --------------------------------------------------------------------------
# Resize plumbing: the image path's other decode-side primitive. The stub
# "resize" is a stride-4 byte subsample — the raw-bytes analog of a
# nearest-neighbor downsample — deterministic, so DuckDB replicates it in
# SQL (char slice == byte slice on the ASCII fixture payload) and the
# kernel is value-hash-gated like the frame sampler. A Pillow thumbnail
# call drops into the same kernel without touching the Spark plumbing.

RESIZE_STRIDE = 4

RESIZE_SCHEMA = "doc_id long, orig_bytes long, resized_bytes long, resized_md5 string"


def resize_items(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: stride-subsample each payload (the resize slot)."""
    import hashlib

    for pdf in batches:
        resized = [p[::RESIZE_STRIDE] for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "orig_bytes": [len(p) for p in pdf["payload"]],
                "resized_bytes": [len(r) for r in resized],
                "resized_md5": [hashlib.md5(r).hexdigest() for r in resized],
            }
        )


@register(
    "q_multimodal_resize",
    oracle=f"""
    WITH m AS (SELECT doc_id, text, length(text) AS n FROM documents),
    sub AS (
      SELECT doc_id, n,
             array_to_string(list_transform(range(1, n + 1, {RESIZE_STRIDE}),
                                            i -> substring(text, i, 1)), '') AS resized
      FROM m
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS orig_bytes,
           CAST(length(resized) AS BIGINT) AS resized_bytes,
           md5(resized) AS resized_md5
    FROM sub
    ORDER BY doc_id
    """,
    doc="Multimodal resize plumbing: per-item downsample inside an Arrow-"
    "batched mapInPandas kernel (stride-4 byte subsample standing in for "
    "a nearest-neighbor thumbnail; a Pillow call slots into the same "
    "kernel). Embarrassingly parallel, no shuffle; the ASCII fixture "
    "payload lets DuckDB replicate the subsample in SQL, so the resize "
    "kernel is value-hash-gated rather than rows-only.",
    tags=("multimodal", "pandas-udf", "resize"),
)
def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    media = d.select("doc_id", F.encode("text", "utf-8").alias("payload"))
    return media.mapInPandas(resize_items, schema=RESIZE_SCHEMA).orderBy("doc_id")
