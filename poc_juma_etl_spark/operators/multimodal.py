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
    oracle=None,  # mapInPandas decode is outside DuckDB's surface (rows-only)
    doc="Multimodal plumbing: synthesize a binary payload column from "
    "documents (stand-in for encoded images), run the Arrow-batched "
    "mapInPandas decode-stub, aggregate per media_type. Exact values pinned "
    "by unit tests instead of the SQL oracle.",
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
