"""M4 — LLM-pipeline extension operators: dedup, similarity, text,
multimodal. Oracle parity is covered by test_oracle_parity; these tests pin
semantics the oracle can't see (stub decode values, LSH recall sanity,
quantized-cosine accuracy)."""

import math

import pytest
from pyspark.sql import functions as F

from poc_juma_etl_spark import all_queries
from poc_juma_etl_spark.operators.multimodal import decode_stub, media_features

from .conftest import SF_ORACLE, SF_SMOKE

SPECS = all_queries()


def test_decode_stub_deterministic():
    c1, f1 = decode_stub(b"hello world payload")
    c2, f2 = decode_stub(b"hello world payload")
    assert (c1, f1) == (c2, f2)
    assert len(f1) == 4 and all(0.0 <= x <= 1.0 for x in f1)
    assert decode_stub(b"other")[0] != c1


def test_media_features_plumbing(spark):
    df = spark.createDataFrame(
        [(1, "image/fake", bytearray(b"abcdefgh")), (2, "audio/fake", bytearray(b"xy"))],
        "doc_id long, media_type string, payload binary",
    )
    out = media_features(df).collect()
    by_id = {r.doc_id: r for r in out}
    assert by_id[1].n_bytes == 8 and by_id[2].n_bytes == 2
    assert by_id[1].checksum == sum(b"abcdefgh")
    assert len(by_id[1].features) == 4
    # feature values match the stub computed locally
    exp_checksum, exp_feats = decode_stub(b"abcdefgh")
    assert by_id[1].checksum == exp_checksum
    assert by_id[1].features == pytest.approx(exp_feats)


def test_multimodal_query_rows(spark):
    df = SPECS["q_multimodal_features"].fn(spark, SF_SMOKE)
    rows = {r.media_type: r for r in df.collect()}
    assert set(rows) == {"image/fake", "audio/fake"}
    assert sum(r.n_items for r in rows.values()) == 500


def test_quantized_cosine_close_to_float(spark):
    """The 2^22 quantization used for engine-portable cosine must stay
    within 1e-5 of the float64 cosine."""
    from poc_juma_etl_spark.operators.dedup import spark_cosine_expr

    e = spark.read.parquet(f"{SF_ORACLE}/embeddings.parquet").limit(20)
    rows = e.select("vec_id", "embedding").collect()
    a, b = rows[0], rows[1]
    df = spark.createDataFrame(
        [(a.embedding, b.embedding)], "ea array<float>, eb array<float>"
    ).selectExpr(spark_cosine_expr("ea", "eb") + " as qcos")
    qcos = df.first().qcos
    dot = sum(x * y for x, y in zip(a.embedding, b.embedding))
    na = math.sqrt(sum(x * x for x in a.embedding))
    nb = math.sqrt(sum(x * x for x in b.embedding))
    assert qcos == pytest.approx(dot / (na * nb), abs=1e-5)


def test_lsh_topk_recall_sane(spark):
    """SRP-LSH top-k must (a) return only true bucket-mates and (b) agree
    with brute force on a reasonable fraction of neighbors (recall>0); the
    oracle gate already pins the exact output."""
    brute = {
        (r.query_id, r.neighbor_id)
        for r in SPECS["q_ann_bruteforce_topk"].fn(spark, SF_ORACLE).collect()
    }
    lsh = {
        (r.query_id, r.neighbor_id)
        for r in SPECS["q_ann_lsh_topk"].fn(spark, SF_ORACLE).collect()
    }
    assert lsh, "LSH returned nothing — bucketing is broken"
    assert len(lsh & brute) > 0, "LSH found no true neighbors at all"


def test_dedup_exact_total_mass(spark):
    out = SPECS["q_dedup_exact"].fn(spark, SF_ORACLE)
    total = out.agg(F.sum("n_copies")).first()[0]
    n_docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").count()
    assert total == n_docs  # every doc lands in exactly one group


def test_jaccard_bounds(spark):
    rows = SPECS["q_dedup_ngram_jaccard"].fn(spark, SF_ORACLE).collect()
    assert all(0.10 <= r.jaccard <= 1.0 for r in rows)
    assert all(r.doc_a < r.doc_b for r in rows)


def test_simhash_pigeonhole_guarantee():
    """Any pair of fingerprints within SIM_RADIUS must share at least one
    exact block under the block split used for candidate generation — the
    recall guarantee the equi-join relies on (Manku et al. WWW'07)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from poc_juma_etl_spark.operators.dedup import (
        SIM_BITS,
        SIM_BLOCK_BITS,
        SIM_BLOCKS,
        SIM_RADIUS,
    )

    assert SIM_BLOCKS * SIM_BLOCK_BITS == SIM_BITS
    mask = (1 << SIM_BLOCK_BITS) - 1

    @settings(max_examples=200, deadline=None)
    @given(
        x=st.integers(min_value=0, max_value=(1 << SIM_BITS) - 1),
        flips=st.lists(
            st.integers(min_value=0, max_value=SIM_BITS - 1),
            min_size=0,
            max_size=SIM_RADIUS,
        ),
    )
    def check(x, flips):
        y = x
        for b in flips:
            y ^= 1 << b
        shared = any(
            (x >> (i * SIM_BLOCK_BITS)) & mask == (y >> (i * SIM_BLOCK_BITS)) & mask
            for i in range(SIM_BLOCKS)
        )
        assert shared

    check()


def test_jaccard_df_cutoff_drops_stop_shingles(spark):
    """The document-frequency cap must remove stop-shingles from candidate
    generation: docs related ONLY through a shingle present in every doc
    produce no pair, while genuinely near-duplicate docs still match."""
    from poc_juma_etl_spark.operators.dedup import ngram_jaccard_pairs

    stop = "of the and"  # one 3-shingle shared by all docs -> df = 4 > cutoff 2
    docs = spark.createDataFrame(
        [
            (1, f"alpha beta gamma delta {stop}"),
            (2, f"alpha beta gamma delta {stop}"),  # near-dup of 1
            (3, f"unrelated words entirely here {stop}"),
            (4, f"different content again now {stop}"),
        ],
        "doc_id long, text string",
    )
    pairs = {(r.doc_a, r.doc_b) for r in ngram_jaccard_pairs(docs, df_cutoff=2).collect()}
    assert (1, 2) in pairs  # real near-dup survives the cap
    # 3 and 4 share ONLY the stop shingle: the cap must kill those pairs
    assert not {(1, 3), (1, 4), (2, 3), (2, 4), (3, 4)} & pairs
    # without the cap the stop shingle links every doc pair at jaccard>0
    uncapped = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(docs, threshold=1e-9, df_cutoff=10**9).collect()
    }
    assert (3, 4) in uncapped
