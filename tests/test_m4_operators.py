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


# ---------------------------------------------------------------------------
# round-8 baseline JPEG codec (pure stdlib): the encoder is the decoder's
# test harness, same contract as the PNG path.


def test_jpeg_block_constant_roundtrip_exact():
    """Block-constant images roundtrip BIT-EXACTLY through the lossy codec
    (DC quant step 8 makes the constant block's level integral; AC float
    residuals quantize to zero) — the property the gate oracle relies on."""
    from poc_juma_etl_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_gray,
    )

    w, h = 24, 16
    rows = [
        bytes((5 * (x // 8) + 11 * (y // 8) + 37) % 256 for x in range(w))
        for y in range(h)
    ]
    W, H, lines = decode_jpeg_pixels(encode_jpeg_gray(rows))
    assert (W, H) == (w, h)
    assert lines == rows


def test_jpeg_gradient_lossy_but_bounded():
    """Gradients exercise the full AC path (run-lengths, ZRL-free small
    runs, EOB, multi-bit categories); reconstruction error is bounded by
    the AC quant step."""
    from poc_juma_etl_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_gray,
    )

    w, h = 32, 24
    rows = [bytes((x + 3 * y) % 256 for x in range(w)) for y in range(h)]
    W, H, lines = decode_jpeg_pixels(encode_jpeg_gray(rows))
    assert (W, H) == (w, h)
    errs = [abs(a - b) for ra, rb in zip(rows, lines) for a, b in zip(ra, rb)]
    assert sum(errs) / len(errs) < 4.0
    assert max(errs) < 48


def test_jpeg_odd_dimensions_crop():
    """Non-multiple-of-8 dims: encoder pads edge blocks by replication,
    decoder crops back; the visible region of a block-constant image is
    still exact."""
    from poc_juma_etl_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_gray,
    )

    w, h = 19, 11
    rows = [
        bytes((5 * (x // 8) + 11 * (y // 8) + 3) % 256 for x in range(w))
        for y in range(h)
    ]
    W, H, lines = decode_jpeg_pixels(encode_jpeg_gray(rows))
    assert (W, H) == (w, h)
    assert lines == rows


def test_jpeg_decode_real_dispatch():
    """decode_real routes JPEG magic to the baseline decoder (or Pillow
    when present) and returns the DECODE_SCHEMA stats row."""
    from poc_juma_etl_spark.operators.multimodal import decode_real, synth_jpeg_media

    d = decode_real(synth_jpeg_media(6))
    assert d["media_kind"] == "jpeg"
    assert d["width"] == 8 * (2 + 6 % 3) and d["height"] == 8 * (1 + 6 % 2)
    assert d["n_units"] == d["width"] * d["height"]


def test_jpeg_pillow_interop():
    """Where Pillow exists, it must read our spec-valid files and agree on
    the exact pixels of a block-constant fixture (skip-marked tier: this
    container lacks Pillow, but the path is pinned wherever it exists)."""
    import pytest

    PIL = pytest.importorskip("PIL.Image")
    import io

    from poc_juma_etl_spark.operators.multimodal import (
        decode_jpeg_pixels,
        synth_jpeg_media,
    )

    payload = synth_jpeg_media(4)
    im = PIL.open(io.BytesIO(payload)).convert("L")
    W, H, lines = decode_jpeg_pixels(payload)
    assert (im.width, im.height) == (W, H)
    assert list(im.getdata()) == [px for ln in lines for px in ln]


def test_jpeg_restart_intervals_roundtrip():
    """DRI/RSTn support (r8): restart markers must not change decoded
    pixels at any interval; the RSTn index cycles 0-7 and wraps; an
    out-of-sequence marker fails loudly (data-loss detection — that is
    what restart markers are FOR)."""
    import pytest

    from poc_juma_etl_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_gray,
    )

    w, h = 40, 24  # 15 MCUs: interval 1 emits 14 RSTn and wraps past RST7
    rows = [
        bytes((5 * (x // 8) + 11 * (y // 8) + 37) % 256 for x in range(w))
        for y in range(h)
    ]
    grad = [bytes((x + 3 * y) % 256 for x in range(w)) for y in range(h)]
    base = decode_jpeg_pixels(encode_jpeg_gray(grad))[2]
    for ri in (0, 1, 3, 7):
        assert decode_jpeg_pixels(encode_jpeg_gray(rows, restart_interval=ri))[2] == rows
        assert decode_jpeg_pixels(encode_jpeg_gray(grad, restart_interval=ri))[2] == base
    # corrupt one marker's index: out-of-sequence must raise, not desync
    p = encode_jpeg_gray(rows, restart_interval=1)
    i = p.find(b"\xff\xd1")
    with pytest.raises(ValueError, match="out of sequence"):
        decode_jpeg_pixels(p[:i] + b"\xff\xd5" + p[i + 2 :])


# round-9: chroma-subsampled YCbCr (4:2:0 / 4:2:2 / 4:4:4) — the encoder is
# again the decoder's harness; chroma planes verify via the box upsample.


def _ycbcr_planes(w, h, hs, vs, seed=7):
    y = [
        bytes((5 * (x // 8) + 11 * (yy // 8) + seed) % 256 for x in range(w))
        for yy in range(h)
    ]
    cw, ch = -(-w // hs), -(-h // vs)
    cb = [
        bytes((7 * (x // 8) + 13 * (yy // 8) + seed) % 256 for x in range(cw))
        for yy in range(ch)
    ]
    cr = [
        bytes((3 * (x // 8) + 17 * (yy // 8) + 5 * seed) % 256 for x in range(cw))
        for yy in range(ch)
    ]
    return y, cb, cr


def test_jpeg_ycbcr_roundtrip_all_samplings():
    """Block-constant planes roundtrip BIT-EXACTLY through every supported
    sampling layout; chroma comes back box-replicated to full resolution
    (full[y][x] == plane[y*v//vmax][x*h//hmax])."""
    from poc_juma_etl_spark.operators.multimodal import (
        decode_jpeg_planes,
        encode_jpeg_ycbcr,
    )

    w, h = 32, 16
    for hs, vs in ((2, 2), (2, 1), (1, 2), (1, 1)):
        y, cb, cr = _ycbcr_planes(w, h, hs, vs)
        W, H, planes = decode_jpeg_planes(encode_jpeg_ycbcr(y, cb, cr, (hs, vs)))
        assert (W, H) == (w, h)
        assert planes[0] == y
        assert planes[1] == [
            bytes(cb[yy // vs][x // hs] for x in range(w)) for yy in range(h)
        ]
        assert planes[2] == [
            bytes(cr[yy // vs][x // hs] for x in range(w)) for yy in range(h)
        ]


def test_jpeg_420_gradient_lossy_but_bounded():
    """Gradient luma + gradient chroma through 4:2:0: the full AC path on
    all three components; error bounded by the AC quant step on each
    plane (compared at native chroma resolution, pre-upsample)."""
    from poc_juma_etl_spark.operators.multimodal import (
        decode_jpeg_planes,
        encode_jpeg_ycbcr,
    )

    w, h = 32, 32
    y = [bytes((x + 3 * yy) % 256 for x in range(w)) for yy in range(h)]
    cb = [bytes((2 * x + yy) % 256 for x in range(w // 2)) for yy in range(h // 2)]
    cr = [bytes((x + 5 * yy) % 256 for x in range(w // 2)) for yy in range(h // 2)]
    W, H, planes = decode_jpeg_planes(encode_jpeg_ycbcr(y, cb, cr, (2, 2)))
    assert (W, H) == (w, h)
    for plane, ref, step in ((planes[0], y, 1), (planes[1], cb, 2), (planes[2], cr, 2)):
        # chroma planes: compare the upsampled result's 2x2 quads' top-left
        native = (
            plane
            if step == 1
            else [bytes(plane[yy * 2][x * 2] for x in range(w // 2)) for yy in range(h // 2)]
        )
        errs = [
            abs(a - b) for ra, rb in zip(ref, native) for a, b in zip(ra, rb)
        ]
        assert sum(errs) / len(errs) < 4.0, "mean error exceeds AC quant bound"
        assert max(errs) < 48


def test_jpeg_420_restart_and_odd_dims():
    """4:2:0 with restart markers resets ALL THREE DC predictors; odd
    (non-16-multiple) dimensions pad on encode and crop on decode."""
    from poc_juma_etl_spark.operators.multimodal import (
        decode_jpeg_planes,
        encode_jpeg_ycbcr,
    )

    w, h = 40, 24  # 4:2:0 MCUs are 16x16 -> 3x2 grid with padded edges
    y, cb, cr = _ycbcr_planes(w, h, 2, 2, seed=19)
    base = decode_jpeg_planes(encode_jpeg_ycbcr(y, cb, cr, (2, 2)))[2]
    for ri in (1, 2, 5):
        got = decode_jpeg_planes(
            encode_jpeg_ycbcr(y, cb, cr, (2, 2), restart_interval=ri)
        )[2]
        assert got == base
    w2, h2 = 19, 13  # odd dims: chroma planes are ceil(19/2) x ceil(13/2)
    y2, cb2, cr2 = _ycbcr_planes(w2, h2, 2, 2, seed=3)
    W, H, planes = decode_jpeg_planes(encode_jpeg_ycbcr(y2, cb2, cr2, (2, 2)))
    assert (W, H) == (w2, h2)
    assert planes[0] == y2
    assert planes[1] == [
        bytes(cb2[yy // 2][x // 2] for x in range(w2)) for yy in range(h2)
    ]


def test_jpeg_chroma_tables_wellformed():
    """The Annex-K chrominance Huffman specs must be internally consistent
    (BITS sums to len(HUFFVAL); canonical assignment yields a prefix code
    the decoder can rebuild from the file's own DHT)."""
    from poc_juma_etl_spark.operators.multimodal import (
        _AC_BITS_C,
        _AC_VALS_C,
        _DC_BITS_C,
        _DC_VALS_C,
        _huff_codes,
    )

    assert sum(_DC_BITS_C) == len(_DC_VALS_C) == 12
    assert sum(_AC_BITS_C) == len(_AC_VALS_C) == 162
    for bits, vals in ((_DC_BITS_C, _DC_VALS_C), (_AC_BITS_C, _AC_VALS_C)):
        codes = _huff_codes(bits, vals)
        assert len(codes) == len(vals)  # no duplicate symbols
        # prefix property: no code is a prefix of a longer one
        seen = sorted(codes.values(), key=lambda cl: cl[1])
        for i, (c1, l1) in enumerate(seen):
            for c2, l2 in seen[i + 1 :]:
                assert not (l2 > l1 and (c2 >> (l2 - l1)) == c1), "prefix clash"


def test_jpeg_420_pillow_interop():
    """Where Pillow exists it must read our 4:2:0 files and agree on the
    luma plane of a block-constant fixture (skip-marked tier: this
    container lacks Pillow)."""
    import pytest

    PIL = pytest.importorskip("PIL.Image")
    import io

    from poc_juma_etl_spark.operators.multimodal import (
        decode_jpeg_planes,
        synth_jpeg420_media,
    )

    payload = synth_jpeg420_media(4)
    im = PIL.open(io.BytesIO(payload)).draft(None, None) or PIL.open(
        io.BytesIO(payload)
    )
    im = im.convert("YCbCr")
    W, H, planes = decode_jpeg_planes(payload)
    assert (im.width, im.height) == (W, H)
    got_y = list(im.getdata(0))
    assert got_y == [px for ln in planes[0] for px in ln]


# round-9: progressive JPEG (SOF2, Annex G) — the encoder twin emits the
# classic libjpeg scan script (DC successive approximation + spectral
# selection + AC refinement); since progressive transmits the SAME quantized
# coefficients as baseline, decoded pixels must be bit-identical to the
# baseline codec's on every input.


def test_jpeg_progressive_equals_baseline_gray():
    from poc_juma_etl_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_gray,
        encode_jpeg_progressive,
    )

    w, h = 37, 23  # odd dims: edge-padded blocks through every scan kind
    for img in (
        [bytes((x + 3 * y) % 256 for x in range(w)) for y in range(h)],
        [bytes((5 * (x // 8) + 11 * (y // 8) + 37) % 256 for x in range(w)) for y in range(h)],
        [bytes([128] * w) for _ in range(h)],  # all-EOB AC bands
    ):
        base = decode_jpeg_pixels(encode_jpeg_gray(img))
        prog = decode_jpeg_pixels(encode_jpeg_progressive(img))
        assert base == prog


def test_jpeg_progressive_equals_baseline_color():
    from poc_juma_etl_spark.operators.multimodal import (
        decode_jpeg_planes,
        encode_jpeg_progressive,
        encode_jpeg_ycbcr,
    )

    W, H = 48, 32
    y = [bytes((x + 3 * yy) % 256 for x in range(W)) for yy in range(H)]
    for hs, vs in ((2, 2), (2, 1), (1, 1)):
        cw, ch = -(-W // hs), -(-H // vs)
        cb = [bytes((2 * x + yy) % 256 for x in range(cw)) for yy in range(ch)]
        cr = [bytes((x + 5 * yy) % 256 for x in range(cw)) for yy in range(ch)]
        b = decode_jpeg_planes(encode_jpeg_ycbcr(y, cb, cr, (hs, vs)))
        p = decode_jpeg_planes(encode_jpeg_progressive(y, cb, cr, (hs, vs)))
        assert b == p, f"sampling {(hs, vs)}"


def test_jpeg_progressive_random_noise_stress():
    """Deterministic pseudo-noise maximizes AC density and sign mix —
    EOBRUN accumulation across blocks, ZRL runs, newly-significant vs
    correction-bit paths in the refinement scans all fire. Progressive
    must still equal baseline bit-for-bit."""
    from poc_juma_etl_spark.operators.multimodal import (
        decode_jpeg_pixels,
        decode_jpeg_planes,
        encode_jpeg_gray,
        encode_jpeg_progressive,
        encode_jpeg_ycbcr,
    )

    def noise(w, h, seed):
        return [
            bytes((x * 197 + y * 83 + seed * 131 + (x * y * 7)) % 256 for x in range(w))
            for y in range(h)
        ]

    for seed, (w, h) in enumerate(((16, 16), (40, 24), (17, 9))):
        img = noise(w, h, seed)
        assert decode_jpeg_pixels(encode_jpeg_progressive(img)) == decode_jpeg_pixels(
            encode_jpeg_gray(img)
        )
    W, H = 32, 32
    y, cb, cr = noise(W, H, 1), noise(W // 2, H // 2, 2), noise(W // 2, H // 2, 3)
    assert decode_jpeg_planes(encode_jpeg_progressive(y, cb, cr, (2, 2))) == (
        decode_jpeg_planes(encode_jpeg_ycbcr(y, cb, cr, (2, 2)))
    )


def test_jpeg_progressive_decode_real_dispatch():
    """decode_real must route a progressive payload through the stdlib
    path (previously the NotImplementedError tier) and report luma stats
    identical to the baseline encoding of the same plane."""
    from poc_juma_etl_spark.operators.multimodal import (
        decode_real,
        encode_jpeg_gray,
        encode_jpeg_progressive,
    )

    w, h = 24, 16
    img = [bytes((x + 2 * y) % 256 for x in range(w)) for y in range(h)]
    d_prog = decode_real(encode_jpeg_progressive(img))
    d_base = decode_real(encode_jpeg_gray(img))
    assert d_prog["media_kind"] == "jpeg"
    assert d_prog == d_base


def test_jpeg_progressive_truncation_raises_valueerror():
    from poc_juma_etl_spark.operators.multimodal import (
        decode_jpeg_pixels,
        encode_jpeg_progressive,
    )

    import pytest

    img = [bytes((x + y) % 256 for x in range(24)) for y in range(16)]
    p = encode_jpeg_progressive(img)
    with pytest.raises(ValueError):
        decode_jpeg_pixels(p[: len(p) // 2])


def test_jpeg_progressive_property_random_images():
    """Hypothesis: random images x random dims x gray/color — progressive
    decode must equal baseline decode bit-for-bit on every example (both
    transmit the same quantized coefficients; only scan packaging differs).
    Bounded examples: the codec is pure Python."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from poc_juma_etl_spark.operators.multimodal import (
        decode_jpeg_pixels,
        decode_jpeg_planes,
        encode_jpeg_gray,
        encode_jpeg_progressive,
        encode_jpeg_ycbcr,
    )

    @settings(max_examples=12, deadline=None)
    @given(
        w=st.integers(9, 40),
        h=st.integers(9, 32),
        seed=st.integers(0, 2**31),
        color=st.booleans(),
        data=st.data(),
    )
    def check(w, h, seed, color, data):
        def plane(pw, ph, s):
            return [
                bytes((x * 197 + y * 83 + s * 131 + x * y * 7) % 256 for x in range(pw))
                for y in range(ph)
            ]

        if not color:
            img = plane(w, h, seed)
            assert decode_jpeg_pixels(encode_jpeg_progressive(img)) == (
                decode_jpeg_pixels(encode_jpeg_gray(img))
            )
        else:
            hs = data.draw(st.sampled_from([1, 2]))
            vs = data.draw(st.sampled_from([1, 2]))
            cw, ch = -(-w // hs), -(-h // vs)
            y = plane(w, h, seed)
            cb = plane(cw, ch, seed + 1)
            cr = plane(cw, ch, seed + 2)
            assert decode_jpeg_planes(encode_jpeg_progressive(y, cb, cr, (hs, vs))) == (
                decode_jpeg_planes(encode_jpeg_ycbcr(y, cb, cr, (hs, vs)))
            )

    check()


def test_jpeg_corrupt_stream_fuzz_contract():
    """Web corpora contain corrupt payloads: any truncation or byte flip of
    a valid (baseline or progressive) stream must either still decode or
    raise the documented contract classes (ValueError for malformed,
    NotImplementedError for valid-but-unsupported) — never a raw
    IndexError/KeyError/struct.error out of the parser internals, and never
    an out-of-range pixel. Deterministic seeds keep the sweep replayable."""
    import random

    from poc_juma_etl_spark.operators.multimodal import (
        decode_jpeg_planes,
        encode_jpeg_gray,
        encode_jpeg_progressive,
        encode_jpeg_ycbcr,
    )

    w, h = 24, 16
    img = [bytes((x * 7 + y * 3) % 256 for x in range(w)) for y in range(h)]
    cb = [bytes((x + y) % 256 for x in range(w // 2)) for y in range(h // 2)]
    payloads = [
        encode_jpeg_gray(img, restart_interval=2),
        encode_jpeg_ycbcr(img, cb, cb, (2, 2)),
        encode_jpeg_progressive(img),
        encode_jpeg_progressive(img, cb, cb, (2, 2)),
    ]
    rng = random.Random(20260815)
    for p in payloads:
        for cut in range(2, len(p), max(len(p) // 37, 1)):  # truncations
            try:
                decode_jpeg_planes(p[:cut])
            except (ValueError, NotImplementedError):
                pass
        for _ in range(150):  # byte flips
            i = rng.randrange(len(p))
            mutated = p[:i] + bytes([p[i] ^ (1 << rng.randrange(8))]) + p[i + 1 :]
            try:
                w2, h2, planes = decode_jpeg_planes(mutated)
                # structural invariants on whatever decodes: bounded dims
                # and rectangular planes (a pixel-range check would be
                # vacuous — plane lines are bytes, 0..255 by construction)
                from poc_juma_etl_spark.operators.multimodal import (
                    MAX_JPEG_PIXELS,
                )

                assert 0 < w2 * h2 <= MAX_JPEG_PIXELS
                for lines, _hc, _vc in planes:
                    assert len({len(ln) for ln in lines}) <= 1
            except (ValueError, NotImplementedError):
                pass


def test_png_wav_corrupt_stream_fuzz_contract():
    """The JPEG/AVI fuzz contract extended to the other stdlib decoders:
    truncations and byte flips of PNG and WAV payloads must decode or raise
    the typed contract classes — never a raw zlib.error / wave.Error /
    EOFError / RuntimeError / struct.error out of the stdlib parsers
    (round-9: decode_png guards the chunk walk and wraps inflate;
    decode_wav and audio.wav_frame_features wrap the wave/chunk modules'
    whole error-class inventory)."""
    import random

    from poc_juma_etl_spark.operators.audio import synth_wav, wav_frame_features
    from poc_juma_etl_spark.operators.multimodal import (
        decode_png,
        decode_wav,
        encode_png_gray,
        encode_wav_pcm16,
    )

    rows = [bytes((x * 7 + y * 3) % 256 for x in range(24)) for y in range(16)]
    wav = encode_wav_pcm16([((i * 31) % 65536) - 32768 for i in range(100)], 8000)
    targets = [
        (decode_png, encode_png_gray(rows)),
        (decode_wav, wav),
        (wav_frame_features, synth_wav(11)),
    ]
    rng = random.Random(20260816)
    for fn, p in targets:
        for cut in range(0, len(p), max(len(p) // 53, 1)):
            try:
                fn(p[:cut])
            except (ValueError, NotImplementedError):
                pass
        for _ in range(300):
            i = rng.randrange(len(p))
            mutated = p[:i] + bytes([p[i] ^ (1 << rng.randrange(8))]) + p[i + 1 :]
            try:
                fn(mutated)
            except (ValueError, NotImplementedError):
                pass


def test_jpeg_malformed_header_contract_cases():
    """Regression pins for the round-9 review findings: specific malformed
    headers must raise the documented classes, never raw exceptions or the
    misleading Pillow-tier NotImplementedError."""
    import struct

    import pytest

    from poc_juma_etl_spark.operators.multimodal import (
        decode_jpeg_planes,
        encode_jpeg_ycbcr,
    )

    # SOS before any SOF is MALFORMED (ValueError), not a Pillow flavor
    stream = b"\xff\xd8\xff\xda\x00\x08\x01\x01\x00\x00\x3f\x00\xff\xd9"
    with pytest.raises(ValueError, match="no SOF"):
        decode_jpeg_planes(stream)

    w, h = 16, 16
    img = [bytes((x * 7 + y * 3) % 256 for x in range(w)) for y in range(h)]
    cb = [bytes((x + y) % 256 for x in range(w // 2)) for y in range(h // 2)]
    p = bytearray(encode_jpeg_ycbcr(img, cb, cb, (2, 2)))

    # duplicate SOS component id -> typed ValueError (was raw StopIteration)
    i = p.index(b"\xff\xda")
    # SOS payload: len(2) ns(1) then (cid, tables) pairs — flip 2nd cid to 3
    p2 = bytearray(p)
    p2[i + 5 + 2] = 3
    with pytest.raises((ValueError, NotImplementedError)):
        decode_jpeg_planes(bytes(p2))

    # implausible SOF dims -> typed ValueError BEFORE allocation
    j = p.index(b"\xff\xc0")
    p3 = bytearray(p)
    struct.pack_into(">HH", p3, j + 5, 65535, 65535)
    with pytest.raises(ValueError, match="implausible"):
        decode_jpeg_planes(bytes(p3))

    # chroma rows with right count but wrong width -> typed ValueError
    bad_cb = [row[:-1] for row in cb]
    with pytest.raises(ValueError, match="chroma planes"):
        encode_jpeg_ycbcr(img, bad_cb, cb, (2, 2))


def test_jpeg_prog_fixture_matches_closed_form():
    """The progressive gate's fixture generator + multi-scan decoder must
    reproduce the closed-form plane sums the DuckDB oracle computes —
    pure-Python local repro for the registered q_multimodal_jpeg_prog_decode
    gate (the registry-wide oracle-parity sweep covers the Spark side)."""
    from poc_juma_etl_spark.operators.multimodal import (
        decode_jpeg_planes,
        synth_jpeg_prog_media,
    )

    for doc_id in range(24):
        payload = synth_jpeg_prog_media(doc_id)
        assert b"\xff\xc2" in payload, "fixture must be SOF2 progressive"
        w, h, planes = decode_jpeg_planes(payload)
        if doc_id % 2 == 0:
            nbx, nby = 2 + doc_id % 4, 1 + doc_id % 3
            assert (w, h) == (8 * nbx, 8 * nby)
            assert len(planes) == 1
            want_y = 64 * sum(
                (7 * bx + 5 * by + doc_id) % 256
                for bx in range(nbx)
                for by in range(nby)
            )
            assert sum(sum(ln) for ln in planes[0]) == want_y
        else:
            nbx, nby = 2 * (1 + doc_id % 3), 2 * (1 + doc_id % 2)
            assert (w, h) == (8 * nbx, 8 * nby)
            assert len(planes) == 3
            want_y = 64 * sum(
                (7 * bx + 5 * by + 3 * doc_id) % 256
                for bx in range(nbx)
                for by in range(nby)
            )
            want_cb = 256 * sum(
                (11 * bx + 3 * by + 7 * doc_id) % 256
                for bx in range(nbx // 2)
                for by in range(nby // 2)
            )
            want_cr = 256 * sum(
                (13 * bx + 9 * by + doc_id) % 256
                for bx in range(nbx // 2)
                for by in range(nby // 2)
            )
            assert sum(sum(ln) for ln in planes[0]) == want_y
            assert sum(sum(ln) for ln in planes[1]) == want_cb
            assert sum(sum(ln) for ln in planes[2]) == want_cr
