"""Round-13 measurement (guide §1): profile the codec-tier kernels standalone
(no Spark) over the exact sf0.1 doc_id domain, so the optimization targets the
functions that actually burn CPU, not guesses.

Usage: python tools/profile_codecs_r13.py [kernel ...]
Kernels: jpeg420 jpeg jpeg_prog png_decode phash video warc mp3 wav
"""

from __future__ import annotations

import cProfile
import io
import pstats
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import pyarrow.parquet as pq

DOC_IDS = pq.read_table(
    "/root/testdata/sf0.1/documents.parquet", columns=["doc_id"]
)["doc_id"].to_pylist()


def run_jpeg420():
    from poc_juma_etl_spark.operators.multimodal import (
        decode_jpeg_planes,
        synth_jpeg420_media,
    )

    for d in DOC_IDS:
        decode_jpeg_planes(synth_jpeg420_media(int(d)))


def run_jpeg():
    from poc_juma_etl_spark.operators.multimodal import (
        decode_real,
        synth_jpeg_media,
    )

    for d in DOC_IDS:
        decode_real(synth_jpeg_media(int(d)))


def run_jpeg_prog():
    from poc_juma_etl_spark.operators.multimodal import (
        decode_jpeg_planes,
        synth_jpeg_prog_media,
    )

    for d in DOC_IDS:
        decode_jpeg_planes(synth_jpeg_prog_media(int(d)))


def run_png_decode():
    from poc_juma_etl_spark.operators.multimodal import (
        decode_real,
        synth_media,
    )

    for d in DOC_IDS:
        decode_real(synth_media(int(d)))


def run_phash():
    from poc_juma_etl_spark.operators.multimodal import (
        ahash_bits,
        decode_png_pixels,
        synth_phash_media,
    )

    for d in DOC_IDS:
        ahash_bits(*decode_png_pixels(synth_phash_media(int(d))))


def run_video():
    from poc_juma_etl_spark.operators.video import decode_avi, encode_avi_rgb24

    import numpy as np

    for d in DOC_IDS:
        v = decode_avi(encode_avi_rgb24(int(d)))
        sampled = v["frames"][::2]
        h = v["height"]
        weights = np.arange(1, h + 1, dtype=np.int64)
        for fr in sampled:
            arr = np.frombuffer(b"".join(fr), dtype=np.uint8).astype(np.int64)
            per_row = arr.reshape(h, -1).sum(axis=1)
            (per_row * weights).sum()


def run_warc():
    import hashlib

    from poc_juma_etl_spark.operators.warc import encode_warc, parse_warc

    for d in DOC_IDS:
        recs = parse_warc(encode_warc(int(d)))
        sum(
            int(hashlib.md5(r["body"].encode()).hexdigest()[:15], 16)
            for r in recs
            if r["warc_type"] == "response"
        )


def run_mp3():
    from poc_juma_etl_spark.operators.mp3 import encode_mp3, parse_mp3

    for d in DOC_IDS:
        parse_mp3(encode_mp3(int(d)))


def run_wav():
    from poc_juma_etl_spark.operators.multimodal import decode_wav, synth_media

    for d in DOC_IDS:
        if int(d) % 2 == 1:
            decode_wav(synth_media(int(d)))


KERNELS = {
    "jpeg420": run_jpeg420,
    "jpeg": run_jpeg,
    "jpeg_prog": run_jpeg_prog,
    "png_decode": run_png_decode,
    "phash": run_phash,
    "video": run_video,
    "warc": run_warc,
    "mp3": run_mp3,
    "wav": run_wav,
}


def main() -> None:
    names = sys.argv[1:] or list(KERNELS)
    for name in names:
        fn = KERNELS[name]
        t0 = time.perf_counter()
        fn()
        wall = time.perf_counter() - t0
        pr = cProfile.Profile()
        pr.enable()
        fn()
        pr.disable()
        buf = io.StringIO()
        pstats.Stats(pr, stream=buf).sort_stats("cumulative").print_stats(14)
        print(f"\n===== {name}: {wall:.2f}s single-core over {len(DOC_IDS)} docs =====")
        print("\n".join(buf.getvalue().splitlines()[4:30]))


if __name__ == "__main__":
    main()
