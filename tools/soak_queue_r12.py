"""sf1 re-soak for the round-12 QUEUE operators on the round-11 closing
tree (r10 verdict #2: keep the queue's soak evidence fresh so the r12
drain is a one-commit registry edit). Runs each against the replicated
sf1 fixture with full Spark-vs-DuckDB value parity and prints wall
times — the same evidence the on-arrival rule records for registered
gates. The round-13 MP3 candidate rides along.

Usage: SPARK_GRAFT_DRIVER_MEM=64g python tools/soak_queue_r12.py [sf_dir] [names...]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

import duckdb  # noqa: E402

SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/soak_sf1"


def main() -> int:
    from poc_juma_etl_spark.plans.queries import release_caches
    from poc_juma_etl_spark.session import get_spark

    spark = get_spark("soak-queue-r12")
    con = duckdb.connect()
    for p in sorted(Path(SF).glob("*.parquet")):
        con.execute(f"CREATE VIEW {p.stem} AS SELECT * FROM '{p}'")

    from poc_juma_etl_spark.operators.lm import (
        BIGRAM_SURPRISAL_ORACLE,
        group_split_oracle_sql,
        q_sample_group_split,
        q_text_bigram_surprisal,
    )
    from poc_juma_etl_spark.operators.mp3 import MP3_ORACLE, q_multimodal_mp3_probe
    from poc_juma_etl_spark.operators.tar import (
        TAR_ORACLE,
        TAR_SHARD_ORACLE,
        etl_tar_shard_ingest_e2e,
        q_multimodal_tar_ingest,
    )
    from poc_juma_etl_spark.operators.qdigest import (
        q_sketch_quantile_digest,
        qdigest_oracle_sql,
    )
    from poc_juma_etl_spark.operators.warc import (
        WARC_FILE_ORACLE,
        WARC_ORACLE,
        etl_warc_file_ingest_e2e,
        q_multimodal_warc_ingest,
    )
    from poc_juma_etl_spark.plans.extra11 import (
        JSONL_GZ_ORACLE,
        XML_ROUNDTRIP_ORACLE,
        etl_jsonl_gzip_roundtrip_e2e,
        etl_xml_roundtrip_e2e,
    )
    from poc_juma_etl_spark.plans.extra10 import (
        ORC_ROUNDTRIP_ORACLE,
        etl_orc_roundtrip_e2e,
    )
    from poc_juma_etl_spark.streaming.quantile import q_stream_quantile_digest

    jobs = [
        ("q_text_bigram_surprisal", q_text_bigram_surprisal, BIGRAM_SURPRISAL_ORACLE),
        ("q_sample_group_split", q_sample_group_split, group_split_oracle_sql()),
        ("etl_orc_roundtrip_e2e", etl_orc_roundtrip_e2e, ORC_ROUNDTRIP_ORACLE),
        ("q_sketch_quantile_digest", q_sketch_quantile_digest, qdigest_oracle_sql()),
        ("q_stream_quantile_digest", q_stream_quantile_digest, qdigest_oracle_sql()),
        ("q_multimodal_warc_ingest", q_multimodal_warc_ingest, WARC_ORACLE),
        ("etl_warc_file_ingest_e2e", etl_warc_file_ingest_e2e, WARC_FILE_ORACLE),
        ("q_multimodal_mp3_probe", q_multimodal_mp3_probe, MP3_ORACLE),
        ("q_multimodal_tar_ingest", q_multimodal_tar_ingest, TAR_ORACLE),
        ("etl_tar_shard_ingest_e2e", etl_tar_shard_ingest_e2e, TAR_SHARD_ORACLE),
        ("etl_jsonl_gzip_roundtrip_e2e", etl_jsonl_gzip_roundtrip_e2e, JSONL_GZ_ORACLE),
        ("etl_xml_roundtrip_e2e", etl_xml_roundtrip_e2e, XML_ROUNDTRIP_ORACLE),
    ]
    if len(sys.argv) > 2:
        want = set(sys.argv[2:])
        jobs = [j for j in jobs if j[0] in want]
    failures = 0
    for name, fn, oracle in jobs:
        t0 = time.time()
        got = [tuple(r) for r in fn(spark, SF).collect()]
        spark_s = time.time() - t0
        release_caches()
        t0 = time.time()
        want_rows = [tuple(r) for r in con.execute(oracle).fetchall()]
        duck_s = time.time() - t0
        ok = got == want_rows
        failures += 0 if ok else 1
        print(
            f"{name}: {'HASH-GREEN' if ok else 'MISMATCH'} "
            f"rows={len(got)} spark={spark_s:.1f}s duckdb={duck_s:.1f}s",
            flush=True,
        )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
