"""sf1 soak for the round-10 QUEUE operators (pca/kmv/audio — built and
oracle-paired this round, registration deferred so the r04 evidence tail
retires in one driver window). Runs each against the replicated sf1
fixture with full Spark-vs-DuckDB value parity and prints wall times —
the same evidence the on-arrival rule records for registered gates.

Usage: SPARK_GRAFT_DRIVER_MEM=64g python tools/soak_queue_r9.py [sf_dir]
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
    from pyspark.sql import SparkSession

    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "64g")
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.driver.memory", mem)
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in ("orders", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

    from poc_juma_etl_spark.operators.audio import (
        AUDIO_ORACLE,
        q_multimodal_audio_features,
    )
    from poc_juma_etl_spark.operators.kmv import KMV_ORACLE, q_sketch_kmv_setops
    from poc_juma_etl_spark.operators.pca import pca_oracle_sql, pca_power_iteration

    jobs = [
        ("q_sketch_kmv_setops", lambda: q_sketch_kmv_setops(spark, SF), KMV_ORACLE),
        (
            "q_multimodal_audio_features",
            lambda: q_multimodal_audio_features(spark, SF),
            AUDIO_ORACLE,
        ),
        (
            "q_pca_power_iteration",
            lambda: pca_power_iteration(spark, SF),
            pca_oracle_sql(),
        ),
    ]
    failures = 0
    for name, fn, oracle in jobs:
        t0 = time.time()
        got = [tuple(r) for r in fn().collect()]
        spark_s = time.time() - t0
        t0 = time.time()
        want = [tuple(r) for r in con.execute(oracle).fetchall()]
        duck_s = time.time() - t0
        ok = got == want
        failures += 0 if ok else 1
        print(
            f"{name}: {'HASH-GREEN' if ok else 'MISMATCH'} "
            f"rows={len(got)} spark={spark_s:.1f}s duckdb={duck_s:.1f}s",
            flush=True,
        )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
