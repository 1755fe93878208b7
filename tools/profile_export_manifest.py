"""Stage-by-stage warm profile of q_corpus_export_manifest (round-11
directive #3: slowest headline query two rounds running — find whether a
stage re-executes shared lineage, or document a stage-bound verdict).

Protocol: ONE session, each measurement runs twice and the SECOND
(warm) time is reported; stages are timed cumulatively (each prefix of
the pipeline to an action) so stage cost = delta between prefixes.
Run on a QUIET host — session-order noise dwarfs stage ratios.

Usage: SPARK_GRAFT_DRIVER_MEM=64g python tools/profile_export_manifest.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

SF = sys.argv[1] if len(sys.argv) > 1 else "/tmp/soak_sf1"


def main() -> int:
    from pyspark.sql import functions as F

    from poc_juma_etl_spark.session import get_spark
    from poc_juma_etl_spark.plans.queries import release_caches

    # driver memory comes from $SPARK_GRAFT_DRIVER_MEM inside get_spark
    spark = get_spark("profile-manifest", master="local[32]", shuffle_partitions=32)

    from poc_juma_etl_spark import all_queries
    from poc_juma_etl_spark.catalog import load_table
    from poc_juma_etl_spark.operators.components import (
        connected_components,
        jaccard_edges,
        q_dedup_pipeline_keep,
    )
    from poc_juma_etl_spark.operators.sampling import budget_select
    from poc_juma_etl_spark.operators.text import tokens
    from poc_juma_etl_spark.plans.extra9 import EXPORT_BUDGET

    def timed(label, thunk):
        for i in (0, 1):
            release_caches()
            t0 = time.time()
            thunk()
            dt = time.time() - t0
        print(f"{label}: warm {dt:.2f}s", flush=True)
        return dt

    d = load_table(spark, SF, "documents")

    timed("S1 jaccard_edges.count", lambda: jaccard_edges(d).count())
    timed(
        "S1+S2 components.count",
        lambda: connected_components(jaccard_edges(d)).count(),
    )
    timed(
        "S1..S3 pipeline_keep.count",
        lambda: q_dedup_pipeline_keep(spark, SF).count(),
    )

    def to_sel():
        keep = q_dedup_pipeline_keep(spark, SF).select(
            F.col("kept_doc_id").alias("doc_id"),
            F.col("kept_quality").alias("quality"),
        )
        ntok = load_table(spark, SF, "documents").select(
            "doc_id", F.size(tokens("text")).cast("bigint").alias("n_tokens")
        )
        return budget_select(spark, keep.join(ntok, "doc_id"), EXPORT_BUDGET)

    timed("S1..S5 budget_select.count", lambda: to_sel().count())

    spec = all_queries()["q_corpus_export_manifest"]
    timed("full manifest.collect", lambda: spec.fn(spark, SF).collect())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
