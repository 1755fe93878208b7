"""Empty-input contract: queries over zero-row tables return empty (or
constant-shaped) results — they never raise.

Pins the 15 crashers the round-6 sweep (tools/empty_sweep.py) flushed out,
one representative per root cause:

- centroid/codebook literals from an empty seed collect
  (``array_min(array())`` fails ANALYSIS — kmeans/pq/vectors families);
- warehouse read-back after the S6 empty-guard skipped the write
  (range-replace / erasure / compact / gold e2e);
- single-file parquet assumptions (REST source schema, stream sentinel
  staging) breaking on directory-shaped tables — which is ALSO what every
  Spark-written production table looks like.

The full-registry sweep runs via ``python tools/empty_sweep.py`` (per
round, like the sf1 soak); this test keeps the fixed classes fixed at
unit-test cost.
"""

import pytest

# one per root-cause family (the full registry runs in tools/empty_sweep.py)
REPRESENTATIVES = [
    "q_ann_ivf_topk",  # seed_cell_struct_array literal (kmeans.qv_seeds)
    "q_kmeans_lloyd_exact",  # Lloyd update loop over actual centroid count
    "q_ann_pq_topk",  # PQ codebook k-loops bounded by len(cb[mi])
    "q_ann_ivfpq_residual_topk",  # coarse-cell loops bounded by len(coarse)
    "q_semantic_dedup",  # shared seed router via qv_seeds
    "etl_range_replace_e2e",  # read_table(..., like=) after skipped write
    "etl_user_erasure_e2e",  # delete_keys no-op on never-written table
    "etl_compact_e2e",  # table_file_stats/compact_table on missing path
    "etl_gold_materialize_e2e",  # empty-view materialization read-back
    "etl_rest_source_scan",  # directory-shaped parquet schema resolution
    "q_stream_interval_join_outer",  # sentinel staging from a parquet dir
]


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    from poc_juma_etl_spark.catalog import SCHEMAS, table_path

    d = str(tmp_path_factory.mktemp("empty_sf"))
    for name, schema in SCHEMAS.items():
        spark.createDataFrame([], schema).write.mode("overwrite").parquet(
            table_path(d, name)
        )
    return d


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_empty_input_returns_not_raises(spark, empty_sf, name):
    from poc_juma_etl_spark import all_queries
    from poc_juma_etl_spark.plans.queries import release_caches

    try:
        n = all_queries()[name].fn(spark, empty_sf).count()
    finally:
        release_caches()
    assert n == 0, f"{name} produced {n} rows from zero-row inputs"
