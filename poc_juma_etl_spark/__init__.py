"""poc_juma_etl_spark — a PySpark-native analytics/ETL engine.

A from-scratch re-expression of the capabilities of the reference pipeline
``fe-malveira-87/poc-juma-etl`` (a BigQuery-delegating batch ETL, see
SURVEY.md) as an idiomatic Spark engine:

- ``session``    — SparkSession factory (AQE, dynamic partition overwrite, UTC)
- ``catalog``    — explicit StructType schemas + parquet loaders for the star schema
- ``registry``   — SERVICE_MAP-shaped table registry driving the ETL half
- ``operators/`` — normalize, range-replace, dedup, similarity, text analysis
- ``sources/``   — parquet source + paginated-REST Python DataSource
- ``plans/``     — analytical query surface + gold-layer materializer
- ``streaming/`` — Structured Streaming over the events table
"""

__version__ = "0.1.0"


def all_queries():
    """Import every module that registers queries and return the full
    registry {name: QuerySpec}. Import errors in optional modules are
    re-raised — the registry must be complete or loudly broken, never
    silently partial."""
    from .plans import queries as _q  # noqa: F401

    for mod in (
        "poc_juma_etl_spark.plans.advanced",
        "poc_juma_etl_spark.plans.etl_e2e",
        "poc_juma_etl_spark.plans.extra2",
        "poc_juma_etl_spark.plans.tpch_extra",
        "poc_juma_etl_spark.plans.joins",
        "poc_juma_etl_spark.plans.windows",
        "poc_juma_etl_spark.plans.setops",
        "poc_juma_etl_spark.plans.events",
        "poc_juma_etl_spark.operators.normalize",
        "poc_juma_etl_spark.operators.range_replace",
        "poc_juma_etl_spark.operators.bm25",
        "poc_juma_etl_spark.operators.components",
        "poc_juma_etl_spark.operators.dedup",
        "poc_juma_etl_spark.operators.grouped_map",
        "poc_juma_etl_spark.operators.kmeans",
        "poc_juma_etl_spark.operators.sampling",
        "poc_juma_etl_spark.operators.similarity",
        "poc_juma_etl_spark.operators.text",
        "poc_juma_etl_spark.operators.udtf_ngrams",
        "poc_juma_etl_spark.operators.multimodal",
        "poc_juma_etl_spark.streaming.events",
        "poc_juma_etl_spark.sources.rest_api",
    ):
        import importlib
        import importlib.util

        if importlib.util.find_spec(mod) is not None:
            importlib.import_module(mod)
    return dict(_q.QUERIES)
