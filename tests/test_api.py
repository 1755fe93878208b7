"""Public facade: ad-hoc SQL and named-query access."""

import pytest

from poc_juma_etl_spark import api

from .conftest import SF_SMOKE


def test_run_sql_adhoc_join(spark):
    df = api.run_sql(
        spark,
        """
        SELECT o.o_orderstatus, count(*) AS n
        FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        GROUP BY o.o_orderstatus ORDER BY o.o_orderstatus
        """,
        SF_SMOKE,
    )
    rows = df.collect()
    assert rows and sum(r.n for r in rows) > 0


def test_run_query_named(spark):
    df = api.run_query(spark, "q1_pricing_summary", SF_SMOKE)
    assert df.count() > 0


def test_run_query_unknown_raises(spark):
    with pytest.raises(KeyError, match="unknown query"):
        api.run_query(spark, "nope", SF_SMOKE)


def test_list_queries_docs():
    qs = api.list_queries()
    assert len(qs) >= 60
    assert all(doc for doc in qs.values()), "every query must carry a description"
