"""t2 replica: every registered query with an oracle must match DuckDB
exactly (row count, column names, order-insensitive values) at the test SF.
This mirrors the driver's correctness gate so parity drift fails locally
first."""

import pytest

from poc_juma_etl_spark import all_queries
from poc_juma_etl_spark.oracle import compare

from .conftest import SF_ORACLE

SPECS = all_queries()


@pytest.mark.parametrize("name", sorted(SPECS), ids=str)
def test_query_matches_oracle(spark, duck, name):
    spec = SPECS[name]
    df = spec.fn(spark, SF_ORACLE)
    if spec.oracle is None:
        assert df.count() >= 0  # rows-only check, mirroring the driver
        return
    oracle_pdf = duck.execute(spec.oracle).fetchdf()
    report = compare(df, oracle_pdf)
    assert report["match"], report
