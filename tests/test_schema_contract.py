"""Full-surface schema contract: for EVERY oracled query, the Spark plan's
output column names must equal the DuckDB oracle's — checked via schema
derivation only (Spark analysis + DuckDB DESCRIBE), no execution, so the
whole 150-query surface verifies in seconds.

The driver's hash compare sorts columns by name before hashing values: a
column-name drift between the two sides is an automatic driver FAIL even
when every value matches. This test catches that class instantly; the
oracle gate (which executes) stays the value-level check.

Queries with side effects (e2e writers, stream drains) build real pipelines
at plan time, so only pure q_* queries are schema-derived on the Spark side;
their oracles are still DESCRIBE-checked against the catalog views.
"""

import duckdb
import pytest

from poc_juma_etl_spark import all_queries
from poc_juma_etl_spark.oracle import duckdb_connect

from .conftest import SF_ORACLE

SPECS = all_queries()

# plan-time-pure queries: building the DataFrame runs no job
PURE = sorted(
    n
    for n, s in SPECS.items()
    if s.oracle is not None
    and n.startswith("q")
    and "e2e" not in n
    and not n.startswith("q_stream_")
)


@pytest.fixture(scope="module")
def con():
    c = duckdb_connect(SF_ORACLE)
    yield c
    c.close()


def oracle_cols(con: "duckdb.DuckDBPyConnection", sql: str) -> list[str]:
    return sorted(r[0].lower() for r in con.execute(f"DESCRIBE {sql}").fetchall())


@pytest.mark.parametrize("name", PURE, ids=str)
def test_columns_match_oracle(spark, con, name):
    spec = SPECS[name]
    spark_cols = sorted(c.lower() for c in spec.fn(spark, SF_ORACLE).columns)
    assert spark_cols == oracle_cols(con, spec.oracle), name
    # duplicate names on either side would silently corrupt the driver's
    # sorted-column hash even if the sets "match"
    assert len(spark_cols) == len(set(spark_cols)), name
