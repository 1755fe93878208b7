"""Round-10 extension operators (plans/extra10.py): ORC round-trip parity
against the parquet-side DuckDB oracle, the columnar-scan properties
(filter pushdown + column pruning) the text-format round-trips cannot
offer, and the empty guard."""

import tempfile
import shutil

import duckdb

from poc_juma_etl_spark.plans.extra10 import (
    ORC_ROUNDTRIP_ORACLE,
    etl_orc_roundtrip_e2e,
    orc_read_back,
)

from .conftest import SF_ORACLE, SF_SMOKE


def test_orc_roundtrip_matches_duckdb_oracle(spark):
    got = [tuple(r) for r in etl_orc_roundtrip_e2e(spark, SF_ORACLE).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{SF_ORACLE}/lineitem.parquet'"
    )
    want = [tuple(r) for r in con.execute(ORC_ROUNDTRIP_ORACLE).fetchall()]
    assert got == want
    assert len(got) >= 3


def test_orc_scan_pushes_filter_and_prunes_columns(spark):
    """The point of a columnar interchange format: the shipdate filter must
    reach the ORC stripe scan (PushedFilters) and the scan must read only
    the five projected columns (ReadSchema), not all 16."""
    tmp = tempfile.mkdtemp(prefix="orc_plan_")
    try:
        back = orc_read_back(spark, SF_SMOKE, tmp)
        plan = back._jdf.queryExecution().executedPlan().toString()
        assert "PushedFilters: [" in plan
        # scope the check to the bracketed filter LIST itself — an empty
        # 'PushedFilters: []' followed by l_shipdate in the ReadSchema text
        # would otherwise satisfy a windowed substring check
        pushed = plan.split("PushedFilters: [")[1].split("]")[0]
        assert "l_shipdate" in pushed, f"filter not pushed: [{pushed}]"
        read_schema = plan.split("ReadSchema:")[1][:400]
        assert "l_extendedprice" in read_schema
        assert "l_comment" not in read_schema
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_orc_roundtrip_empty_input(spark, tmp_path):
    empty = str(tmp_path / "sf_empty")
    spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet").limit(0).write.parquet(
        f"{empty}/lineitem.parquet"
    )
    assert etl_orc_roundtrip_e2e(spark, empty).collect() == []
