"""KMV/theta distinct sketches with set operations (operators/kmv.py):
the full Spark-vs-DuckDB parity its future driver gate will run, accuracy
bounds on every estimate, and the saturation/empty regimes."""

import duckdb
import pytest

from poc_juma_etl_spark.operators.kmv import (
    K,
    KMV_ORACLE,
    MAXH,
    _estimate,
    q_sketch_kmv_setops,
)

from .conftest import SF_ORACLE, SF_SMOKE


def _run(spark, sf_dir):
    return {r.measure: r.value for r in q_sketch_kmv_setops(spark, sf_dir).collect()}


def test_kmv_matches_duckdb_oracle(spark):
    """The exact check the registry gate will run in round 10: every
    estimate is deterministic (md5-derived), so the gate is a full value
    hash, not an error-bound verdict."""
    got = [tuple(r) for r in q_sketch_kmv_setops(spark, SF_ORACLE).collect()]
    con = duckdb.connect()
    con.execute(f"CREATE VIEW orders AS SELECT * FROM '{SF_ORACLE}/orders.parquet'")
    want = [tuple(r) for r in con.execute(KMV_ORACLE).fetchall()]
    assert got == want


def test_kmv_estimates_within_bounds(spark):
    """KMV relative standard error is ~1/sqrt(k-2) (~6.3% at k=256); every
    estimate must sit within 5 RSE of its exact ground truth (and the
    intersection within 5 RSE of the UNION size — the theta intersection's
    error scales with the union, not the intersection)."""
    m = _run(spark, SF_ORACLE)
    rse = 1.0 / (K - 2) ** 0.5
    for which in ("a", "b", "union"):
        exact, est = m[f"exact_{which}"], m[f"est_{which}"]
        if exact >= K:  # estimation regime
            assert abs(est - exact) <= 5 * rse * exact, (which, exact, est)
        else:  # sketch IS the set
            assert est == exact
    assert abs(m["est_intersect"] - m["exact_intersect"]) <= max(
        5 * rse * m["exact_union"], 1
    )
    # difference error also scales with the union (same theta_u estimator)
    assert abs(m["est_a_minus_b"] - m["exact_a_minus_b"]) <= max(
        5 * rse * m["exact_union"], 1
    )


def test_kmv_saturation_regime(spark):
    """At sf0.01 both segments exceed k=256 distinct customers, so the gate
    exercises the real estimation path (theta < 2^44), not the exact-set
    shortcut."""
    m = _run(spark, SF_ORACLE)
    assert m["exact_a"] > K and m["exact_b"] > K
    assert 0 < m["theta_union"] < MAXH


def test_kmv_below_saturation_is_exact(spark):
    """sf0.001 has ~150 customers (< k), so every sketch holds its whole
    set and all four estimates must equal the exact counts."""
    m = _run(spark, SF_SMOKE)
    for which in ("a", "b", "union", "intersect", "a_minus_b"):
        assert m[f"est_{which}"] == m[f"exact_{which}"], which
    assert m["theta_union"] == MAXH


def test_estimate_helper_regimes():
    assert _estimate([]) == 0
    assert _estimate([5, 9]) == 2  # below saturation: exact size
    full = list(range(1, K + 1))  # theta = K -> est = (K-1)*2^44 // K
    assert _estimate(full) == (K - 1) * MAXH // K


def test_kmv_empty_input(spark, tmp_path):
    empty = str(tmp_path / "sf_empty")
    spark.read.parquet(f"{SF_SMOKE}/orders.parquet").limit(0).write.parquet(
        f"{empty}/orders.parquet"
    )
    m = _run(spark, empty)
    assert m["est_a"] == m["exact_a"] == 0
    assert m["est_intersect"] == m["exact_intersect"] == 0
