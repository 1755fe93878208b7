"""Model-based quality filtering (operators/qualityfilter.py): the full
Spark-vs-DuckDB parity its future driver gate will run, genuine-learning
checks against the majority-class baseline, and the empty guard."""

import duckdb

from poc_juma_etl_spark.operators.qualityfilter import (
    q_quality_filter,
    quality_filter_oracle_sql,
    train_quality_weights,
)

from .conftest import SF_ORACLE, SF_SMOKE


def test_quality_filter_matches_duckdb_oracle(spark):
    """The exact check the registry gate will run in round 10: train,
    score, filter, and aggregate — hash-equal to the unrolled-CTE replay."""
    got = [tuple(r) for r in q_quality_filter(spark, SF_ORACLE).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_ORACLE}/documents.parquet'"
    )
    want = [tuple(r) for r in con.execute(quality_filter_oracle_sql()).fetchall()]
    assert got == want
    assert len(got) > 0


def test_quality_filter_actually_learns(spark):
    """Fit check: agreement with the weak rule must beat the majority-class
    baseline (a filter that keeps nothing or everything fails this), and
    the kept set must be non-trivial — some docs admitted, some rejected."""
    rows = q_quality_filter(spark, SF_ORACLE).collect()
    n = sum(r.n_docs for r in rows)
    agree = sum(r.n_agree for r in rows)
    kept = sum(r.n_kept for r in rows)
    con = duckdb.connect()
    majority = con.execute(
        f"""SELECT GREATEST(SUM(pos), SUM(1 - pos)) FROM (
              SELECT CASE WHEN lang = 'en' AND n_chars >= 256
                          THEN 1 ELSE 0 END AS pos
              FROM '{SF_ORACLE}/documents.parquet')"""
    ).fetchone()[0]
    assert agree > majority, (agree, majority)
    assert 0 < kept < n
    # the learned rule is english-gated: no non-english doc is admitted
    assert all(r.n_kept == 0 for r in rows if r.lang != "en")


def test_training_is_deterministic(spark):
    assert train_quality_weights(spark, SF_ORACLE) == train_quality_weights(
        spark, SF_ORACLE
    )


def test_quality_filter_empty_input(spark, tmp_path):
    empty = str(tmp_path / "sf_empty")
    spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(0).write.parquet(
        f"{empty}/documents.parquet"
    )
    assert q_quality_filter(spark, empty).count() == 0


def test_pr_curve_matches_duckdb_oracle(spark):
    from poc_juma_etl_spark.operators.qualityfilter import (
        q_quality_filter_pr_curve,
        quality_filter_pr_oracle_sql,
    )

    got = [tuple(r) for r in q_quality_filter_pr_curve(spark, SF_ORACLE).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_ORACLE}/documents.parquet'"
    )
    want = [tuple(r) for r in con.execute(quality_filter_pr_oracle_sql()).fetchall()]
    assert got == want
    # calibration-shape invariants: cumulative counts decrease with the
    # threshold bin; the bottom bin's cumulative equals the corpus totals
    assert got, "sweep must produce at least one bin"
    n_adm = [r[3] for r in got]
    assert n_adm == sorted(n_adm, reverse=True)
    assert got[0][3] == sum(r[1] for r in got)
    assert got[0][4] == sum(r[2] for r in got)


def test_pr_curve_empty_input(spark, tmp_path):
    from poc_juma_etl_spark.operators.qualityfilter import q_quality_filter_pr_curve

    empty = str(tmp_path / "sf_empty")
    spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(0).write.parquet(
        f"{empty}/documents.parquet"
    )
    assert q_quality_filter_pr_curve(spark, empty).collect() == []
