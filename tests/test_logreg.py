"""Fixed-point logistic-regression GD (operators/logreg.py): the full
Spark-vs-DuckDB parity its future driver gate will run, plus a pure-Python
reference pinning the integer arithmetic and a fitting-behavior check."""

import duckdb
import pytest

from poc_juma_etl_spark.operators.logreg import (
    FEATURES,
    LABEL,
    LR_DEN,
    WS,
    logreg_gd,
    logreg_oracle_sql,
)

from .conftest import SF_ORACLE


def _python_reference(rows, steps):
    """The same K steps in plain Python integers — the ground truth the
    distributed aggregation must match EXACTLY (not approximately)."""
    n = len(rows)
    weights = [0] * len(FEATURES)
    out = []
    for step in range(1, steps + 1):
        grads = [0] * len(FEATURES)
        sq = 0
        correct = 0
        for *xs, y in rows:
            z = sum(w * x for w, x in zip(weights, xs))
            t = (abs(z) * WS) // (WS + abs(z))
            p = (WS + (t if z >= 0 else -t)) // 2
            e = p - y * WS
            for j, x in enumerate(xs):
                grads[j] += e * x
            sq += e * e
            correct += int((p >= WS // 2) == (y == 1))
        if n:
            weights = [
                w - (abs(g) // (LR_DEN * n)) * (1 if g >= 0 else -1)
                for w, g in zip(weights, grads)
            ]
        out.append((step, sq, correct, *weights))
    return out


def test_logreg_matches_python_reference_exactly(spark):
    got = [tuple(r) for r in logreg_gd(spark, SF_ORACLE, steps=4).collect()]
    con = duckdb.connect()
    feat_sql = ", ".join(f"{expr} AS {name}" for name, expr in FEATURES)
    rows = con.execute(
        f"SELECT {feat_sql}, {LABEL} AS y "
        f"FROM '{SF_ORACLE}/orders.parquet' ORDER BY o_orderkey"
    ).fetchall()
    want = _python_reference(rows, 4)
    assert got == want


def test_logreg_matches_duckdb_oracle(spark):
    """The exact check the registry gate will run in round 10: the Spark
    trace equals the unrolled-CTE DuckDB replay value for value."""
    got = [tuple(r) for r in logreg_gd(spark, SF_ORACLE, steps=3).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{SF_ORACLE}/orders.parquet'"
    )
    want = [tuple(r) for r in con.execute(logreg_oracle_sql(steps=3)).fetchall()]
    assert got == want


def test_logreg_loss_decreases(spark):
    """Fitting behavior: from w = 0 the bias term alone must reduce the
    squared error monotonically over the first steps (base-rate fit), and
    accuracy must end at or above the majority-class rate."""
    rows = logreg_gd(spark, SF_ORACLE, steps=5).collect()
    sq = [r.sq_err for r in rows]
    assert all(a > b for a, b in zip(sq, sq[1:])), sq
    last = rows[-1]
    total = spark.read.parquet(f"{SF_ORACLE}/orders.parquet").count()
    assert last.n_correct >= total * 0.55  # majority class is ~60% (y=0)


def test_logreg_empty_orders(spark, tmp_path):
    """S6 empty-guard: zero-row input trains nothing but never raises —
    the trace is all-zero metrics with unchanged weights."""
    import pyspark.sql.functions as F

    p = str(tmp_path)
    spark.read.parquet(f"{SF_ORACLE}/orders.parquet").limit(0).write.parquet(
        f"{p}/orders.parquet"
    )
    rows = logreg_gd(spark, p, steps=2).collect()
    assert [tuple(r) for r in rows] == [
        (1, 0, 0, 0, 0, 0, 0),
        (2, 0, 0, 0, 0, 0, 0),
    ]


def test_logreg_empty_input_matches_oracle(spark, tmp_path):
    """Empty orders: the Spark trace (all zeros, weights never updated)
    must hash-match the DuckDB replay too — the oracle's NULL sums and
    //0 previously diverged (round-9 review); a registered gate would run
    exactly this comparison on a filtered-empty input."""
    empty = str(tmp_path / "sf_empty")
    spark.read.parquet(f"{SF_ORACLE}/orders.parquet").limit(0).write.parquet(
        f"{empty}/orders.parquet"
    )
    got = [tuple(r) for r in logreg_gd(spark, empty, steps=2).collect()]
    con = duckdb.connect()
    # an empty Spark write leaves no part files for DuckDB's glob; the
    # equivalent zero-row relation is a filtered-empty view
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{SF_ORACLE}/orders.parquet' "
        "WHERE 1 = 0"
    )
    want = [tuple(r) for r in con.execute(logreg_oracle_sql(steps=2)).fetchall()]
    assert got == want
    assert got[0][1:] == (0, 0, 0, 0, 0, 0)
