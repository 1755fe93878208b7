"""Fixed-point PCA power iteration (operators/pca.py): the full
Spark-vs-DuckDB parity its future driver gate will run, a pure-Python
reference pinning the integer arithmetic, directional correctness vs a
float eigensolver, and the empty guard."""

import duckdb
import numpy as np
import pytest

from poc_juma_etl_spark.operators.pca import (
    DIM,
    QS,
    RDIV,
    SDIV,
    VS,
    _step_update,
    _tdiv,
    pca_oracle_sql,
    pca_power_iteration,
)

from .conftest import SF_ORACLE, SF_SMOKE


def _load_quantized(sf_dir):
    con = duckdb.connect()
    vecs = con.execute(
        f"SELECT embedding FROM '{sf_dir}/embeddings.parquet' ORDER BY vec_id"
    ).fetchall()
    return [
        [_round_half_away(float(x) * QS) for x in emb] for (emb,) in vecs
    ]


def _round_half_away(x: float) -> int:
    import math

    return int(math.floor(x + 0.5)) if x >= 0 else -int(math.floor(-x + 0.5))


def _python_reference(q_rows, steps):
    v = [VS] * DIM
    out = []
    for step in range(1, steps + 1):
        g = [0] * DIM
        ray = 0
        for q in q_rows:
            s = sum(qi * vi for qi, vi in zip(q, v))
            sp, sr = _tdiv(s, SDIV), _tdiv(s, RDIV)
            for j in range(DIM):
                g[j] += q[j] * sp
            ray += sr * sr
        mx = max((abs(x) for x in g), default=0)
        v = _step_update(g)
        out.append((step, ray, mx, *v))
    return out


def test_pca_matches_python_reference_exactly(spark):
    got = [tuple(r) for r in pca_power_iteration(spark, SF_ORACLE, steps=3).collect()]
    want = _python_reference(_load_quantized(SF_ORACLE), 3)
    assert got == want


def test_pca_matches_duckdb_oracle(spark):
    """The exact check the registry gate will run in round 10: the Spark
    trace equals the unrolled-CTE DuckDB replay value for value."""
    got = [tuple(r) for r in pca_power_iteration(spark, SF_ORACLE, steps=3).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_ORACLE}/embeddings.parquet'"
    )
    want = [tuple(r) for r in con.execute(pca_oracle_sql(steps=3)).fetchall()]
    assert got == want


def test_pca_converges_to_top_eigenvector(spark, tmp_path):
    """Directional correctness on a PLANTED-spike fixture: the real
    embeddings table is near-isotropic (lambda2/lambda1 = 0.98 at sf0.01 —
    vanilla power iteration needs hundreds of steps there; the driver gate
    hashes the exact step TRACE, which is well-defined regardless), so the
    alignment property is pinned where it is decidable: embeddings with a
    dominant component must align (|cosine| > 0.99) with numpy's top
    eigenvector of the same quantized Gram matrix within 4 steps."""
    rng = np.random.default_rng(7)
    spike = rng.normal(size=DIM)
    spike /= np.linalg.norm(spike)
    data = 0.8 * np.outer(rng.normal(size=400), spike) + 0.1 * rng.normal(
        size=(400, DIM)
    )
    fix = str(tmp_path / "sf_spike")
    spark.createDataFrame(
        [(i, [float(x) for x in row], 0) for i, row in enumerate(data)],
        "vec_id long, embedding array<float>, label int",
    ).write.parquet(f"{fix}/embeddings.parquet")
    rows = pca_power_iteration(spark, fix, steps=4).collect()
    q = np.array(
        [[_round_half_away(float(np.float32(x)) * QS) for x in row] for row in data],
        dtype=np.float64,
    )
    gram = q.T @ q
    top = np.linalg.eigh(gram)[1][:, -1]
    v3 = np.array([rows[2][3 + j] for j in range(DIM)], dtype=np.float64)
    v4 = np.array([rows[3][3 + j] for j in range(DIM)], dtype=np.float64)
    cos_top = abs(v4 @ top) / (np.linalg.norm(v4) * np.linalg.norm(top))
    cos_step = abs(v4 @ v3) / (np.linalg.norm(v4) * np.linalg.norm(v3))
    assert cos_top > 0.99, cos_top
    assert cos_step > 0.999, cos_step


def test_pca_energy_grows_on_real_table(spark):
    """On the real (near-isotropic) table the NORMALIZED Rayleigh quotient
    ray / ||v_entering||^2 must be positive and non-decreasing (the classic
    power-iteration monotonicity; the raw ray is scale-dependent because
    normalization is max-norm, so it is divided out here — tolerance 0.1%
    for the fixed-point rounding)."""
    rows = pca_power_iteration(spark, SF_ORACLE, steps=4).collect()
    entering = [[VS] * DIM] + [
        [r[3 + j] for j in range(DIM)] for r in rows[:-1]
    ]
    quotients = [
        r.ray / sum(x * x for x in v) for r, v in zip(rows, entering)
    ]
    assert quotients[0] > 0
    assert all(b >= a * 0.999 for a, b in zip(quotients, quotients[1:])), quotients


def test_pca_empty_input_matches_oracle(spark, tmp_path):
    """Empty embeddings: the Spark trace (zero ray/mx/components) must
    hash-match the DuckDB replay too — the oracle's SUM-over-nothing NULLs
    previously propagated through GREATEST and the sign-split division
    (round-9 advice, the logreg nn.n = 0 bug class); the registered gate
    runs exactly this comparison on a filtered-empty input."""
    empty = str(tmp_path / "sf_empty")
    spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet").limit(0).write.parquet(
        f"{empty}/embeddings.parquet"
    )
    rows = pca_power_iteration(spark, empty, steps=2).collect()
    assert len(rows) == 2
    assert all(r.ray == 0 and r.mx == 0 for r in rows)
    con = duckdb.connect()
    # an empty Spark write leaves no part files for DuckDB's glob; the
    # equivalent zero-row relation is a filtered-empty view
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_SMOKE}/embeddings.parquet' "
        "WHERE 1 = 0"
    )
    want = [tuple(r) for r in con.execute(pca_oracle_sql(steps=2)).fetchall()]
    assert [tuple(r) for r in rows] == want
