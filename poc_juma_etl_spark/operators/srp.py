"""Signed-random-projection (SRP) LSH bucketing shared by the ANN queries
(operators/similarity.py) and the embedding near-dup operator
(operators/dedup.py).

Hyperplanes are derived from a deterministic LCG — component d of hyperplane
j is lcg(j * DIM + d) mapped to [-M/2, M/2) — so the bucketing is a pure
formula: no trained model to ship between engines, and the DuckDB oracle can
run the *identical* bucketing (integer arithmetic is engine-portable).
"""

from __future__ import annotations

SRP_PLANES = 8
DIM = 64
LCG_A = 1103515245
LCG_C = 12345
LCG_M = 2147483648  # 2^31


def _sql_srp_bit(vec: str, j: int) -> str:
    """1-bit sign of <vec, plane_j>, as portable SQL (shared dialect)."""
    terms = (
        f"list_sum(list_transform(range(1, {DIM + 1}), d -> "
        f"CAST(round(CAST({vec}[d] AS DOUBLE) * 4194304) AS BIGINT) * "
        f"(((CAST({LCG_A} AS BIGINT) * ({j} * {DIM} + (d - 1)) + {LCG_C}) % {LCG_M}) - {LCG_M // 2})"
        f"))"
    )
    return f"(CASE WHEN {terms} >= 0 THEN 1 ELSE 0 END)"


def _spark_srp_bit(vec: str, j: int) -> str:
    terms = (
        f"aggregate(transform(sequence(1, {DIM}), d -> "
        f"CAST(round(CAST(element_at({vec}, d) AS DOUBLE) * 4194304) AS BIGINT) * "
        f"(((CAST({LCG_A} AS BIGINT) * ({j} * {DIM} + (d - 1)) + {LCG_C}) % {LCG_M}) - {LCG_M // 2})"
        f"), CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )
    return f"(CASE WHEN {terms} >= 0 THEN 1 ELSE 0 END)"


def sql_srp_bucket(vec: str) -> str:
    return " + ".join(f"{_sql_srp_bit(vec, j)} * {1 << j}" for j in range(SRP_PLANES))


def spark_srp_bucket(vec: str) -> str:
    return " + ".join(f"{_spark_srp_bit(vec, j)} * {1 << j}" for j in range(SRP_PLANES))
