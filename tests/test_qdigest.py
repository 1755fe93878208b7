"""Deterministic q-digest quantile sketch (operators/qdigest.py): full
Spark-vs-DuckDB parity its future (round-12) gate will run, a pure-Python
build reference, the rank-error bound, mergeability, and the empty guard."""

import duckdb
import pytest

from poc_juma_etl_spark.operators.qdigest import (
    B,
    K,
    PCTS,
    q_sketch_quantile_digest,
    qdigest_build,
    qdigest_oracle_sql,
    qdigest_quantiles,
)

from .conftest import SF_ORACLE, SF_SMOKE


def test_qdigest_matches_duckdb_oracle(spark):
    got = [tuple(r) for r in q_sketch_quantile_digest(spark, SF_ORACLE).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{SF_ORACLE}/orders.parquet'"
    )
    want = [tuple(r) for r in con.execute(qdigest_oracle_sql()).fetchall()]
    assert got == want
    assert len(got) == len(PCTS)


def test_qdigest_spark_matches_python_reference(spark):
    """The Spark build's digest-derived estimates equal the pure-Python
    build on the identical leaf histogram."""
    con = duckdb.connect()
    leaves = con.execute(
        "SELECT CAST(FLOOR(o_totalprice) AS BIGINT) AS v, COUNT(*) AS c "
        f"FROM '{SF_ORACLE}/orders.parquet' GROUP BY v"
    ).fetchall()
    n = sum(c for _, c in leaves)
    want = {
        p: est for p, est in qdigest_quantiles(qdigest_build(leaves, n), n)
    }
    rows = q_sketch_quantile_digest(spark, SF_ORACLE).collect()
    assert {r.pct: r.est_value for r in rows} == want
    assert all(r.n_rows == n for r in rows)


def test_qdigest_rank_error_bound():
    """|est_rank - true_rank| <= B * sigma on an adversarial skewed
    histogram (heavy head + long tail), the classic q-digest guarantee."""
    leaves = [(0, 5000), (1, 3000)] + [(v, 1 + v % 3) for v in range(2, 4000)]
    n = sum(c for _, c in leaves)
    digest = qdigest_build(leaves, n)
    sigma = n // K
    assert len(digest) <= 3 * K * B  # size bound (loose)
    # exact cumulative counts
    import bisect

    vals = sorted(leaves)
    cum, total = [], 0
    for v, c in vals:
        total += c
        cum.append((v, total))
    for p, est in qdigest_quantiles(digest, n):
        r = (p * n + 99) // 100
        # true rank of the estimate = count of values <= est
        idx = bisect.bisect_right([v for v, _ in cum], est) - 1
        true_rank = cum[idx][1] if idx >= 0 else 0
        assert true_rank >= r - B * sigma - 1, (p, est, true_rank, r)
        # the estimate never lands below the target rank by construction
        assert true_rank + B * sigma >= r


def test_qdigest_merge_property():
    """Two partition digests merged (concat leaf-level node lists, rebuild)
    estimate within the error bound of the direct global digest — the
    1000-executor sketch-per-partition shape."""
    import random

    rnd = random.Random(7)
    a = [(rnd.randrange(0, 100000), 1) for _ in range(4000)]
    b = [(rnd.randrange(50000, 900000), 1) for _ in range(4000)]

    def hist(pairs):
        h = {}
        for v, c in pairs:
            h[v] = h.get(v, 0) + c
        return sorted(h.items())

    na, nb = len(a), len(b)
    da = qdigest_build(hist(a), na)
    db = qdigest_build(hist(b), nb)
    n = na + nb
    # merge: concatenate node lists (ids collide -> counts add), re-compress
    merged_nodes = {}
    for i, c in da + db:
        merged_nodes[i] = merged_nodes.get(i, 0) + c
    # re-run the passes directly on the node table; unlike the from-leaves
    # build, a PARENT may already carry mass here (one input digest held
    # the parent, the other its children), so the pass must fold the
    # children INTO that mass, not overwrite it — the classic
    # c(parent)+c(children) <= sigma compress rule
    sigma = n // K
    digest = dict(merged_nodes)
    for d in range(B, 0, -1):
        lo, hi = 1 << d, 1 << (d + 1)
        level = [i for i in digest if lo <= i < hi]
        groups = {}
        for i in level:
            groups[i // 2] = groups.get(i // 2, 0) + digest[i]
        for pid, s in groups.items():
            s_total = s + digest.get(pid, 0)
            if s_total <= sigma:
                for child in (2 * pid, 2 * pid + 1):
                    digest.pop(child, None)
                digest[pid] = s_total
    merged = sorted(digest.items())
    assert sum(c for _, c in merged) == n  # merge conserves mass
    exact = sorted(v for v, _ in a + b)
    # error bound: ancestors carry <= sigma_a + sigma_b + sigma each
    # (pre-merge mass from both inputs plus one recompress), B levels
    bound = B * (na // K + nb // K + sigma) + 1
    for p, est in qdigest_quantiles(merged, n):
        r = (p * n + 99) // 100
        true_rank = sum(1 for v in exact if v <= est)
        assert abs(true_rank - r) <= bound, (p, est, true_rank, r, bound)


def test_qdigest_empty_input(spark, tmp_path):
    empty = str(tmp_path / "sf_empty")
    spark.read.parquet(f"{SF_SMOKE}/orders.parquet").limit(0).write.parquet(
        f"{empty}/orders.parquet"
    )
    assert q_sketch_quantile_digest(spark, empty).collect() == []
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{SF_SMOKE}/orders.parquet' "
        "WHERE 1 = 0"
    )
    assert con.execute(qdigest_oracle_sql()).fetchall() == []


def test_qdigest_out_of_domain_fails_typed(spark):
    """Values outside [0, 2^B) violate the tree invariant (leaf ids
    escape every level pass / collide with internal nodes); they must
    fail loudly at ingestion, not as an opaque downstream shift error
    (round-10 ADVICE)."""
    from poc_juma_etl_spark.operators.qdigest import digest_result

    too_big = spark.createDataFrame([(1 << B, 3)], "v long, cnt long")
    with pytest.raises(ValueError, match="domain violation"):
        digest_result(spark, too_big)
    negative = spark.createDataFrame([(-1, 3), (7, 2)], "v long, cnt long")
    with pytest.raises(ValueError, match="domain violation"):
        digest_result(spark, negative)
    # boundary values are fine: 0 and 2^B - 1 both build
    edge = spark.createDataFrame(
        [(0, 5), ((1 << B) - 1, 5)], "v long, cnt long"
    )
    assert len(digest_result(spark, edge).collect()) == len(PCTS)


def test_qdigest_null_values_fail_typed(spark):
    """NULL values count into n but would silently fall out of every level
    pass (NULL fails both the level filter and its complement), so the
    quantile ranks would misattribute their mass — they must fail loudly."""
    from poc_juma_etl_spark.operators.qdigest import digest_result

    with_null = spark.createDataFrame([(None, 4), (7, 2)], "v long, cnt long")
    with pytest.raises(ValueError, match="NULL"):
        digest_result(spark, with_null)
