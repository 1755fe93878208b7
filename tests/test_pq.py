"""Product quantization: determinism, code shape, quantization quality, and
recall vs the brute-force ranking (the rows-only operator's substitute for a
SQL oracle)."""

from pyspark.sql import functions as F

from poc_juma_etl_spark import all_queries
from poc_juma_etl_spark.catalog import load_table
from poc_juma_etl_spark.operators.pq import (
    K,
    M,
    TOP_K,
    pq_encode,
    pq_fit,
)

from .conftest import SF_ORACLE

SPECS = all_queries()


def test_pq_fit_deterministic(spark):
    e = load_table(spark, SF_ORACLE, "embeddings")
    c1 = pq_fit(e, iters=2)
    c2 = pq_fit(e, iters=2)
    assert c1 == c2


def test_pq_codes_shape_and_range(spark):
    e = load_table(spark, SF_ORACLE, "embeddings")
    cents = pq_fit(e, iters=1)
    assert len(cents) == M and all(len(per_m) == K for per_m in cents)
    coded = pq_encode(e, cents)
    stats = coded.select(
        F.min(F.size("codes")).alias("lo_len"),
        F.max(F.size("codes")).alias("hi_len"),
        F.min(F.array_min("codes")).alias("lo"),
        F.max(F.array_max("codes")).alias("hi"),
    ).collect()[0]
    assert stats.lo_len == M and stats.hi_len == M
    assert stats.lo >= 0 and stats.hi < K


def test_pq_encode_matches_python_model(spark):
    """Catalyst argmin-encoding must match a plain-Python nearest-subcentroid
    model, including the ties-to-lower-code rule."""
    e = load_table(spark, SF_ORACLE, "embeddings")
    cents = pq_fit(e, iters=1)
    got = {r.vec_id: list(r.codes) for r in pq_encode(e, cents).limit(50).collect()}
    d = 64 // M
    for r in e.limit(50).collect():
        v = [float(x) for x in r.embedding]
        want = []
        for mi in range(M):
            sv = v[mi * d : (mi + 1) * d]
            dists = [
                (sum((x - c) ** 2 for x, c in zip(sv, cvec)), ki)
                for ki, cvec in enumerate(cents[mi])
            ]
            want.append(min(dists)[1])
        assert got[r.vec_id] == want, r.vec_id


def test_pq_recall_vs_bruteforce(spark):
    """ADC + exact re-rank must recover most of the true top-5: recall@5
    over the 10 bench queries ≥ 0.5 (4-bit×4-subspace codes on 64 dims is a
    32x compression; with a 4*k re-rank window the floor is comfortably
    above half on the fixture corpus)."""
    truth = {}
    for r in SPECS["q_ann_bruteforce_topk"].fn(spark, SF_ORACLE).collect():
        truth.setdefault(r.query_id, set()).add(r.neighbor_id)
    got = {}
    for r in SPECS["q_ann_pq_topk"].fn(spark, SF_ORACLE).collect():
        got.setdefault(r.query_id, set()).add(r.neighbor_id)
    assert set(got) == set(truth)
    hits = sum(len(got[q] & truth[q]) for q in truth)
    total = sum(len(truth[q]) for q in truth)
    assert total == len(truth) * TOP_K
    assert hits / total >= 0.5, f"recall {hits}/{total}"
