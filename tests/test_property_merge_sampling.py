"""Property checks: duplicate-key resolution in merge upserts matches a
Python model on arbitrary batches; hash sampling is partitioning-invariant."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from poc_juma_etl_spark.operators.merge import dedupe_updates
from poc_juma_etl_spark.operators.sampling import sample_bucket

from .conftest import SF_ORACLE

row_st = st.tuples(
    st.integers(min_value=0, max_value=9),
    st.text(alphabet="ab", min_size=0, max_size=3),
    st.integers(min_value=0, max_value=5),
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=st.lists(row_st, min_size=1, max_size=30))
def test_dedupe_updates_matches_model(spark, rows):
    df = spark.createDataFrame(
        [(k, n, float(v)) for k, n, v in rows], "k long, name string, bal double"
    )
    got = {(r.k, r.name, r.bal) for r in dedupe_updates(df, "k").collect()}
    # model: per key, the lexicographically greatest (name, bal) wins —
    # the desc-over-all-non-key-columns rule
    want: dict[int, tuple[str, float]] = {}
    for k, n, v in rows:
        cand = (n, float(v))
        if k not in want or cand > want[k]:
            want[k] = cand
    assert got == {(k, n, v) for k, (n, v) in want.items()}


def test_sample_bucket_partitioning_invariant(spark):
    """The sampling contract that matters on a cluster: bucket assignment
    is a pure function of the key — identical under any repartitioning."""
    d = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").select("doc_id")
    b1 = {r.doc_id: r.b for r in d.withColumn("b", sample_bucket(F.col("doc_id"))).collect()}
    b2 = {
        r.doc_id: r.b
        for r in d.repartition(7)
        .withColumn("b", sample_bucket(F.col("doc_id")))
        .collect()
    }
    assert b1 == b2


def test_sample_mixture_budget_bound(spark):
    """Mixture semantics: per source, kept tokens stay within the source's
    budget plus at most one boundary-crossing doc, sources with a nonzero
    budget contribute at least one doc, and membership is a pure function
    of the data (re-run identical)."""
    from poc_juma_etl_spark import all_queries
    from poc_juma_etl_spark.operators.sampling import (
        MIX_DEN,
        MIX_NUM,
        MIX_W_BUCKETS,
    )
    from poc_juma_etl_spark.operators.text import md5_long, tokens

    fn = all_queries()["q_sample_mixture"].fn
    kept = fn(spark, SF_ORACLE).collect()
    assert kept == fn(spark, SF_ORACLE).collect()  # deterministic re-run

    d = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    t = d.select(
        "source",
        F.size(tokens("text")).cast("bigint").alias("n_tokens"),
        (md5_long(F.col("source")) % MIX_W_BUCKETS + 1).alias("w"),
    ).collect()
    total = sum(r.n_tokens for r in t)
    weights = {r.source: r.w for r in t}
    sum_w = sum(set_w for set_w in {r.source: r.w for r in t}.values())
    budgets = {
        s: ((total * MIX_NUM) // MIX_DEN) * w // sum_w for s, w in weights.items()
    }
    per_source_tokens: dict[str, int] = {}
    max_doc = max(r.n_tokens for r in t)
    for r in kept:
        per_source_tokens[r.source] = per_source_tokens.get(r.source, 0) + r.n_tokens
    for s, b in budgets.items():
        got = per_source_tokens.get(s, 0)
        assert got <= b + max_doc, (s, got, b)
        if b > 0:
            assert got > 0, (s, b)  # nonzero budget -> source represented
