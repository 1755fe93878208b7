"""End-to-end corpus curation pipeline: stage counts monotone, output
readable, idempotent, and every kept doc passes the gates it claims."""

from pyspark.sql import functions as F

from poc_juma_etl_spark.pipeline import curate_corpus

from .conftest import SF_ORACLE


def test_curate_corpus_end_to_end(spark, tmp_path):
    out = str(tmp_path / "curated")
    counts = curate_corpus(spark, SF_ORACLE, out, blocklist=("src0",))
    # stages only ever drop rows, and the write loses none
    order = [
        "input",
        "after_blocklist",
        "after_quality",
        "after_exact_dedup",
        "after_neardup",
        "written",
    ]
    vals = [counts[k] for k in order]
    assert vals[0] > 0 and vals[-1] > 0
    assert all(a >= b for a, b in zip(vals[:-2], vals[1:-1]))
    assert counts["written"] == counts["after_neardup"]

    got = spark.read.parquet(out)
    # blocklisted source is gone; packing columns present and consistent
    assert got.filter(F.col("source") == "src0").count() == 0
    assert {"seq_id", "n_tokens", "cum_tokens"} <= set(got.columns)
    bad = got.filter(~F.col("seq_id").startswith(F.col("source"))).count()
    assert bad == 0
    # no duplicate docs survived
    assert got.select("doc_id").distinct().count() == got.count()

    # idempotent: re-running overwrites to the same result
    counts2 = curate_corpus(spark, SF_ORACLE, out, blocklist=("src0",))
    assert counts2["written"] == counts["written"]
