"""Skew handling: a hot key must not change results (salted agg == direct
agg) and AQE must split the skewed join partition rather than fail or
mis-answer."""

from pyspark.sql import functions as F


def _skewed(spark, n_hot=200_000, n_cold=5_000):
    hot = spark.range(n_hot).select(
        F.lit("HOT").alias("k"), (F.col("id") % 97).cast("double").alias("v")
    )
    cold = spark.range(n_cold).select(
        F.concat(F.lit("c"), (F.col("id") % 50).cast("string")).alias("k"),
        (F.col("id") % 13).cast("double").alias("v"),
    )
    return hot.unionByName(cold)


def test_salted_agg_equals_direct_on_skew(spark):
    df = _skewed(spark)
    direct = {
        r.k: (r.n, r.s)
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.col("v").cast("decimal(25,6)")).alias("s"))
        .collect()
    }
    salted = {
        r.k: (r.n, r.s)
        for r in df.withColumn("salt", F.crc32(F.col("v").cast("string")) % 16)
        .groupBy("k", "salt")
        .agg(F.count(F.lit(1)).alias("pn"), F.sum(F.col("v").cast("decimal(25,6)")).alias("ps"))
        .groupBy("k")
        .agg(F.sum("pn").alias("n"), F.sum("ps").alias("s"))
        .collect()
    }
    assert salted == direct
    assert direct["HOT"][0] == 200_000


def test_aqe_skew_join_correct(spark):
    """Join a skewed fact against a small dim with AQE skew splitting on;
    row counts must be exact."""
    df = _skewed(spark)
    dim = spark.createDataFrame(
        [("HOT", "hot-dim")] + [(f"c{i}", f"dim{i}") for i in range(50)], ["k", "label"]
    )
    joined = df.join(dim, "k")
    assert joined.count() == df.count()
    agg = joined.groupBy("label").count().collect()
    assert {r.label: r["count"] for r in agg}["hot-dim"] == 200_000
