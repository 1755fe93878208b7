"""End-to-end corpus curation driver: the LLM-data twin of etl.run_table.

Composes the operator families this engine adds on top of the reference's
ETL surface into one callable pipeline over the ``documents`` table:

    blocklist filter → quality gate (Gopher rules) → exact dedup →
    near-dup keep-best (components) → sequence packing → parquet out

Each stage is the same oracle-gated logic the registry exposes as
individual queries (single source of truth — this module only composes).
The output is a curated, packed corpus a training job would read directly.

Scale posture: every stage is a Catalyst plan over doc-scale keys; the
stage boundary is a single DataFrame handoff, so Catalyst fuses adjacent
narrow stages and the whole pipeline runs as one job per action. Writing
is an atomic overwrite (same writer as the warehouse loads).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from .catalog import load_table
from .operators.components import connected_components, jaccard_edges
from .operators.text import LANG_MARKERS, md5_long, tokens


def curate_corpus(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    blocklist: tuple[str, ...] = (),
    seq_tokens: int = 2048,
) -> dict[str, int]:
    """Run the full curation pipeline; returns per-stage surviving counts
    (the numbers a pipeline report would show)."""
    d = load_table(spark, sf_dir, "documents")
    counts: dict[str, int] = {"input": d.count()}

    # 1. blocklist (source-level here; domain-level in operators/web.py)
    if blocklist:
        block = spark.createDataFrame([(b,) for b in blocklist], "source string")
        d = d.join(F.broadcast(block), "source", "left_anti")
    counts["after_blocklist"] = d.count()

    # 2. quality gate — the Gopher-rule keep flag (q_text_gopher_quality)
    ts = tokens("text")
    n_tokens = F.size(ts)
    n_chars = F.aggregate(F.transform(ts, lambda t: F.length(t)), F.lit(0), lambda a, v: a + v)
    mean_word_len = n_chars.cast("double") / n_tokens
    frac_alpha = F.size(F.filter(ts, lambda x: x.rlike("^[a-z]+$"))).cast("double") / n_tokens
    stop = F.array([F.lit(w) for w in LANG_MARKERS["en"]])
    n_stop = F.size(F.filter(ts, lambda x: F.array_contains(stop, x)))
    ttr = F.size(F.array_distinct(ts)).cast("double") / n_tokens
    d = d.filter(
        n_tokens.between(15, 500)
        & (mean_word_len >= 3.0)
        & (mean_word_len <= 10.0)
        & (frac_alpha >= 0.8)
        & (n_stop >= 2)
        & (ttr >= 0.2)
    )
    counts["after_quality"] = d.count()

    # 3. exact dedup — min doc_id per normalized content hash (q_dedup_exact)
    content_key = md5_long(F.concat_ws(" ", tokens("text")))
    wk = W.partitionBy("ck").orderBy("doc_id")
    d = (
        d.withColumn("ck", content_key)
        .withColumn("_rn", F.row_number().over(wk))
        .filter(F.col("_rn") == 1)
        .drop("ck", "_rn")
    )
    counts["after_exact_dedup"] = d.count()

    # 4. near-dup keep-best: Jaccard edges → components → best quality per
    #    cluster (q_dedup_pipeline_keep, quality = fixed-weight score)
    comp = connected_components(jaccard_edges(d)).select(
        F.col("node").alias("doc_id"), F.col("comp").alias("component")
    )
    quality = (
        (0.4 * ttr)
        + (0.3 * (n_stop.cast("double") / n_tokens))
        + (0.3 * F.when((n_tokens >= 20) & (n_tokens <= 200), 1.0).otherwise(0.0))
    )
    scored = (
        d.withColumn("quality_score", quality)
        .join(comp, "doc_id", "left")
        .withColumn("component", F.coalesce("component", "doc_id"))
    )
    wr = W.partitionBy("component").orderBy(F.desc("quality_score"), "doc_id")
    d = (
        scored.withColumn("_rk", F.row_number().over(wr))
        .filter(F.col("_rk") == 1)
        .drop("_rk", "component", "quality_score")
    )
    counts["after_neardup"] = d.count()

    # 5. sequence packing per source shard (q_text_pack_sequences)
    wp = W.partitionBy("source").orderBy("doc_id")
    nt = F.size(tokens("text")).cast("bigint")
    d = (
        d.withColumn("n_tokens", nt)
        .withColumn("cum_tokens", F.sum("n_tokens").over(wp))
        .withColumn(
            "seq_id",
            F.concat(
                F.col("source"),
                F.lit("#"),
                F.floor((F.col("cum_tokens") - F.col("n_tokens")) / F.lit(seq_tokens)).cast(
                    "string"
                ),
            ),
        )
    )

    d.write.mode("overwrite").parquet(out_path)
    counts["written"] = spark.read.parquet(out_path).count()
    return counts
