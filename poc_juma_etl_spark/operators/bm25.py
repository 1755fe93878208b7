"""BM25 full-text ranking over the documents table.

The retrieval-scoring half of a data pipeline's search/filter stage: given
query terms, rank documents by Okapi BM25. Classic formulation:

    score(D, Q) = Σ_t IDF(t) · tf(t,D)·(k1+1) / (tf(t,D) + k1·(1 - b + b·|D|/avgdl))
    IDF(t) = ln(1 + (N - df(t) + 0.5) / (df(t) + 0.5))

Spark shape: one explode to (doc, term, tf), a tiny df(t) aggregate joined
back broadcast, per-row double math, top-k by score. All counts are
integers; the double expression tree is written with an explicitly
parenthesized op order so DuckDB evaluates the identical IEEE sequence —
the whole ranking is oracle-able, ties broken by doc_id.

At 100 TB the (term → df) side is a dictionary aggregate (skew-safe: it's a
map-side-combinable count) and scoring is a broadcast join — no pairwise
anything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..plans.queries import register
from .text import tokens

K1 = 1.2
B = 0.75
QUERY_TERMS = ("table", "scan", "vector")
TOP_N = 25


@register(
    "q_text_bm25_search",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ts FROM documents
    ),
    doclen AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS dl FROM tok),
    stats AS (
      SELECT COUNT(*) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
      FROM doclen
    ),
    tf AS (
      SELECT doc_id, t.term, COUNT(*) AS tf
      FROM tok, unnest(ts) AS t(term)
      WHERE t.term IN {QUERY_TERMS!r}
      GROUP BY doc_id, t.term
    ),
    df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
    scored AS (
      SELECT tf.doc_id,
             CAST(SUM(CAST(
               ln(1.0 + (((CAST(s.n_docs AS DOUBLE) - df.df) + 0.5) / (df.df + 0.5)))
               * ((tf.tf * ({K1} + 1.0))
                  / (tf.tf + ({K1} * ((1.0 - {B}) + ({B} * (dl.dl / s.avgdl))))))
             AS DECIMAL(25,9))) AS DOUBLE) AS score
      FROM tf
      JOIN df ON df.term = tf.term
      JOIN doclen dl ON dl.doc_id = tf.doc_id
      CROSS JOIN stats s
      GROUP BY tf.doc_id
    )
    SELECT doc_id, score FROM scored
    ORDER BY score DESC, doc_id
    LIMIT {TOP_N}
    """,
    doc=f"Okapi BM25 ranking for query terms {QUERY_TERMS}: explode→tf, "
    "broadcast df(t) + corpus stats, per-row scoring with a pinned IEEE op "
    "order, top-25. Single-term scores are summed per doc — one value per "
    "(doc, term), so the decimal dance is unnecessary: each addend is "
    "computed identically in both engines; the per-doc sum of term scores "
    "goes through a DECIMAL(25,9) cast so addition order cannot matter.",
    tags=("text", "bm25", "search"),
)
def q_text_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", tokens("text").alias("ts"))
    doclen = tok.select("doc_id", F.size("ts").cast("bigint").alias("dl"))
    stats = doclen.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    terms = F.array(*[F.lit(t) for t in QUERY_TERMS])
    tf = (
        tok.select("doc_id", F.explode(F.filter(F.col("ts"), lambda x: F.array_contains(terms, x))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        1.0 + (((F.col("n_docs").cast("double") - F.col("df")) + 0.5) / (F.col("df") + 0.5))
    )
    tf_part = (F.col("tf") * (K1 + 1.0)) / (
        F.col("tf") + (K1 * ((1.0 - B) + (B * (F.col("dl") / F.col("avgdl")))))
    )
    scored = (
        tf.join(F.broadcast(df_t), "term")
        .join(F.broadcast(doclen), "doc_id")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.sum((idf * tf_part).cast("decimal(25,9)")).cast("double").alias("score"))
    )
    return scored.orderBy(F.desc("score"), "doc_id").limit(TOP_N)
