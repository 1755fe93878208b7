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
from ..plans.queries import dec_to_double, register
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
             CAST(CAST(SUM(CAST(
               ln(1.0 + (((CAST(s.n_docs AS DOUBLE) - df.df) + 0.5) / (df.df + 0.5)))
               * ((tf.tf * ({K1} + 1.0))
                  / (tf.tf + ({K1} * ((1.0 - {B}) + ({B} * (dl.dl / s.avgdl))))))
             AS DECIMAL(25,9))) AS STRING) AS DOUBLE) AS score
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
        .agg(dec_to_double(F.sum((idf * tf_part).cast("decimal(25,9)"))).alias("score"))
    )
    return scored.orderBy(F.desc("score"), "doc_id").limit(TOP_N)


@register(
    "q_text_tfidf_search",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY doc_id, term),
    df AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY term),
    n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs FROM tf),
    w AS (
      SELECT tf.doc_id, tf.term,
             tf.tf * (ln((1.0 + n.n_docs) / (1.0 + df.df)) + 1.0) AS wt
      FROM tf JOIN df ON df.term = tf.term CROSS JOIN n
    ),
    norms AS (
      SELECT doc_id,
             sqrt(CAST(CAST(SUM(CAST(wt * wt AS DECIMAL(25,9))) AS STRING) AS DOUBLE)) AS dnorm
      FROM w GROUP BY doc_id
    ),
    qw AS (
      SELECT df.term, ln((1.0 + n.n_docs) / (1.0 + df.df)) + 1.0 AS qwt
      FROM df CROSS JOIN n WHERE df.term IN {QUERY_TERMS!r}
    ),
    qnorm AS (SELECT sqrt(CAST(CAST(SUM(CAST(qwt * qwt AS DECIMAL(25,9))) AS STRING) AS DOUBLE)) AS qn FROM qw),
    scored AS (
      SELECT w.doc_id,
             CAST(CAST(SUM(CAST(w.wt * qw.qwt AS DECIMAL(25,9))) AS STRING) AS DOUBLE)
               / (norms.dnorm * qnorm.qn) AS score
      FROM w JOIN qw ON qw.term = w.term
      JOIN norms ON norms.doc_id = w.doc_id
      CROSS JOIN qnorm
      GROUP BY w.doc_id, norms.dnorm, qnorm.qn
    )
    SELECT doc_id, score FROM scored
    ORDER BY score DESC, doc_id
    LIMIT {TOP_N}
    """,
    doc=f"TF-IDF cosine retrieval for query terms {QUERY_TERMS}: smooth-idf "
    "weights (sklearn formulation ln((1+N)/(1+df))+1), per-document L2 "
    "norms over the FULL vocabulary (the part BM25 skips — norms need "
    "every term, so the weight table is built before the query filter), "
    "cosine = dot/(|D||Q|), top-25. Two shuffles on (doc,term)/term keys; "
    "the df table and 1-row corpus stats broadcast; per-doc dots and "
    "norms are decimal-summed then sqrt'd (IEEE sqrt is correctly "
    "rounded in both engines, so identical inputs give identical "
    "outputs). The norm table is a per-doc aggregate — at 100 TB it "
    "persists beside the index, not recomputed per query.",
    tags=("text", "tfidf", "search"),
)
def q_text_tfidf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(tokens("text")).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    n = tf.agg(F.countDistinct("doc_id").cast("bigint").alias("n_docs"))
    idf = F.log((1.0 + F.col("n_docs")) / (1.0 + F.col("df"))) + 1.0
    w = (
        tf.join(df_t, "term")
        .crossJoin(F.broadcast(n))
        .select("doc_id", "term", (F.col("tf") * idf).alias("wt"))
    )
    norms = w.groupBy("doc_id").agg(
        F.sqrt(dec_to_double(F.sum((F.col("wt") * F.col("wt")).cast("decimal(25,9)")))).alias(
            "dnorm"
        )
    )
    qw = (
        df_t.filter(F.col("term").isin(*QUERY_TERMS))
        .crossJoin(F.broadcast(n))
        .select("term", idf.alias("qwt"))
    )
    qnorm = qw.agg(
        F.sqrt(dec_to_double(F.sum((F.col("qwt") * F.col("qwt")).cast("decimal(25,9)")))).alias(
            "qn"
        )
    )
    scored = (
        w.join(F.broadcast(qw), "term")
        .join(norms, "doc_id")
        .crossJoin(F.broadcast(qnorm))
        .groupBy("doc_id", "dnorm", "qn")
        .agg(
            (
                dec_to_double(F.sum((F.col("wt") * F.col("qwt")).cast("decimal(25,9)")))
                / (F.col("dnorm") * F.col("qn"))
            ).alias("score")
        )
        .select("doc_id", "score")
    )
    return scored.orderBy(F.desc("score"), "doc_id").limit(TOP_N)
