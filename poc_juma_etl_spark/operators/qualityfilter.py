"""Model-based corpus quality filtering, end to end — the classifier-filter
stage of an LLM data pipeline (CCNet / fastText-filter shape): TRAIN a
quality classifier on weak rule labels over the documents table, SCORE the
whole corpus with the learned weights, FILTER by probability threshold, and
report per-language admission statistics.

Built on the fixed-point logistic-regression core (operators/logreg.py —
the `_p_expr` rational sigmoid and `_update` integer GD step are shared):
every step is one column-pruned scan + one map-side-combined aggregation;
weights live on the driver and enter each expression as literals; the
scoring pass is a single in-row expression over the same projection. All
arithmetic is integer fixed-point, so the DuckDB oracle
(:func:`quality_filter_oracle_sql`) replays the identical K training steps
as an unrolled CTE chain and the identical scoring aggregation — full
value-hash equality on the per-language output.

Features (all small integers, identical text in both engines apart from
the integer-division operator):

- bias,
- length bucket  LEAST(n_chars idiv 64, 7),
- english indicator (lang = 'en'),
- token-count bucket LEAST(n_tokens idiv 16, 7) over the portable
  whitespace tokenization (the q_text_token_stats parity pair).

Weak labels: ``lang = 'en' AND n_chars >= 256`` — a rule the features can
represent linearly, so the trained filter's agreement with the rule is a
meaningful fit check (pinned in tests), while the GATE is exactness, which
holds for any label quality.

Scale: K+1 passes over a 3-column projection; the filter itself adds no
shuffle beyond the per-language aggregation. Registration queued for
round 10 with the rest of the operator queue.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from .logreg import LR_DEN, WS, _p_expr, _update

STEPS = 6


def qf_features(idiv: str) -> tuple[tuple[str, str], ...]:
    """Feature map over the (lang, n_chars, n_tok) projection; ``idiv`` is
    the engine's integer-division operator (Spark DIV, DuckDB //) — every
    operand is non-negative, so the two semantics agree."""
    return (
        ("x_bias", "CAST(1 AS BIGINT)"),
        ("x_len", f"LEAST(CAST(n_chars AS BIGINT) {idiv} 64, 7)"),
        ("x_en", "CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT)"),
        ("x_tok", f"LEAST(n_tok {idiv} 16, 7)"),
        # interaction term: the weak rule is a conjunction (en AND long),
        # which is linear in en*len but not in {en, len} alone — without it
        # squared-loss GD settles on the majority-class plateau
        (
            "x_enlen",
            "CAST(CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS BIGINT) * "
            f"LEAST(CAST(n_chars AS BIGINT) {idiv} 64, 7)",
        ),
    )


LABEL = "CAST(CASE WHEN lang = 'en' AND n_chars >= 256 THEN 1 ELSE 0 END AS BIGINT)"

OUT_COLS = "lang string, n_docs long, n_kept long, n_agree long, sum_score long"


def train_quality_weights(
    spark: SparkSession, sf_dir: str, steps: int = STEPS
) -> list[int]:
    """K full-batch fixed-point GD steps over the documents projection;
    returns the final integer weight vector."""
    feats = _projection(spark, sf_dir)
    features = qf_features("DIV")
    weights = [0] * len(features)
    for _ in range(steps):
        p = _p_expr(weights, "DIV", features)
        err = f"({p} - y * {WS})"
        aggs = [
            F.expr(f"SUM({err} * {name})").alias(f"g_{name}")
            for name, _ in features
        ] + [F.count(F.lit(1)).alias("n")]
        r = feats.agg(*aggs).collect()[0]
        n = int(r["n"])
        grads = [int(r[f"g_{name}"] or 0) for name, _ in features]
        if n:
            weights = _update(weights, grads, n)
    return weights


def _projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text import tokens

    d = load_table(spark, sf_dir, "documents")
    base = d.select(
        "lang",
        F.col("n_chars"),
        F.size(tokens("text")).cast("bigint").alias("n_tok"),
    )
    features = qf_features("DIV")
    return base.selectExpr(
        "lang",
        *(f"{expr} AS {name}" for name, expr in features),
        f"{LABEL} AS y",
    )


def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train, score, filter, report: per-language document counts, kept
    counts at p >= 1/2, agreement with the weak rule, and the exact integer
    score mass — the whole pipeline hash-comparable across engines."""
    weights = train_quality_weights(spark, sf_dir)
    feats = _projection(spark, sf_dir)
    p = _p_expr(weights, "DIV", qf_features("DIV"))
    return (
        feats.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.expr(
                f"SUM(CASE WHEN ({p}) >= {WS // 2} THEN 1 ELSE 0 END)"
            ).cast("long").alias("n_kept"),
            F.expr(
                f"SUM(CASE WHEN (({p}) >= {WS // 2}) = (y = 1) THEN 1 ELSE 0 END)"
            ).cast("long").alias("n_agree"),
            F.expr(f"SUM({p})").cast("long").alias("sum_score"),
        )
        .orderBy("lang")
    )


def quality_filter_oracle_sql(steps: int = STEPS) -> str:
    """The identical pipeline as one DuckDB statement: materialized feature
    projection, unrolled K-step training CTE chain (the logreg oracle
    idiom, n = 0 carrying the entering weights), then the scoring
    aggregation with the final weights."""
    features = qf_features("//")
    feat_cols = ",\n        ".join(f"{expr} AS {name}" for name, expr in features)
    parts = [
        "base AS MATERIALIZED (\n        SELECT lang, n_chars,"
        " CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tok"
        "\n        FROM documents)",
        f"feats AS MATERIALIZED (\n        SELECT lang, {feat_cols},\n"
        f"        {LABEL} AS y FROM base)",
        "nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM feats)",
    ]
    prev_w = ["CAST(0 AS BIGINT)"] * len(features)
    for i in range(1, steps + 1):
        p = _p_expr(prev_w, "//", features)
        err = f"({p} - y * {WS})"
        g_cols = ",\n            ".join(
            f"SUM({err} * {name}) AS g_{name}" for name, _ in features
        )
        parts.append(
            f"m{i} AS MATERIALIZED (\n        SELECT {g_cols} FROM feats)"
        )
        w_cols = ",\n            ".join(
            f"CAST(CASE WHEN nn.n = 0 THEN ({pw}) "
            f"WHEN m{i}.g_{name} >= 0 "
            f"THEN ({pw}) - (ABS(m{i}.g_{name}) // ({LR_DEN} * nn.n)) "
            f"ELSE ({pw}) + (ABS(m{i}.g_{name}) // ({LR_DEN} * nn.n)) END "
            f"AS BIGINT) AS w_{name}"
            for (name, _), pw in zip(features, prev_w)
        )
        parts.append(f"s{i} AS MATERIALIZED (\n        SELECT {w_cols} FROM m{i}, nn)")
        prev_w = [f"(SELECT w_{name} FROM s{i})" for name, _ in features]
    p = _p_expr(prev_w, "//", features)
    return (
        "WITH "
        + ",\n    ".join(parts)
        + f"""
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN ({p}) >= {WS // 2} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_kept,
           CAST(SUM(CASE WHEN (({p}) >= {WS // 2}) = (y = 1) THEN 1 ELSE 0 END)
             AS BIGINT) AS n_agree,
           CAST(SUM({p}) AS BIGINT) AS sum_score
    FROM feats GROUP BY lang ORDER BY lang"""
    )
