"""Bigram LM surprisal (operators/lm.py): the full Spark-vs-DuckDB parity
its future (round-12) driver gate will run, a pure-Python reference pinning
the integer floor-log2 arithmetic, distribution-sensitivity, and the empty
guard."""

import duckdb
import pytest

from poc_juma_etl_spark.operators.lm import (
    MEAN_SCALE,
    BIGRAM_SURPRISAL_ORACLE,
    q_text_bigram_surprisal,
)

from .conftest import SF_ORACLE, SF_SMOKE


def test_bigram_surprisal_matches_duckdb_oracle(spark):
    got = [tuple(r) for r in q_text_bigram_surprisal(spark, SF_ORACLE).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_ORACLE}/documents.parquet'"
    )
    want = [tuple(r) for r in con.execute(BIGRAM_SURPRISAL_ORACLE).fetchall()]
    assert got == want
    assert len(got) > 0


def test_bigram_surprisal_python_reference(spark, tmp_path):
    """Exact agreement with a from-scratch Python bigram LM on a tiny
    corpus whose counts are hand-checkable."""
    docs = [
        (0, "a b a b c", "en", "web", 9),
        (1, "a b", "en", "web", 3),
        (2, "z", "en", "web", 1),  # < 2 tokens: scores zero
        (3, "c a b", "en", "web", 5),
    ]
    path = str(tmp_path / "sf_tiny")
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{path}/documents.parquet")

    # python reference
    from collections import Counter

    pairs = {}
    c12, c1 = Counter(), Counter()
    for doc_id, text, _, _, _ in docs:
        ts = text.split()
        ps = [(ts[i], f"{ts[i]} {ts[i+1]}") for i in range(len(ts) - 1)]
        pairs[doc_id] = ps
        for w1, bgm in ps:
            c12[bgm] += 1
            c1[w1] += 1
    want = []
    for doc_id, *_ in docs:
        ss = [(c1[w1] // c12[bgm]).bit_length() - 1 for w1, bgm in pairs[doc_id]]
        n = len(ss)
        want.append(
            (
                doc_id,
                n,
                sum(ss),
                max(ss, default=0),
                (sum(ss) * MEAN_SCALE) // n if n else 0,
            )
        )
    got = [tuple(r) for r in q_text_bigram_surprisal(spark, path).collect()]
    assert got == want


def test_bigram_surprisal_separates_repeated_from_unique(spark, tmp_path):
    """A document repeating the corpus's dominant bigram must score LOWER
    mean surprisal than one continuing the same common CONTEXT word with
    corpus-unique tokens — the filter semantics the operator exists for.
    (The outlier must share context words with the dominant mass: a
    bigram whose context appears nowhere else has conditional probability
    1 and zero surprisal — singleton contexts are perfectly predictable
    in a self-trained LM.)"""
    docs = [(i, "the cat sat", "en", "web", 11) for i in range(8)] + [
        (100, "the zq the xw", "en", "web", 13)
    ]
    path = str(tmp_path / "sf_sep")
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{path}/documents.parquet")
    rows = {r.doc_id: r for r in q_text_bigram_surprisal(spark, path).collect()}
    assert rows[0].mean_surprisal_x1000 < rows[100].mean_surprisal_x1000


def test_bigram_surprisal_empty_input(spark, tmp_path):
    empty = str(tmp_path / "sf_empty")
    spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(0).write.parquet(
        f"{empty}/documents.parquet"
    )
    assert q_text_bigram_surprisal(spark, empty).collect() == []
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_SMOKE}/documents.parquet' "
        "WHERE 1 = 0"
    )
    assert con.execute(BIGRAM_SURPRISAL_ORACLE).fetchall() == []


def test_group_split_matches_duckdb_oracle(spark):
    from poc_juma_etl_spark.operators.lm import (
        group_split_oracle_sql,
        q_sample_group_split,
    )

    got = [tuple(r) for r in q_sample_group_split(spark, SF_ORACLE).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_ORACLE}/documents.parquet'"
    )
    want = [tuple(r) for r in con.execute(group_split_oracle_sql()).fetchall()]
    assert got == want
    assert got, "fixture corpus must produce at least one split"
    # the audit column is the point: zero groups straddle splits
    assert all(r[4] == 0 for r in got)


def test_group_split_is_group_disjoint_by_construction(spark, tmp_path):
    """Documents sharing a source land in one split even when a row-hash
    split would scatter them (many docs per source)."""
    docs = [
        (i, f"text {i} " * 5, "en", f"site{i % 7}", 40) for i in range(200)
    ]
    path = str(tmp_path / "sf_groups")
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{path}/documents.parquet")
    from poc_juma_etl_spark.operators.lm import q_sample_group_split

    rows = q_sample_group_split(spark, path).collect()
    assert sum(r.n_docs for r in rows) == 200
    assert sum(r.n_groups for r in rows) == 7
    assert all(r.n_leaked_groups == 0 for r in rows)


def test_group_split_empty_input(spark, tmp_path):
    from poc_juma_etl_spark.operators.lm import q_sample_group_split

    empty = str(tmp_path / "sf_empty")
    spark.read.parquet(f"{SF_SMOKE}/documents.parquet").limit(0).write.parquet(
        f"{empty}/documents.parquet"
    )
    assert q_sample_group_split(spark, empty).collect() == []
