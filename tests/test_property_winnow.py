"""Property check (hypothesis): the in-row winnowing fingerprint build
matches a direct Python model of the algorithm (Schleimer et al. 2003) on
arbitrary token streams — including the short-document (< window) and
short-shingle (< 3 tokens) edge paths."""

import hashlib

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from poc_juma_etl_spark.operators.text import MOD_P, WINNOW_W, winnow_fp_array


def _md5_long(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16) % MOD_P


def _model(tokens: list[str]) -> set[int]:
    """Pure-Python winnowing: 3-token shingles (one partial shingle when
    the doc is shorter), width-W min windows, distinct selections."""
    if len(tokens) >= 3:
        shingles = [
            " ".join(tokens[i : i + 3]) for i in range(len(tokens) - 2)
        ]
    else:
        shingles = [" ".join(tokens)]
    hashes = [_md5_long(s) for s in shingles]
    if len(hashes) >= WINNOW_W:
        return {
            min(hashes[i : i + WINNOW_W])
            for i in range(len(hashes) - WINNOW_W + 1)
        }
    return {min(hashes)}


tok_st = st.text(alphabet="abcd", min_size=1, max_size=4)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs=st.lists(st.lists(tok_st, min_size=1, max_size=25), min_size=1, max_size=8))
def test_winnow_fp_matches_model(spark, docs):
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: set(r.fp)
        for r in df.select("doc_id", winnow_fp_array().alias("fp")).collect()
    }
    want = {i: _model(toks) for i, toks in enumerate(docs)}
    assert got == want
