"""BPE merge training: greedy-merge semantics pinned on hand-built corpora
(the oracle gate checks the full pipeline; these pin the fold's corner
cases — self-overlapping runs, cross-round symbol composition, tie-breaks
— where a subtle fold bug could still produce a plausible merge table)."""

from pyspark.sql import functions as F

from poc_juma_etl_spark.operators.bpe import _apply_merge, train_merges
from poc_juma_etl_spark.plans.queries import release_caches


def _corpus(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).select("doc_id", F.split(F.trim("text"), r"\s+").alias("ts"))


def _merged(spark, ts, left, right):
    df = spark.createDataFrame([(ts,)], "ts array<string>")
    return df.select(_apply_merge(left, right).alias("out")).first().out


def test_apply_merge_simple(spark):
    assert _merged(spark, ["a", "b", "c"], "a", "b") == ["a b", "c"]


def test_apply_merge_greedy_self_overlap(spark):
    # run of identical symbols: greedy left-to-right merges 1-2, skips 3
    assert _merged(spark, ["a", "a", "a"], "a", "a") == ["a a", "a"]
    # even run merges cleanly in pairs
    assert _merged(spark, ["a", "a", "a", "a"], "a", "a") == ["a a", "a a"]


def test_apply_merge_no_false_rematch(spark):
    # after merging (a,b), the new symbol "a b" must not re-trigger with a
    # following bare "b" (the fold compares full symbol strings)
    assert _merged(spark, ["a", "b", "b"], "a", "b") == ["a b", "b"]


def test_train_merges_composes_symbols(spark):
    # "x y" dominates round 1; round 2's best pair involves the merged
    # symbol, proving rounds see the rewritten corpus
    c = _corpus(spark, ["x y z x y z", "x y z"])
    try:
        m = train_merges(c, n_merges=2)
    finally:
        release_caches()
    assert m[0][1:] == ("x", "y", 3)
    assert m[1][1:] == ("x y", "z", 3)


def test_train_merges_deterministic_tiebreak(spark):
    # all pairs occur once; winner must be the lexicographically smallest
    c = _corpus(spark, ["b c", "a d"])
    try:
        m = train_merges(c, n_merges=1)
    finally:
        release_caches()
    assert m[0][1:] == ("a", "d", 1)
