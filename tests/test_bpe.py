"""BPE merge training: greedy-merge semantics pinned on hand-built corpora
(the oracle gate checks the full pipeline; these pin the fold's corner
cases — self-overlapping runs, cross-round symbol composition, tie-breaks
— where a subtle fold bug could still produce a plausible merge table)."""

from collections import namedtuple

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from poc_juma_etl_spark.operators.bpe import _apply_merge, _safe_batch, train_merges
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


# ---------------------------------------------------------------------------
# batched training: the batch-per-job trainer must produce the EXACT merge
# table of the one-merge-per-job trainer (the greedy-equivalence the module
# docstring proves — this is the guard VERDICT r3 asked to keep)

Pair = namedtuple("Pair", "l r cnt")


def test_safe_batch_conflict_tie_falls_back_to_top1():
    # (a,b) and (b,c) conflict AND tie at 2 — only the top-1 is safe
    rows = [Pair("a", "b", 2), Pair("b", "c", 2), Pair("c", "d", 1)]
    assert _safe_batch(rows, 8) == [("a", "b", 2)]


def test_safe_batch_disjoint_strictly_above_terminator():
    rows = [Pair("a", "b", 3), Pair("c", "d", 2), Pair("b", "x", 2), Pair("y", "z", 2)]
    # (c,d) is disjoint from (a,b) but TIES the terminator (b,x) at 2 — a
    # pair created by merging (a,b) could tie it too, so it must be dropped
    assert _safe_batch(rows, 8) == [("a", "b", 3)]


def test_safe_batch_all_disjoint_no_terminator():
    rows = [Pair("a", "b", 3), Pair("c", "d", 2)]
    assert _safe_batch(rows, 8) == [("a", "b", 3), ("c", "d", 2)]


@given(
    st.lists(
        st.tuples(
            st.sampled_from("abcdef"), st.sampled_from("abcdef"), st.integers(1, 9)
        ),
        min_size=1,
        max_size=12,
    ),
    st.integers(1, 8),
)
@settings(max_examples=200, deadline=None)
def test_safe_batch_invariants(raw, limit):
    # dedupe + sort the way the count query would
    seen = {}
    for l, r, c in raw:
        seen[(l, r)] = max(seen.get((l, r), 0), c)
    rows = [Pair(l, r, c) for (l, r), c in seen.items()]
    rows.sort(key=lambda p: (-p.cnt, p.l, p.r))
    batch = _safe_batch(rows, limit)
    assert 1 <= len(batch) <= limit
    # it's a prefix of the sorted candidate list
    assert batch == [tuple(p) for p in rows[: len(batch)]]
    # pairwise symbol-disjoint — except the always-safe top-1 fallback
    if len(batch) > 1:
        # self-pairs may only merge alone (their created pairs are bounded
        # by their own in-batch count, not the terminator)
        assert all(l != r for l, r, _ in batch)
        syms: set[str] = set()
        for l, r, _ in batch:
            assert l not in syms and r not in syms
            syms.update((l, r))
        # strictly above the first excluded candidate's count
        if len(rows) > len(batch):
            assert batch[-1][2] > rows[len(batch)].cnt


def test_batched_trainer_matches_sequential(spark):
    corpora = [
        # disjoint top pairs — a real 2-merge batch fires
        ["a b a b c d c d e", "a b c d"],
        # conflicting tie at the top — must fall back to single merges
        ["a b c a b c", "b c b c"],
        # self-overlap runs interleaved with normal pairs
        ["a a a a b c b c", "a a b c"],
        # the self-pair trap (found by review): merging (a,a) creates
        # ("a a","a a") with count 4, which TIES the disjoint (c,d) at 4
        # and wins the lexicographic tie-break — a batch containing both
        # (a,a) and (c,d) would diverge from sequential greedy
        ["a a a a a a a a a a", "c d", "c d", "c d", "c d"],
        # composed symbols across rounds
        ["x y z x y z w", "x y z", "y z w"],
    ]
    for texts in corpora:
        c = _corpus(spark, texts)
        try:
            seq = train_merges(c, n_merges=5, batch_max=1)
            bat = train_merges(c, n_merges=5, batch_max=8)
        finally:
            release_caches()
        assert bat == seq, texts


# ---------------------------------------------------------------------------
# Pure-Python model equivalence: the batching logic (the only part that can
# break greedy equivalence) verified against a reference sequential trainer
# under hypothesis — no Spark in the loop, so hundreds of corpora are cheap.
# (The reviewer's self-pair counterexample was exactly the kind of case a
# fixed fixture list missed; this sweep covers the space.)


def _py_pairs(corpus):
    from collections import Counter

    c = Counter()
    for doc in corpus:
        for a, b in zip(doc, doc[1:]):
            c[(a, b)] += 1
    return c


def _py_merge(doc, l, r):
    out = []
    i = 0
    while i < len(doc):
        if i + 1 < len(doc) and doc[i] == l and doc[i + 1] == r:
            out.append(l + " " + r)
            i += 2
        else:
            out.append(doc[i])
            i += 1
    return out


def _py_train(corpus, n_merges, batch_max):
    corpus = [list(d) for d in corpus]
    merges = []
    while len(merges) < n_merges:
        cnt = _py_pairs(corpus)
        if not cnt:
            break
        rows = sorted(
            (Pair(l, r, c) for (l, r), c in cnt.items()),
            key=lambda p: (-p.cnt, p.l, p.r),
        )
        room = min(batch_max, n_merges - len(merges))
        batch = _safe_batch(rows[: room + 1], room)
        for l, r, c in batch:
            merges.append((len(merges) + 1, l, r, c))
            corpus = [_py_merge(d, l, r) for d in corpus]
    return merges


def test_py_model_reproduces_reviewer_counterexample():
    corpus = [["a"] * 10, ["c", "d"], ["c", "d"], ["c", "d"], ["c", "d"]]
    seq = _py_train(corpus, 3, 1)
    bat = _py_train(corpus, 3, 8)
    assert bat == seq
    # and the sequence really does pick the created self-merge pair second
    assert seq[1][1] == "a a" and seq[1][2] == "a a"


@given(
    st.lists(
        st.lists(st.sampled_from("abcd"), min_size=0, max_size=8),
        min_size=1,
        max_size=6,
    ),
    st.integers(1, 5),
    st.integers(2, 8),
)
@settings(max_examples=300, deadline=None)
def test_batched_python_model_always_matches_sequential(corpus, n_merges, bmax):
    assert _py_train(corpus, n_merges, bmax) == _py_train(corpus, n_merges, 1)
