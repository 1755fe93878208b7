"""Round-6c operators: hybrid RRF retrieval, Gram-matrix stats, perceptual-
hash image dedup, calibration audit. Oracle parity for all four is covered
by the registry-wide sweep in test_oracle_parity.py; these tests pin the
algorithmic invariants the hash gate cannot see (aHash brightness
invariance, Gram-vs-numpy ground truth, RRF arithmetic, Brier identity)."""

import numpy as np
from pyspark.sql import functions as F

from poc_juma_etl_spark.operators.bm25 import (
    RRF_FUSE_K,
    RRF_K,
    RRF_QUERY_DOCS,
    RRF_SCALE,
    RRF_TOP_N,
    q_hybrid_rank_fusion,
)
from poc_juma_etl_spark.operators.multimodal import (
    PH_GROUPS,
    ahash_bits,
    decode_png_pixels,
    q_multimodal_phash_dedup,
    synth_phash_media,
)
from poc_juma_etl_spark.operators.vectors import q_embedding_gram_stats
from poc_juma_etl_spark.plans.mleval import CAL_BINS, q_eval_calibration

from .conftest import SF_ORACLE, SF_SMOKE


# --- perceptual hash ---------------------------------------------------------


def test_ahash_brightness_invariance_across_variants():
    # doc_ids g, g+40, g+80 share an image up to a uniform brightness shift;
    # the cross-multiplied aHash must be IDENTICAL for all three
    for g in (0, 7, 23, 39):
        hashes = set()
        for b in range(3):
            payload = synth_phash_media(g + b * PH_GROUPS)
            hashes.add(ahash_bits(*decode_png_pixels(payload)))
        assert len(hashes) == 1, f"group {g}: brightness variant changed the hash"


def test_ahash_exact_mean_comparison_tiny_image():
    # 16x16, left half 0s / right half 100s: left blocks below mean -> 0,
    # right blocks above -> 1, row-major (by, bx) emission order
    lines = [bytes([0] * 8 + [100] * 8) for _ in range(16)]
    assert ahash_bits(16, 16, lines) == ("0000" + "1111") * 8


def test_phash_dedup_collapses_variants(spark):
    rows = q_multimodal_phash_dedup(spark, SF_SMOKE).collect()
    # 500 docs, content keyed by doc_id % 40: every cluster size is a
    # multiple of one group's 12-13 members and all docs are accounted for
    assert sum(r["n_docs"] for r in rows) == 500
    assert all(r["n_docs"] >= 12 for r in rows)
    assert all(len(r["ahash"]) == 64 and set(r["ahash"]) <= {"0", "1"} for r in rows)
    # keeper is the cluster minimum, checksum consistent with grouped ids
    assert all(r["keeper_doc_id"] <= r["id_checksum"] / r["n_docs"] for r in rows)


# --- Gram-matrix stats -------------------------------------------------------


def test_gram_stats_match_numpy(spark):
    out = {
        (r["i"], r["j"]): r
        for r in q_embedding_gram_stats(spark, SF_SMOKE).collect()
    }
    emb = np.array(
        [
            r["embedding"]
            for r in spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")
            .orderBy("vec_id")
            .collect()
        ],
        dtype=np.float64,
    )
    y = emb * 4194304
    # Spark/DuckDB round() is half-away-from-zero; np.round is half-even
    q = np.where(y >= 0, np.floor(y + 0.5), np.ceil(y - 0.5)).astype(np.int64)
    n = q.shape[0]
    # full upper triangle present
    assert len(out) == 64 * 65 // 2
    for i, j in [(0, 0), (0, 63), (17, 42), (63, 63)]:
        r = out[(i, j)]
        assert r["gram"] == int(q[:, i] @ q[:, j])
        assert r["sum_i"] == int(q[:, i].sum())
        assert r["sum_j"] == int(q[:, j].sum())
        assert r["n_vecs"] == n


# --- hybrid RRF --------------------------------------------------------------


def test_rrf_rank_consistency(spark):
    rows = q_hybrid_rank_fusion(spark, SF_ORACLE).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    assert set(by_q) == set(RRF_QUERY_DOCS)
    for qid, rs in by_q.items():
        # fused ranks are dense 1..k, ordered by (rrf desc, doc_id)
        assert [r["fused_rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= RRF_FUSE_K
        for r in rs:
            # integer RRF recomputed from the per-modality ranks
            expect = 0
            if r["rank_text"] is not None:
                assert 1 <= r["rank_text"] <= RRF_TOP_N
                expect += RRF_SCALE // (RRF_K + r["rank_text"])
            if r["rank_vec"] is not None:
                assert 1 <= r["rank_vec"] <= RRF_TOP_N
                expect += RRF_SCALE // (RRF_K + r["rank_vec"])
            assert r["rrf_score"] == expect
            assert r["rank_text"] is not None or r["rank_vec"] is not None
            assert r["doc_id"] != qid  # self excluded from both modalities
        scores = [r["rrf_score"] for r in rs]
        assert scores == sorted(scores, reverse=True)


def test_rrf_both_modalities_contribute(spark):
    rows = q_hybrid_rank_fusion(spark, SF_ORACLE).collect()
    # a doc ranked by BOTH lists must outrank one ranked by a single list
    # at similar depth — at minimum, both modalities appear in the output
    assert any(r["rank_text"] is not None for r in rows)
    assert any(r["rank_vec"] is not None for r in rows)
    assert any(
        r["rank_text"] is not None and r["rank_vec"] is not None for r in rows
    )


# --- calibration -------------------------------------------------------------


def test_calibration_partition_and_brier_identity(spark):
    rows = q_eval_calibration(spark, SF_ORACLE).collect()
    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet").collect()
    smax = max(r["n_chars"] for r in docs)
    assert sum(r["n"] for r in rows) == len(docs)
    assert all(0 <= r["bin"] < CAL_BINS for r in rows)
    assert all(r["brier_num"] >= 0 for r in rows)
    # recompute one bin's Brier numerator from first principles
    target = rows[0]["bin"]
    num = sum(
        (r["n_chars"] - (smax if r["lang"] == "en" else 0)) ** 2
        for r in docs
        if (r["n_chars"] * CAL_BINS) // (smax + 1) == target
    )
    assert rows[0]["brier_num"] == num
    # frac_pos and mean_p are exact divisions of the emitted integers
    for r in rows:
        assert r["frac_pos"] == r["sum_y"] / r["n"]
        assert r["mean_p"] == r["sum_score"] / (r["n"] * smax)


# --- span dedup / PMI / weighted median (round-6c batch 2) --------------------


def _py_tokens(text):
    import re

    return re.split(r"\s+", text.strip())


def test_span_dedup_matches_pure_python(spark):
    from poc_juma_etl_spark.plans.extra9 import SPAN_K, q_text_span_dedup

    docs = {
        r["doc_id"]: _py_tokens(r["text"])
        for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    }
    # corpus-wide shingle occurrence counts (string-exact; the operator's
    # 60-bit hash is collision-free at this scale by construction)
    from collections import Counter

    occ = Counter()
    positions = {}
    for did, ts in docs.items():
        pos = []
        for i in range(len(ts) - SPAN_K + 1):
            s = " ".join(ts[i : i + SPAN_K])
            occ[s] += 1
            pos.append((i, s))
        positions[did] = pos
    expect = {}
    for did, pos in positions.items():
        dup = sorted(i for i, s in pos if occ[s] >= 2)
        if not dup:
            continue
        spans = []
        start = prev = dup[0]
        for p in dup[1:]:
            if p - prev > SPAN_K:
                spans.append((start, prev))
                start = p
            prev = p
        spans.append((start, prev))
        expect[did] = {
            "n_spans": len(spans),
            "dup_tokens": sum(e - s + SPAN_K for s, e in spans),
            "max_span": max(e - s + SPAN_K for s, e in spans),
            "n_dup_shingles": len(dup),
        }
    rows = {r["doc_id"]: r for r in q_text_span_dedup(spark, SF_SMOKE).collect()}
    assert set(rows) == set(expect)
    for did, e in expect.items():
        r = rows[did]
        assert r["n_spans"] == e["n_spans"]
        assert r["dup_tokens"] == e["dup_tokens"]
        assert r["max_span_tokens"] == e["max_span"]
        assert r["n_dup_shingles"] == e["n_dup_shingles"]


def test_pmi_top1_matches_pure_python(spark):
    from collections import Counter

    from poc_juma_etl_spark.plans.extra9 import (
        PMI_MIN_COUNT,
        PMI_SCALE,
        q_text_pmi_collocations,
    )

    uni, bi = Counter(), Counter()
    for r in spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect():
        ts = _py_tokens(r["text"])
        uni.update(ts)
        bi.update(zip(ts, ts[1:]))
    n = sum(uni.values())
    scored = sorted(
        (
            ((c * n * PMI_SCALE) // (uni[w1] * uni[w2]), w1, w2, c)
            for (w1, w2), c in bi.items()
            if c >= PMI_MIN_COUNT
        ),
        key=lambda t: (-t[0], t[1], t[2]),
    )
    rows = q_text_pmi_collocations(spark, SF_SMOKE).collect()
    assert len(rows) == 30
    top = rows[0]
    assert (top["pmi_scaled"], top["w1"], top["w2"], top["c_xy"]) == scored[0]
    # ranking proxy is monotone with the emitted lift within the output
    lifts = [(r["pmi_scaled"], r["lift"]) for r in rows]
    assert all(
        a_l >= b_l or a_s != b_s
        for (a_s, a_l), (b_s, b_l) in zip(lifts, lifts[1:])
    )


def test_weighted_median_matches_pure_python(spark):
    from poc_juma_etl_spark.plans.extra9 import q_weighted_median

    li = (
        spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        .select("l_returnflag", "l_extendedprice", "l_quantity")
        .collect()
    )
    groups = {}
    for r in li:
        groups.setdefault(r["l_returnflag"], []).append(
            (r["l_extendedprice"], int(r["l_quantity"]))
        )
    rows = {r["grp"]: r for r in q_weighted_median(spark, SF_SMOKE).collect()}
    assert set(rows) == set(groups)
    for g, vals in groups.items():
        from collections import defaultdict

        per_val = defaultdict(int)
        for v, w in vals:
            per_val[v] += w
        tot = sum(per_val.values())
        cum = 0
        for v in sorted(per_val):
            cum += per_val[v]
            if 2 * cum >= tot:
                assert rows[g]["weighted_median"] == v
                assert rows[g]["cum_weight"] == cum
                assert rows[g]["total_weight"] == tot
                break


# --- ops diagnostics (round-6c batch 3) ---------------------------------------


def test_skew_key_stats_matches_pure_python(spark):
    from collections import Counter

    from poc_juma_etl_spark.plans.extra9 import PPM, SKEW_TOP, q_skew_key_stats

    cnt = Counter(
        r["user_id"]
        for r in spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("user_id")
        .collect()
    )
    total = sum(cnt.values())
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:SKEW_TOP]
    rows = q_skew_key_stats(spark, SF_SMOKE).collect()
    assert [(r["user_id"], r["cnt"]) for r in rows] == top
    mx = max(cnt.values())
    for r in rows:
        assert r["share_ppm"] == (r["cnt"] * PPM) // total
        assert r["n_keys"] == len(cnt)
        assert r["total_rows"] == total
        assert r["max_over_mean_x100"] == (mx * 100 * len(cnt)) // total


def test_freshness_sla_lags(spark):
    from poc_juma_etl_spark.plans.extra9 import FRESH_SLA_S, q_dq_freshness_sla

    rows = q_dq_freshness_sla(spark, SF_SMOKE).collect()
    assert rows, "events fixture has types"
    assert any(r["lag_s"] == 0 for r in rows)  # the freshest source
    for r in rows:
        assert r["lag_s"] >= 0
        assert r["within_sla"] == (r["lag_s"] <= FRESH_SLA_S)


def test_zonemap_sorted_layout_skips_hash_layout_does_not(spark):
    from poc_juma_etl_spark.plans.extra9 import ZM_FILES, q_zonemap_skip_stats

    rows = {r["layout"]: r for r in q_zonemap_skip_stats(spark, SF_SMOKE).collect()}
    assert set(rows) == {"ts_sorted", "insertion_hash"}
    srt, hsh = rows["ts_sorted"], rows["insertion_hash"]
    assert srt["rows_total"] == hsh["rows_total"]
    assert srt["n_files"] <= ZM_FILES and hsh["n_files"] <= ZM_FILES
    # range-binned layout skips most files for a ~10%-of-range predicate;
    # hash placement gives every file full time spread
    assert srt["skip_ratio"] > 0.8
    assert hsh["files_skipped"] == 0
    assert srt["files_skipped"] >= ZM_FILES // 2


def test_referential_integrity_all_edges(spark):
    from poc_juma_etl_spark.plans.extra9 import _RI_RELS, q_dq_referential_integrity

    rows = {r["relationship"]: r for r in q_dq_referential_integrity(spark, SF_SMOKE).collect()}
    assert set(rows) == {r[0] for r in _RI_RELS}
    for r in rows.values():
        assert r["ok"] == (r["orphan_rows"] == 0)
        assert r["orphan_keys"] <= r["orphan_rows"]
        assert r["child_keys"] <= r["child_rows"]
    # the TPC-H star edges are constructed consistent in the fixture
    assert rows["lineitem.l_orderkey->orders"]["ok"]
    assert rows["nation.n_regionkey->region"]["ok"]


def test_trigram_paths_match_pure_python(spark):
    from collections import Counter

    from poc_juma_etl_spark.plans.extra9 import PATH_TOP, q_event_trigram_paths

    ev = sorted(
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("user_id", "ts", "event_id", "event_type")
        .collect(),
        key=lambda r: (r["user_id"], r["ts"], r["event_id"]),
    )
    tri = Counter()
    by_user = {}
    for r in ev:
        by_user.setdefault(r["user_id"], []).append(r["event_type"])
    for seq in by_user.values():
        tri.update(zip(seq, seq[1:], seq[2:]))
    total = sum(tri.values())
    expect = sorted(tri.items(), key=lambda kv: (-kv[1], kv[0]))[:PATH_TOP]
    rows = q_event_trigram_paths(spark, SF_SMOKE).collect()
    assert [((r["e1"], r["e2"], r["e3"]), r["cnt"]) for r in rows] == expect
    for r in rows:
        assert r["total"] == total
        assert r["share_ppm"] == (r["cnt"] * 1_000_000) // total


def test_kcore_peeling_invariants(spark):
    from poc_juma_etl_spark.plans.extra9 import KCORE_K, KCORE_ROUNDS, q_graph_kcore

    rows = q_graph_kcore(spark, SF_SMOKE).collect()
    assert [r["round"] for r in rows] == list(range(1, KCORE_ROUNDS + 1))
    rem = [r["n_remaining"] for r in rows]
    assert rem == sorted(rem, reverse=True)  # node count never grows
    assert all(r["n_removed"] >= 0 for r in rows)
    assert rows[-1]["n_remaining"] == rows[0]["core_size"] == rows[-1]["core_size"]
    if rows[-1]["converged"]:
        assert rows[-1]["n_removed"] == 0
    # every survivor of the final round has degree >= k inside the core:
    # re-derive the core edge set in pure python from the fixture
    import itertools
    from collections import defaultdict

    li = (
        spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .collect()
    )
    baskets = defaultdict(set)
    for r in li:
        baskets[r["l_orderkey"]].add(r["l_partkey"])
    edges = set()
    for parts in baskets.values():
        edges.update(itertools.combinations(sorted(parts), 2))
    adj = defaultdict(set)
    for u, v in edges:
        adj[u].add(v)
        adj[v].add(u)
    nodes = set(adj)
    for _ in range(KCORE_ROUNDS):
        keep = {n for n in nodes if sum(1 for p in adj[n] if p in nodes) >= KCORE_K}
        if keep == nodes:
            break
        nodes = keep
    assert rows[-1]["core_size"] == len(nodes)
    assert rows[-1]["core_id_sum"] == sum(nodes)


def test_export_manifest_composition_consistency(spark):
    from poc_juma_etl_spark.operators.components import q_dedup_pipeline_keep
    from poc_juma_etl_spark.operators.sampling import budget_select
    from poc_juma_etl_spark.plans.extra9 import (
        EXPORT_BUDGET,
        EXPORT_SHARDS,
        q_corpus_export_manifest,
    )

    rows = q_corpus_export_manifest(spark, SF_SMOKE).collect()
    assert 1 <= len(rows) <= EXPORT_SHARDS
    total_tokens = sum(r["shard_tokens"] for r in rows)
    assert total_tokens <= EXPORT_BUDGET
    assert max(r["max_cum_tokens"] for r in rows) <= EXPORT_BUDGET
    # the manifest must cover EXACTLY the budget_select of the keep set —
    # recompute the selection through the same public operators
    keep = q_dedup_pipeline_keep(spark, SF_SMOKE)
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").collect()
    import re

    ntok = {r["doc_id"]: len(re.split(r"\s+", r["text"].strip())) for r in docs}
    kept = sorted(
        ((r["kept_quality"], r["kept_doc_id"]) for r in keep.collect()),
        key=lambda t: (-t[0], t[1]),
    )
    # budget_select keeps the ordered prefix with inclusive cum <= budget
    # (cum is monotone, so the first overflow ends the prefix for good)
    cum, prefix = 0, []
    for q, did in kept:
        cum += ntok[did]
        if cum <= EXPORT_BUDGET:
            prefix.append(did)
    assert sum(r["n_docs"] for r in rows) == len(prefix)
    assert sum(r["id_checksum"] for r in rows) == sum(prefix)


def test_wap_publish_audit_and_totals(spark):
    from poc_juma_etl_spark.plans.extra9 import etl_wap_publish_e2e

    rows = etl_wap_publish_e2e(spark, SF_SMOKE).collect()
    ev = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("event_type", "event_id")
        .collect()
    )
    assert all(r["audit_pass"] and r["published"] for r in rows)
    from collections import defaultdict

    n, ck = defaultdict(int), defaultdict(int)
    for r in ev:
        n[r["event_type"]] += 1
        ck[r["event_type"]] += r["event_id"]
    assert {r["event_type"]: r["n_events"] for r in rows} == dict(n)
    assert {r["event_type"]: r["id_checksum"] for r in rows} == dict(ck)


def test_seasonality_profile_indices(spark):
    from poc_juma_etl_spark.plans.extra9 import q_event_seasonality_profile

    rows = q_event_seasonality_profile(spark, SF_SMOKE).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(r)
    for t, rs in by_type.items():
        total = rs[0]["type_total"]
        assert sum(r["n"] for r in rs) == total
        assert all(0 <= r["hour"] <= 23 for r in rs)
        for r in rs:
            assert r["index_x100"] == (r["n"] * 24 * 100) // total
        # indices average ~100 by construction (integer division undershoots)
        assert sum(r["index_x100"] for r in rs) / len(rs) <= 100 * 24 / len(rs) * 1.05


def test_rest_stream_reader_offset_contract():
    from poc_juma_etl_spark.sources.rest_stream import (
        STREAM_PAGE_SIZE,
        RestStreamReader,
    )

    r = RestStreamReader({"path": f"{SF_SMOKE}/events.parquet"})
    n = r.transport.n_pages()
    off = r.initialOffset()
    assert off == {"page": 0}
    seen = 0
    while True:
        rows, nxt = r.read(off)
        rows = list(rows)
        if nxt == off:
            assert rows == []  # exhausted source reports no progress
            break
        assert nxt["page"] > off["page"]
        # replay contract: readBetweenOffsets returns the SAME rows
        assert list(r.readBetweenOffsets(off, nxt)) == rows
        seen += len(rows)
        off = nxt
    assert off["page"] == n
    import pyarrow.parquet as pq

    assert seen == pq.read_metadata(f"{SF_SMOKE}/events.parquet").num_rows
