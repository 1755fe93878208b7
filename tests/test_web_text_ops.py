"""URL canonicalization + PII scrub semantics (oracle gate covers full
cross-engine parity; these pin the per-row rules on handcrafted inputs)."""

from pyspark.sql import functions as F

from poc_juma_etl_spark import all_queries
from poc_juma_etl_spark.operators.web import _canonical

from .conftest import SF_SMOKE

QUERIES = all_queries()


def test_url_canonicalization_rules(spark):
    cases = [
        ("HTTPS://WWW.A.Example.com/item/3/?utm_source=feed", "a.example.com/item/3"),
        ("http://a.example.com/item/3/", "a.example.com/item/3"),
        ("http://a.example.com/item/3", "a.example.com/item/3"),
        ("https://www.B.com/", "b.com"),
        ("http://wwwx.com/p", "wwwx.com/p"),  # strip 'www.' only as a prefix label
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "u string")
    got = [r[0] for r in df.select(_canonical(F.col("u"))).collect()]
    assert got == [want for _, want in cases]


def test_pii_scrub_counts_and_redaction(spark):
    out = {r.doc_id: r for r in QUERIES["q_text_pii_scrub"].fn(spark, SF_SMOKE).collect()}
    # doc 0: %3==0 → 2 emails, %2==0 → 1 phone, %5==0 → 1 IP
    assert (out[0].n_emails, out[0].n_phones, out[0].n_ips) == (2, 1, 1)
    assert "<EMAIL>" in out[0].scrubbed and "<PHONE>" in out[0].scrubbed
    assert "@" not in out[0].scrubbed and "555-" not in out[0].scrubbed
    # doc 1: %3==1 → 1 email, odd → no phone, %5!=0 → no IP
    assert (out[1].n_emails, out[1].n_phones, out[1].n_ips) == (1, 0, 0)
    # doc 2: %3==2 → no email; %2==0 → phone
    assert (out[2].n_emails, out[2].n_phones) == (0, 1)
    assert "<IP>" not in out[1].scrubbed


def test_gopher_keep_flag_consistent(spark):
    rows = QUERIES["q_text_gopher_quality"].fn(spark, SF_SMOKE).collect()
    for r in rows:
        expect = int(
            15 <= r.n_tokens <= 500
            and 3.0 <= r.mean_word_len <= 10.0
            and r.frac_alpha_words >= 0.8
            and r.n_stopword_hits >= 2
            and r.type_token_ratio >= 0.2
        )
        assert r.keep == expect, r
