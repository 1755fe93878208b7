"""Connector (S1/S2/S3) and Structured Streaming coverage."""

import time

from poc_juma_etl_spark.sources import rest_api

from .conftest import SF_SMOKE


def test_token_cache_ttl(monkeypatch):
    rest_api._token_cache.clear()
    t1 = rest_api.get_auth_token("r1")
    t2 = rest_api.get_auth_token("r1")
    assert t1 == t2  # cached within TTL (reference TOKEN_CACHE utils.py:24-28)
    # expire the cache
    tok, born = rest_api._token_cache["r1"]
    rest_api._token_cache["r1"] = (tok, born - rest_api.TOKEN_TTL_SECONDS - 1)
    assert rest_api.get_auth_token("r1") != t1


def test_fixture_transport_pagination_and_filter():
    tr = rest_api.FixtureTransport(
        f"{SF_SMOKE}/events.parquet",
        page_size=100,
        filter_field="ts",
        filter_start="2024-01-01",
        filter_end="2024-01-05",
    )
    n = tr.n_pages()
    total = sum(tr.fetch_page(p).num_rows for p in range(n))
    assert total == tr._table().num_rows  # pages partition the filtered rows
    assert tr.fetch_page(0).num_rows == 100


class _FakeResponse:
    def __init__(self, body):
        self._body = body

    def raise_for_status(self):
        pass

    def json(self):
        return self._body


class _FakeSession:
    """Duck-typed requests.Session serving 3 pages of 2 rows; records the
    payloads so the BETWEEN clause and auth header can be asserted."""

    def __init__(self):
        self.calls = []
        self.rows = [{"event_id": i, "v": float(i)} for i in range(6)]

    def post(self, url, json=None, headers=None, timeout=None):
        self.calls.append((url, json, headers))
        page, size = json["pagina"], json["tamanho_pagina"]
        return _FakeResponse(
            {
                "registros": self.rows[page * size : (page + 1) * size],
                "total_paginas": 3,
            }
        )


def test_http_transport_protocol():
    sess = _FakeSession()
    tr = rest_api.HttpTransport(
        "https://api.example.test/records",
        page_size=2,
        filter_field="ts",
        filter_start="2024-01-01",
        filter_end="2024-01-31",
        session=sess,
    )
    assert tr.n_pages() == 3
    total = sum(tr.fetch_page(p).num_rows for p in range(3))
    assert total == 6
    url, payload, headers = sess.calls[-1]
    assert payload["clausulas"][0]["operador"] == "BETWEEN"  # S2 server-side
    assert headers["Authorization"].startswith("Bearer ")  # S3 token
    assert tr.fetch_page(1).to_pylist()[0]["event_id"] == 2


def test_rest_source_distributed_scan(spark):
    assert rest_api.register_source(spark)
    df = (
        spark.read.format("paginated_rest")
        .option("path", f"{SF_SMOKE}/events.parquet")
        .option("page_size", "100")
        .load()
    )
    direct = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    assert df.count() == direct.count()
    # one Spark partition per page → the page loop is distributed
    assert df.rdd.getNumPartitions() == (direct.count() + 99) // 100


def test_streaming_converges_to_batch(spark):
    from poc_juma_etl_spark.plans.events import q_event_tumbling_hour
    from poc_juma_etl_spark.streaming.events import streaming_tumbling_hour

    stream_out = streaming_tumbling_hour(spark, SF_SMOKE)
    batch_out = q_event_tumbling_hour(spark, SF_SMOKE)
    s = {tuple(r) for r in stream_out.collect()}
    b = {tuple(r) for r in batch_out.collect()}
    assert s == b
