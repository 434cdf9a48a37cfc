"""HTTP client unit tests — mocked transport, no network.

Covers the Lectern dictionary parse (sanitize + internal-id append +
hardcoded file schema, DictionaryClient.scala:55-78), id-server batch
POST, Keycloak token + resource_set flow, and the retry policy the
reference lacks.
"""

from __future__ import annotations

import json

import pytest

from cqdg_etl_spark.pipeline.http_clients import (
    HttpDictionary,
    HttpIdServer,
    HttpKeycloak,
    RetryingHttp,
)


class FakeTransport:
    """Scripted transport: pops (status, body) responses in order and
    records every request."""

    def __init__(self, responses):
        self.responses = list(responses)
        self.requests = []

    def request(self, method, url, headers, body, timeout):
        self.requests.append((method, url, headers, body))
        resp = self.responses.pop(0)
        if isinstance(resp, Exception):
            raise resp
        return resp


def _http(transport):
    return RetryingHttp(transport=transport, sleep=lambda s: None)


VERSIONS_BODY = json.dumps([{"version": "5.58"}])
SCHEMAS_BODY = json.dumps(
    [
        {
            "schemas": [
                {
                    "name": "Follow-Up",
                    "fields": [{"name": "study_id"}, {"name": "days_to_follow_up"}],
                },
                {
                    "name": "donor",
                    "fields": [{"name": "study_id"}, {"name": "gender"}],
                },
            ]
        }
    ]
)


def test_dictionary_parses_versions_and_schemas():
    t = FakeTransport([(200, VERSIONS_BODY), (200, SCHEMAS_BODY)])
    d = HttpDictionary(
        "http://lectern:3000", "CQDG dict", "user", "pw", http=_http(t)
    )
    schemas = d.load_schemas()
    assert set(schemas) == {"5.58"}
    by_name = {s.name: s for s in schemas["5.58"]}
    # entity name sanitized, internal id column appended
    assert "followup" in by_name
    assert by_name["followup"].columns[-1] == "internal_followup_id"
    assert by_name["donor"].columns == (
        "study_id", "gender", "internal_donor_id",
    )
    # the hardcoded client-side file schema is always present
    assert "file" in by_name
    assert "variant_class" in by_name["file"].columns
    # requests: name-encoded listing then per-version fetch, basic auth
    (m1, u1, h1, _), (m2, u2, _, _) = t.requests
    assert m1 == m2 == "GET"
    assert "dictionaries?name=CQDG%20dict" in u1
    assert u2.endswith("&version=5.58")
    assert h1["Authorization"].startswith("Basic ")


def test_dictionary_raises_on_error_status():
    t = FakeTransport([(404, "not found")])
    d = HttpDictionary("http://lectern:3000", "nope", http=_http(t))
    with pytest.raises(RuntimeError, match="versions"):
        d.load_schemas()


def test_id_server_posts_batch_payload():
    mapping = json.dumps({"abc123": "donor_1"})
    t = FakeTransport([(200, mapping)])
    s = HttpIdServer("http://id-server:5000", "u", "p", http=_http(t))
    out = s.get_cqdg_ids(json.dumps({"abc123": "donor"}))
    assert json.loads(out) == {"abc123": "donor_1"}
    method, url, headers, body = t.requests[0]
    assert method == "POST" and url.endswith("/batch")
    assert json.loads(body.decode()) == {"abc123": "donor"}


def test_retry_then_success_on_5xx():
    t = FakeTransport([(503, "busy"), (503, "busy"), (200, "[]")])
    http = _http(t)
    status, body = http.request("GET", "http://x/dictionaries")
    assert status == 200 and body == "[]"
    assert len(t.requests) == 3


def test_retries_exhausted_returns_last_5xx():
    t = FakeTransport([(500, "err")] * 4)
    http = _http(t)
    status, _ = http.request("GET", "http://x/y")
    assert status == 500
    assert len(t.requests) == 4  # initial + 3 retries


def test_retry_on_connection_error_then_raise():
    t = FakeTransport([ConnectionError("boom")] * 4)
    http = _http(t)
    with pytest.raises(RuntimeError, match="failed after retries"):
        http.request("GET", "http://x/y")


def test_keycloak_token_and_resource_set():
    token_body = json.dumps({"access_token": "tok123"})
    t = FakeTransport([(200, token_body), (201, "{}"), (409, "exists")])
    kc = HttpKeycloak(
        "http://keycloak:8080", "CQDG", "cqdg-client", "s3cret", http=_http(t)
    )
    assert kc.is_enabled()
    n = kc.create_resources({"file_1", "file_2"})
    assert n == 2  # 409 already-exists counts as success (idempotent re-run)
    (tm, tu, th, tb), (rm, ru, rh, rb) = t.requests[0], t.requests[1]
    assert tu.endswith("/realms/CQDG/protocol/openid-connect/token")
    assert b"grant_type=client_credentials" in tb
    assert ru.endswith("/realms/CQDG/authz/protection/resource_set")
    assert rh["Authorization"] == "Bearer tok123"
    assert json.loads(rb.decode())["type"] == "file"


def test_http_id_resolver_broadcast_joins_mapping(spark):
    """HttpIdResolver: distinct hashes → chunked batch POSTs → mapping
    broadcast back onto the frame (the Spark-shaped
    PreProcessUtils.scala:93-100)."""
    from cqdg_etl_spark.pipeline.http_clients import HttpIdResolver

    class FakeServer:
        def __init__(self):
            self.payloads = []

        def get_cqdg_ids(self, payload):
            self.payloads.append(json.loads(payload))
            return json.dumps(
                {h: f"donor_{h[-1]}" for h in self.payloads[-1]}
            )

    server = FakeServer()
    df = spark.createDataFrame(
        [("h1", "a"), ("h2", "b"), ("h1", "c")], ["cqdg_hash", "payload"]
    )
    out = HttpIdResolver(server, chunk_size=1).resolve(df, "donor")
    rows = {(r.cqdg_hash, r.internal_id) for r in out.collect()}
    assert rows == {("h1", "donor_1"), ("h2", "donor_2")}
    assert out.count() == 3
    # chunk_size=1 → one POST per distinct hash, each tagged with entity
    assert len(server.payloads) == 2
    assert all(set(p.values()) == {"donor"} for p in server.payloads)


def test_keycloak_raises_on_resource_failure():
    token_body = json.dumps({"access_token": "tok123"})
    t = FakeTransport([(200, token_body), (403, "denied")])
    kc = HttpKeycloak("http://kc:8080", "R", "c", "s", http=_http(t))
    with pytest.raises(RuntimeError, match="resource_set"):
        kc.create_resources({"file_1"})


def test_keycloak_registration_fans_out_concurrently():
    """Parity with the reference's Future.traverse fan-out
    (processes/processes.scala:12-16): resource POSTs run on a bounded
    pool. A 2-party barrier inside the transport only releases when two
    POSTs are in flight simultaneously — a sequential client deadlocks
    (and trips the barrier timeout) here."""
    import threading

    token_body = json.dumps({"access_token": "tok123"})
    barrier = threading.Barrier(2, timeout=10)

    class BarrierTransport:
        def __init__(self):
            self.requests = []
            self.lock = threading.Lock()

        def request(self, method, url, headers, body, timeout):
            with self.lock:
                self.requests.append((method, url, headers, body))
            if url.endswith("/resource_set"):
                barrier.wait()  # needs a concurrent partner to pass
                return (201, "{}")
            return (200, token_body)

    t = BarrierTransport()
    kc = HttpKeycloak(
        "http://kc:8080", "R", "c", "s", http=_http(t), max_workers=2
    )
    assert kc.create_resources({"file_1", "file_2"}) == 2
    assert len(t.requests) == 3  # 1 token + 2 parallel resource POSTs
