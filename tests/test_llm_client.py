"""HttpChatClient policy tests — all offline (fake transports + one real
loopback HTTP server), covering: success, retry-on-429/5xx/connection,
Retry-After, non-retryable 4xx, malformed body, retry exhaustion, and
end-to-end wiring through LLMGenerator -> sanitize -> engine."""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from ai_etl_studio_spark.sqlgen.client import (
    HttpChatClient,
    LLMClientError,
    LLMUnavailableError,
)


def _ok_body(text="SELECT 1 AS x"):
    return json.dumps(
        {"choices": [{"message": {"role": "assistant", "content": text}}]}
    ).encode()


def _client(transport, **kw):
    kw.setdefault("sleep", lambda s: None)  # no real waiting in tests
    return HttpChatClient(
        url="http://test.invalid/v1/chat/completions", model="m", transport=transport, **kw
    )


def test_success_extracts_content():
    c = _client(lambda u, b, h, t: (200, _ok_body("SELECT 42 AS a"), {}))
    assert c.complete("sys", "q") == "SELECT 42 AS a"


def test_request_payload_shape():
    seen = {}

    def transport(url, body, headers, timeout):
        seen.update(json.loads(body), _headers=headers)
        return 200, _ok_body(), {}

    c = _client(transport, api_key="sk-test")
    c.complete("SYSTEM", "QUESTION")
    assert seen["messages"] == [
        {"role": "system", "content": "SYSTEM"},
        {"role": "user", "content": "QUESTION"},
    ]
    assert seen["_headers"]["Authorization"] == "Bearer sk-test"


def test_retries_on_retryable_then_succeeds():
    calls = []

    def transport(url, body, headers, timeout):
        calls.append(1)
        if len(calls) < 3:
            return 503, b"overloaded", {}
        return 200, _ok_body(), {}

    assert _client(transport).complete("s", "q") == "SELECT 1 AS x"
    assert len(calls) == 3


def test_retries_on_connection_error():
    calls = []

    def transport(url, body, headers, timeout):
        calls.append(1)
        if len(calls) == 1:
            raise TimeoutError("timed out")
        return 200, _ok_body(), {}

    assert _client(transport).complete("s", "q") == "SELECT 1 AS x"
    assert len(calls) == 2


def test_retry_after_honored():
    sleeps = []
    calls = []

    def transport(url, body, headers, timeout):
        calls.append(1)
        if len(calls) == 1:
            return 429, b"slow down", {"Retry-After": "2.5"}
        return 200, _ok_body(), {}

    c = HttpChatClient(
        url="http://test.invalid", model="m", transport=transport, sleep=sleeps.append
    )
    c.complete("s", "q")
    assert 2.5 in sleeps


def test_retry_after_not_stacked_with_backoff():
    """A retryable response with Retry-After causes exactly ONE sleep
    before the next attempt — max(retry_after, backoff), not their sum."""
    sleeps = []
    calls = []

    def transport(url, body, headers, timeout):
        calls.append(1)
        if len(calls) == 1:
            return 429, b"slow down", {"Retry-After": "2.5"}
        return 200, _ok_body(), {}

    c = HttpChatClient(
        url="http://test.invalid", model="m", transport=transport,
        sleep=sleeps.append, backoff_base_s=0.5,
    )
    c.complete("s", "q")
    assert sleeps == [2.5]  # one sleep, server hint dominates backoff 0.5


def test_retry_after_below_backoff_keeps_backoff():
    """When the server hint is shorter than the exponential backoff, the
    backoff floor still applies (sleep = max of the two)."""
    sleeps = []
    calls = []

    def transport(url, body, headers, timeout):
        calls.append(1)
        if len(calls) == 1:
            return 429, b"", {"Retry-After": "0.1"}
        return 200, _ok_body(), {}

    c = HttpChatClient(
        url="http://test.invalid", model="m", transport=transport,
        sleep=sleeps.append, backoff_base_s=0.5,
    )
    c.complete("s", "q")
    assert sleeps == [0.5]


def test_non_retryable_4xx_raises_immediately():
    calls = []

    def transport(url, body, headers, timeout):
        calls.append(1)
        return 401, b"bad key", {}

    with pytest.raises(LLMClientError, match="401"):
        _client(transport).complete("s", "q")
    assert len(calls) == 1


def test_exhaustion_raises_unavailable():
    c = _client(lambda u, b, h, t: (503, b"down", {}), max_retries=2)
    with pytest.raises(LLMUnavailableError, match="3 attempts"):
        c.complete("s", "q")


def test_malformed_body_raises_client_error():
    c = _client(lambda u, b, h, t: (200, b"{not json", {}))
    with pytest.raises(LLMClientError, match="malformed"):
        c.complete("s", "q")


def test_backoff_is_bounded():
    c = _client(lambda u, b, h, t: (500, b"", {}), backoff_base_s=1.0, backoff_cap_s=4.0)
    delays = [c._backoff(a, None) for a in range(1, 8)]
    assert delays[0] == 1.0 and max(delays) == 4.0


class _Handler(BaseHTTPRequestHandler):
    def do_POST(self):
        n = int(self.headers["Content-Length"])
        json.loads(self.rfile.read(n))  # request must be valid JSON
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.end_headers()
        self.wfile.write(_ok_body("SELECT c_name FROM customer LIMIT 5"))

    def log_message(self, *a):  # quiet
        pass


def test_real_loopback_http_round_trip():
    srv = HTTPServer(("127.0.0.1", 0), _Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        c = HttpChatClient(
            url=f"http://127.0.0.1:{srv.server_port}/v1/chat/completions",
            model="m",
            timeout_s=5.0,
        )
        assert c.complete("sys", "5 customers") == "SELECT c_name FROM customer LIMIT 5"
    finally:
        srv.shutdown()


def test_end_to_end_llm_generator_through_engine(spark):
    """Wire the client into LLMGenerator and run the result through the
    full sanitize -> read-only-gate -> Catalyst pipeline."""
    from ai_etl_studio_spark.catalog import register_tables
    from ai_etl_studio_spark.sqlgen.generator import LLMGenerator, generate_and_run

    register_tables(spark, "/root/testdata/sf0.001")
    raw = "```sql\nSELECT c_mktsegment, COUNT(*) AS n FROM customer GROUP BY c_mktsegment;\n```"
    c = _client(lambda u, b, h, t: (200, _ok_body(raw), {}))
    gen = LLMGenerator(complete=c.complete, schema_desc="(schema)")
    res = generate_and_run(spark, gen, "customers per segment")
    assert res.ok, res.error
    assert res.df.count() == 5
