"""HTTP client retry behavior against a flaky server."""

from __future__ import annotations

import http.server
import threading

import pytest

from datafusion_loki_spark.sources import client


class _Flaky(http.server.BaseHTTPRequestHandler):
    fail_remaining = 0
    fail_status = 503
    hits = 0

    def _respond(self):
        cls = type(self)
        cls.hits += 1
        if cls.fail_remaining > 0:
            cls.fail_remaining -= 1
            self.send_response(cls.fail_status)
            self.end_headers()
            self.wfile.write(b"flaky")
            return
        self.send_response(200)
        self.end_headers()
        self.wfile.write(b"ok-body")

    do_GET = _respond
    do_POST = _respond

    def log_message(self, *a):
        pass


@pytest.fixture()
def flaky_server():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Flaky)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    _Flaky.hits = 0
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_retries_transient_5xx_then_succeeds(flaky_server):
    _Flaky.fail_remaining = 2
    body = client.query_range(flaky_server, '{app="x"}', 0, 1)
    assert body == b"ok-body"
    assert _Flaky.hits == 3


def test_gives_up_after_attempts(flaky_server):
    _Flaky.fail_remaining = 10
    with pytest.raises(client.LokiClientError):
        client.query_range(flaky_server, '{app="x"}', 0, 1)
    assert _Flaky.hits == client.DEFAULT_ATTEMPTS


def test_non_retryable_4xx_fails_fast(flaky_server):
    _Flaky.fail_remaining = 5
    _Flaky.fail_status = 400
    try:
        with pytest.raises(client.LokiClientError):
            client.push(flaky_server, [{"stream": {}, "values": []}])
        assert _Flaky.hits == 1
    finally:
        _Flaky.fail_status = 503


def test_push_retries(flaky_server):
    _Flaky.fail_remaining = 1
    client.push(flaky_server, [{"stream": {"app": "x"}, "values": [["1", "l"]]}])
    assert _Flaky.hits == 2
