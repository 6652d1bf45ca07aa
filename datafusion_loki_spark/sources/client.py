"""Loki HTTP protocol client (pure Python, stdlib urllib — picklable-free:
constructed inside reader/writer methods, never stored on plan objects,
per SURVEY.md §4.3).

Endpoints mirrored from the reference:
- GET  /loki/api/v1/query_range  with Accept: application/vnd.apache.parquet
  (≙ fetch_log_stream, datafusion-loki/src/scan.rs:177-216)
- POST /loki/api/v1/push         JSON streams payload
  (≙ push_to_loki, datafusion-loki/src/insert.rs:142-165,238-247)
- GET  /loki/api/v1/status/buildinfo health check
  (≙ check_connection, datafusion-loki/src/table.rs:60-73)

Beyond the reference: bounded retry with exponential backoff on transient
failures (connect errors, 429, 5xx). At 1000 executors a scan is 1000
concurrent range queries — transient 429/503 from the store is the normal
case, not the exception, and a task-level Spark retry would redo far more
work than one HTTP call. Push retries are safe under Spark's own
execution model: task retries already make the sink at-least-once.
"""

from __future__ import annotations

import json
import time
import urllib.error
import urllib.parse
import urllib.request

PARQUET_ACCEPT = "application/vnd.apache.parquet"
RETRY_STATUSES = (429, 500, 502, 503, 504)
DEFAULT_ATTEMPTS = 3


class LokiClientError(RuntimeError):
    pass


def _do(req, timeout: float, attempts: int = DEFAULT_ATTEMPTS) -> bytes:
    """Issue a request; retry transient failures with 0.5s/1s/... backoff."""
    last: Exception | None = None
    for i in range(attempts):
        try:
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                if not (200 <= resp.status < 300):
                    raise LokiClientError(f"http {resp.status}")
                return resp.read()
        except urllib.error.HTTPError as e:
            last = e
            if e.code not in RETRY_STATUSES:
                raise LokiClientError(f"http {e.code}: {e.read()[:200]!r}") from e
        except OSError as e:  # connect/reset/timeout
            last = e
        if i < attempts - 1:
            time.sleep(0.5 * (2**i))
    raise LokiClientError(f"request failed after {attempts} attempts: {last}")


def check_connection(endpoint: str, timeout: float = 10.0) -> None:
    """≙ table.rs:60-73 — error on non-2xx buildinfo."""
    url = f"{endpoint.rstrip('/')}/loki/api/v1/status/buildinfo"
    try:
        _do(urllib.request.Request(url), timeout)
    except LokiClientError as e:
        raise LokiClientError(f"failed to connect loki at {endpoint}: {e}") from e


def query_range(
    endpoint: str,
    query: str,
    start_ns: int,
    end_ns: int,
    limit: int | None = None,
    timeout: float = 60.0,
) -> bytes:
    """Issue the range query, return the parquet-encoded response body.

    The reference buffers the whole body before decode (scan.rs:195-198);
    response size is bounded by Loki's own limits + the pushed `limit`, so
    we do the same. Idempotent → retried freely.
    """
    # Real Loki defaults direction=backward (a hit limit keeps the NEWEST
    # rows); our scan semantics — and the emulator — keep the oldest. Send
    # it explicitly so a pushed limit returns the same row set everywhere.
    params = {
        "query": query,
        "start": str(start_ns),
        "end": str(end_ns),
        "direction": "forward",
    }
    if limit is not None:
        params["limit"] = str(limit)
    url = (
        f"{endpoint.rstrip('/')}/loki/api/v1/query_range?"
        + urllib.parse.urlencode(params)
    )
    req = urllib.request.Request(url, headers={"Accept": PARQUET_ACCEPT})
    try:
        return _do(req, timeout)
    except LokiClientError as e:
        raise LokiClientError(f"query_range failed against {endpoint}: {e}") from e


def push(endpoint: str, streams: list[dict], timeout: float = 60.0) -> None:
    """POST the push payload: {"streams":[{"stream":{k:v},"values":[[ns,line]]}]}
    (≙ insert.rs:238-247 serialization, insert.rs:142-165 request).

    Retried on transient failure — at-least-once, matching the delivery
    contract Spark's task retries already impose on any sink."""
    url = f"{endpoint.rstrip('/')}/loki/api/v1/push"
    body = json.dumps({"streams": streams}).encode()
    req = urllib.request.Request(
        url, data=body, headers={"Content-Type": "application/json"}, method="POST"
    )
    try:
        _do(req, timeout)
    except LokiClientError as e:
        raise LokiClientError(f"push failed against {endpoint}: {e}") from e
