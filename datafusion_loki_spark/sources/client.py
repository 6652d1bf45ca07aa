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
"""

from __future__ import annotations

import json
import urllib.parse
import urllib.request

PARQUET_ACCEPT = "application/vnd.apache.parquet"


class LokiClientError(RuntimeError):
    pass


def check_connection(endpoint: str, timeout: float = 10.0) -> None:
    """≙ table.rs:60-73 — error on non-2xx buildinfo."""
    url = f"{endpoint.rstrip('/')}/loki/api/v1/status/buildinfo"
    try:
        with urllib.request.urlopen(url, timeout=timeout) as resp:
            if not (200 <= resp.status < 300):
                raise LokiClientError(
                    f"failed to connect loki: {resp.status} {resp.read()[:200]!r}"
                )
    except OSError as e:
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
    we do the same.
    """
    params = {"query": query, "start": str(start_ns), "end": str(end_ns)}
    if limit is not None:
        params["limit"] = str(limit)
    url = (
        f"{endpoint.rstrip('/')}/loki/api/v1/query_range?"
        + urllib.parse.urlencode(params)
    )
    req = urllib.request.Request(url, headers={"Accept": PARQUET_ACCEPT})
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            if not (200 <= resp.status < 300):
                raise LokiClientError(f"query_range failed: {resp.status}")
            return resp.read()
    except OSError as e:
        raise LokiClientError(f"query_range failed against {endpoint}: {e}") from e


def push(endpoint: str, streams: list[dict], timeout: float = 60.0) -> None:
    """POST the push payload: {"streams":[{"stream":{k:v},"values":[[ns,line]]}]}
    (≙ insert.rs:238-247 serialization, insert.rs:142-165 request)."""
    url = f"{endpoint.rstrip('/')}/loki/api/v1/push"
    body = json.dumps({"streams": streams}).encode()
    req = urllib.request.Request(
        url, data=body, headers={"Content-Type": "application/json"}, method="POST"
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            if not (200 <= resp.status < 300):
                raise LokiClientError(f"push failed: {resp.status}")
    except OSError as e:
        raise LokiClientError(f"push failed against {endpoint}: {e}") from e
