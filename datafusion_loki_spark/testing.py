"""Test-support decode backends for the SPARK_GRAFT_DECODE_BACKEND hook.

A custom decode backend must be importable BY EACH Spark Python worker
(the env var carries a ``module:function`` dotted path that workers
resolve with importlib — in-process registries don't survive the
process boundary), so the fake backends the backend-invariance tests
route through live in a real package module, not in a test file.

Nothing here runs in production paths: the default backend is "pure"
and these functions exist only so tests can prove (a) the dispatch
really routes through a named backend inside mapInPandas workers and
(b) face output is backend-invariant when the backend decodes
correctly.
"""

from __future__ import annotations

import os


def pure_proxy_backend(payload: bytes):
    """A 'native library' stand-in that decodes correctly (by
    delegating to the pure decoders with an explicit backend override,
    so it cannot recurse) and, when SPARK_GRAFT_TEST_BACKEND_LOG names
    a file, appends one byte per call — the side channel the worker-
    routing test reads to prove the dispatch actually went through
    this function rather than silently decoding pure."""
    log = os.environ.get("SPARK_GRAFT_TEST_BACKEND_LOG")
    if log:
        # single-byte O_APPEND writes are atomic across workers
        with open(log, "ab") as f:
            f.write(b"x")
    from datafusion_loki_spark.operators.multimodal import decode_image

    return decode_image(payload, backend="pure")


def broken_backend(payload: bytes):
    """Decodes nothing — exists to prove a routed backend's errors
    surface loudly instead of being swallowed into a pure fallback."""
    raise RuntimeError("broken_backend was routed to, as configured")
