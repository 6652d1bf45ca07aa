"""Property tests for the sketch primitives whose guarantees the
operators' correctness rests on (no Spark session needed)."""

from __future__ import annotations

from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from datafusion_loki_spark.plans.logs import mg_merge


@settings(max_examples=300, deadline=None)
@given(
    stream=st.lists(st.integers(0, 25), max_size=400),
    chunk_sizes=st.lists(st.integers(1, 37), min_size=1, max_size=20),
    n_parts=st.integers(1, 5),
    cap=st.integers(1, 10),
)
def test_mg_union_is_heavy_hitter_superset(stream, chunk_sizes, n_parts, cap):
    # Split the stream into arbitrary batches, deal batches round-robin to
    # partitions, run mg_merge per partition, union the survivors: every
    # key with true count > n/(cap+1) MUST be a candidate — the superset
    # guarantee that makes log_heavy_hitters' output exact regardless of
    # partitioning. (Agarwal et al., PODS 2012, mergeable summaries.)
    chunks = []
    i = 0
    ci = 0
    while i < len(stream):
        size = chunk_sizes[ci % len(chunk_sizes)]
        chunks.append(stream[i : i + size])
        i += size
        ci += 1
    partitions: list[dict] = [{} for _ in range(n_parts)]
    for j, chunk in enumerate(chunks):
        p = j % n_parts
        partitions[p] = mg_merge(partitions[p], Counter(chunk), cap)
    candidates = set().union(*partitions) if partitions else set()
    n = len(stream)
    true_counts = Counter(stream)
    for k, c in true_counts.items():
        if c * (cap + 1) > n:
            assert k in candidates, (k, c, n, cap)


@settings(max_examples=100, deadline=None)
@given(
    stream=st.lists(st.integers(0, 25), max_size=200),
    cap=st.integers(1, 10),
)
def test_mg_summary_size_is_bounded(stream, cap):
    counters: dict = {}
    for i in range(0, len(stream), 16):
        counters = mg_merge(counters, Counter(stream[i : i + 16]), cap)
        # after a shrink only entries STRICTLY above the (cap+1)-th largest
        # survive — at most cap of them — so the bound is unconditional
        assert len(counters) <= cap


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=200))
def test_chunk_int64_reinterpretation_bijective_with_hex_chunks(payload):
    """mm_chunk_dedup's Spark side buckets on np.frombuffer('<i8') of
    each aligned 8-byte chunk while the DuckDB oracle buckets on the
    16-hex-char substring of hex(payload); the driver compare only
    works because the two keys are BIJECTIVE over the same chunk
    sequence — same chunk count, same per-position identity structure,
    same distinct-set size."""
    import numpy as np

    from datafusion_loki_spark.operators.multimodal import MM_CHUNK_BYTES

    n = len(payload) // MM_CHUNK_BYTES
    ints = np.frombuffer(payload[: n * MM_CHUNK_BYTES], dtype="<i8")
    h = payload.hex()
    hexes = [
        h[i * 2 * MM_CHUNK_BYTES : (i + 1) * 2 * MM_CHUNK_BYTES]
        for i in range(n)
    ]
    assert len(ints) == len(hexes) == n
    # identical equality structure position-by-position...
    for a in range(n):
        for b in range(a + 1, n):
            assert (ints[a] == ints[b]) == (hexes[a] == hexes[b])
    # ...hence identical distinct sets (the bucket keys)
    assert len(set(ints.tolist())) == len(set(hexes))
