"""Crafted-corpus pins for mm_phash_neardup (round-9 VERDICT #1): the
fixtures carry no byte-level re-encodes, so these synthesize payloads
with KNOWN perceptual relationships — a localized-corruption near-dup
that must pair, a structurally different payload that must not, the
NULL/short exclusions — and run the exact Spark-vs-DuckDB comparison the
driver harness performs. Plus a pure-python property pinning the numpy
kernel's segment math against a naive reference implementation."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from datafusion_loki_spark.operators.multimodal import (
    MM_PHASH_HAM_MAX,
    MM_PHASH_MIN_BYTES,
    MM_PHASH_SEGMENTS,
    MM_PHASH_VARIANT_OFFSET,
    ORACLE_MM_PHASH,
    mm_phash_neardup,
    phash64,
)


def _naive_phash(payload: bytes) -> tuple[int, int]:
    """Straightforward reference: per-segment integer sums and counts,
    gradient sign via cross-multiply — what the oracle SQL computes."""
    n = len(payload)
    lo = [(k * n) // MM_PHASH_SEGMENTS for k in range(MM_PHASH_SEGMENTS)]
    hi = lo[1:] + [n]
    s = [sum(payload[a:b]) for a, b in zip(lo, hi)]
    c = [b - a for a, b in zip(lo, hi)]
    bits = [
        1 if s[k + 1] * c[k] > s[k] * c[k + 1] else 0
        for k in range(MM_PHASH_SEGMENTS - 1)
    ]
    h1 = sum(bits[k] << k for k in range(32))
    h2 = sum(bits[k + 32] << k for k in range(32))
    return h1, h2


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=MM_PHASH_MIN_BYTES, max_size=400))
def test_phash_kernel_matches_naive_reference(payload):
    assert phash64(payload) == _naive_phash(payload)


def _hamming(a: tuple[int, int], b: tuple[int, int]) -> int:
    return bin(a[0] ^ b[0]).count("1") + bin(a[1] ^ b[1]).count("1")


# ASCII-only payloads (UTF-8 bytes == the characters, so the parquet
# text column's cast-to-binary sees exactly these byte values) with
# byte-level structure: a sawtooth ramp makes gradient signs
# deterministic and corruption effects local
_BASE = "".join(chr(32 + (i * 3) % 90) for i in range(260))
# localized corruption: 8 max-value bytes mid-payload — touches <= 3
# segments -> flips 2 gradient bits (verified below), well inside the
# threshold
_NEAR = _BASE[:130] + "~~~~~~~~" + _BASE[138:]
# reversed ramp: opposite gradient signs nearly everywhere
_FAR = _BASE[::-1]


def test_fingerprint_distances_are_as_designed():
    b = phash64(_BASE.encode())
    near = phash64(_NEAR.encode())
    far = phash64(_FAR.encode())
    assert 0 < _hamming(b, near) <= MM_PHASH_HAM_MAX
    assert _hamming(b, far) > MM_PHASH_HAM_MAX


@pytest.fixture(scope="module")
def crafted(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("phash")
    rows = [
        # ids 1-3 avoid the %10 planting so their relationships are pure
        (1, _BASE, "en", "web", len(_BASE)),
        (2, _NEAR, "en", "web", len(_NEAR)),   # must pair with 1
        (3, _FAR, "en", "web", len(_FAR)),     # must pair with nobody
        (4, None, "en", "web", 0),             # NULL text: excluded
        (5, "tiny", "en", "web", 4),           # < 65 bytes: excluded
        # id 10 draws a planted recrawl variant (id 10 + the 1e12
        # offset, first two bytes replaced) — the registered query's
        # own fixture
        (10, _BASE[: len(_BASE) // 2] + _FAR[: len(_FAR) // 2], "en",
         "web", len(_BASE)),
    ]
    df = spark.createDataFrame(
        rows,
        "doc_id: long, text: string, lang: string, source: string,"
        " n_chars: long",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
    # embeddings for the keep-list's semantic side (round 10):
    # axis-orthogonal seeds -> no semantic pairs, statuses unchanged;
    # ids 10 / 10+1e12 have no embedding, so the left join leaves their
    # semantic verdict NULL (outside the semantic universe)
    erows = []
    for s in range(8):
        v = [0.0] * 8
        v[s] = 10.0
        erows.append((s, v, "seed"))
    spark.createDataFrame(
        erows, "vec_id: long, embedding: array<float>, label: string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{tmp}/embeddings.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{tmp}/documents.parquet/*.parquet')"
    )
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM read_parquet("
        f"'{tmp}/embeddings.parquet/*.parquet')"
    )
    return str(tmp), con


def test_phash_pairs_planted_and_near_only(spark, crafted):
    sf, _con = crafted
    out = {
        (r.doc_a, r.doc_b): r.hamming
        for r in mm_phash_neardup(spark, sf).collect()
    }
    assert (1, 2) in out and out[(1, 2)] <= MM_PHASH_HAM_MAX
    assert (10, 10 + MM_PHASH_VARIANT_OFFSET) in out
    assert out[(10, 10 + MM_PHASH_VARIANT_OFFSET)] <= 2  # segment-0 only
    # the structurally different payload pairs with nobody, and the
    # NULL/short docs never reach the kernel
    docs_in_pairs = {d for pair in out for d in pair}
    assert 3 not in docs_in_pairs
    assert not docs_in_pairs & {4, 5}


def test_phash_matches_oracle_on_crafted_corpus(spark, crafted):
    from tests.parity import compare

    sf, con = crafted
    ok, detail = compare(mm_phash_neardup(spark, sf), ORACLE_MM_PHASH, con)
    assert ok, detail


def test_keep_list_composes_exact_and_perceptual(spark, crafted):
    # dedup_keep_list's composition over binary payloads: the perceptual
    # pair (1,2) makes 2 a near_dup (CC min-label 1 keeps); the planted
    # variant of 10 is near_dup; the pair representatives keep;
    # sub-65-byte and NULL docs get no row (the fingerprintable-universe
    # contract). Round 13: the decode admission gate now feeds the
    # keep-list — doc 3 sits in the gate's universe (>= 120 bytes) and
    # draws its planted corruption (doc_id % 3 == 0), so it lands as
    # 'undecodable' at TOP precedence instead of 'keep'.
    from datafusion_loki_spark.operators.multimodal import (
        MM_PHASH_VARIANT_OFFSET,
        ORACLE_MM_KEEP_LIST,
        mm_dedup_keep_list,
    )
    from tests.parity import compare

    sf, con = crafted
    out = {r.doc_id: r.status for r in mm_dedup_keep_list(spark, sf).collect()}
    assert out[1] == "keep"
    assert out[2] == "near_dup"
    assert out[3] == "undecodable"
    assert out[10] == "keep"
    assert out[10 + MM_PHASH_VARIANT_OFFSET] == "near_dup"
    assert 4 not in out and 5 not in out  # NULL / short: no row
    ok, detail = compare(mm_dedup_keep_list(spark, sf), ORACLE_MM_KEEP_LIST, con)
    assert ok, detail


@settings(max_examples=300, deadline=None)
@given(
    st.integers(0, (1 << 32) - 1),
    st.integers(0, (1 << 32) - 1),
    st.sets(st.integers(0, 63), max_size=MM_PHASH_HAM_MAX),
)
def test_banding_is_pigeonhole_exact_at_threshold(h1, h2, flips):
    # The operator's recall claim: any pair within the verify threshold
    # (hamming <= bands-1 = 7) shares at least one exact 8-bit band, so
    # banded candidate generation loses NOTHING at the threshold. This
    # pins the band derivation used on BOTH sides (LSB-first packing,
    # shift/mask off the two 32-bit halves).
    def bands(a1, a2):
        full = (a2 << 32) | a1
        return [(full >> (8 * k)) & 255 for k in range(8)]

    g1, g2 = h1, h2
    for b in flips:
        if b < 32:
            g1 ^= 1 << b
        else:
            g2 ^= 1 << (b - 32)
    ham = bin(h1 ^ g1).count("1") + bin(h2 ^ g2).count("1")
    assert ham <= MM_PHASH_HAM_MAX
    shared = [
        k for k, (x, y) in enumerate(zip(bands(h1, h2), bands(g1, g2)))
        if x == y
    ]
    assert shared, (h1, h2, flips)
