"""Baseline TIFF codec (operators/tiff.py — round 13, the format that
leaves the PIL-gated list). The registry row (mm_decode_tiff) proves
the big-endian multi-strip PackBits path cross-engine; these tests pin
the IFD walk, both byte orders, strip assembly, WhiteIsZero inversion,
PackBits edges, and the loud-failure contract."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from datafusion_loki_spark.operators.tiff import (
    _packbits_decode,
    _packbits_encode,
    decode_tiff,
    encode_tiff,
)


@settings(max_examples=80, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    rgb=st.booleans(),
    be=st.booleans(),
    pb=st.booleans(),
    rps=st.integers(1, 30),
    seed=st.integers(0, 2**31 - 1),
)
def test_roundtrip_property(w, h, rgb, be, pb, rps, seed):
    rng = np.random.RandomState(seed)
    arr = rng.randint(0, 256, (h, w, 3) if rgb else (h, w)).astype(np.uint8)
    gw, gh, out = decode_tiff(
        encode_tiff(arr, big_endian=be, rows_per_strip=rps, packbits=pb)
    )
    want = arr if rgb else arr[:, :, None]
    assert (gw, gh) == (w, h) and (out == want).all()


def test_packbits_edges():
    # long repeat (chunked at 128), literal chunking at 128, -128 noop
    raw = bytes([7] * 300) + bytes(range(200)) + bytes([1, 1])
    enc = _packbits_encode(raw)
    assert _packbits_decode(enc, len(raw)) == raw
    assert _packbits_decode(bytes([128]) + enc, len(raw)) == raw
    with pytest.raises(ValueError, match="expected"):
        _packbits_decode(enc, len(raw) - 1)  # overshoot is loud
    with pytest.raises(ValueError, match="expected"):
        _packbits_decode(enc, len(raw) + 1)  # shortfall is loud
    with pytest.raises(ValueError, match="truncated"):
        _packbits_decode(bytes([5, 1, 2]), 6)  # literal run cut short


def test_white_is_zero_inverts():
    # flip the photometric tag of a grayscale file to 0 (WhiteIsZero):
    # the decoder must invert per spec
    g = np.arange(20, dtype=np.uint8).reshape(4, 5) * 9
    tif = encode_tiff(g)  # photometric 1 (BlackIsZero), little-endian
    # tag entries are sorted by id; photometric=262 type=3 count=1;
    # find its 12-byte entry and flip the value
    i = tif.index(struct.pack("<HHI", 262, 3, 1))
    bad = bytearray(tif)
    assert bad[i + 8] == 1
    bad[i + 8] = 0
    _, _, out = decode_tiff(bytes(bad))
    assert (out[:, :, 0] == 255 - g).all()


def test_big_endian_wire_is_really_big_endian():
    # the same pixels in both byte orders must decode identically, and
    # the MM header must carry big-endian tag fields on the wire
    rng = np.random.RandomState(2)
    px = rng.randint(0, 256, (3, 4, 3)).astype(np.uint8)
    le = decode_tiff(encode_tiff(px, big_endian=False))[2]
    be_bytes = encode_tiff(px, big_endian=True)
    assert be_bytes[:4] == b"MM\x00\x2a"
    assert struct.unpack(">H", be_bytes[8:10])[0] > 0  # IFD tag count BE
    be = decode_tiff(be_bytes)[2]
    assert (le == be).all() and (le == px).all()


def test_fail_loud_contract():
    g = np.full((4, 4), 9, dtype=np.uint8)
    good = encode_tiff(g)
    with pytest.raises(ValueError, match="signature"):
        decode_tiff(b"not a tiff")
    # truncation: cut the strip data
    with pytest.raises(ValueError, match="truncated|expected"):
        decode_tiff(good[:-3])
    # unsupported compression (LZW = 5)
    i = good.index(struct.pack("<HHI", 259, 3, 1))
    bad = bytearray(good)
    bad[i + 8] = 5
    with pytest.raises(ValueError, match="compression"):
        decode_tiff(bytes(bad))
    # unsupported photometric (palette = 3)
    i = good.index(struct.pack("<HHI", 262, 3, 1))
    bad = bytearray(good)
    bad[i + 8] = 3
    with pytest.raises(ValueError, match="photometric"):
        decode_tiff(bytes(bad))
    # non-8-bit depth
    i = good.index(struct.pack("<HHI", 258, 3, 1))
    bad = bytearray(good)
    bad[i + 8] = 16
    with pytest.raises(ValueError, match="depth"):
        decode_tiff(bytes(bad))
    # planar configuration 2
    rgb = encode_tiff(np.zeros((2, 2, 3), dtype=np.uint8))
    out = bytearray(rgb)
    # no planar tag is written (defaults to 1); craft one by flipping
    # SamplesPerPixel's tag id is too invasive — instead verify the
    # strip bookkeeping check: claim 2 strips where 1 exists
    i = rgb.index(struct.pack("<HHI", 278, 4, 1))  # RowsPerStrip
    bad = bytearray(rgb)
    struct.pack_into("<I", bad, i + 8, 1)  # 1 row/strip -> needs 2 strips
    with pytest.raises(ValueError, match="strip bookkeeping"):
        decode_tiff(bytes(bad))


def test_decode_image_dispatches_tiff():
    from datafusion_loki_spark.operators.multimodal import decode_image

    px = np.arange(36, dtype=np.uint8).reshape(3, 4, 3)
    for be in (False, True):
        out = decode_image(encode_tiff(px, big_endian=be, packbits=True))
        assert (out == px).all()


def test_multipage_chain_roundtrip_and_first_page_face():
    # mixed RGB/gray pages through the next-IFD chain; decode_tiff
    # stays first-page-only
    from datafusion_loki_spark.operators.tiff import (
        decode_tiff_pages,
        encode_tiff_pages,
    )

    rng = np.random.RandomState(6)
    arrs = [
        rng.randint(0, 256, (5, 7, 3)).astype(np.uint8),
        rng.randint(0, 256, (3, 5)).astype(np.uint8),
        rng.randint(0, 256, (2, 2, 3)).astype(np.uint8),
    ]
    blob = encode_tiff_pages(
        arrs, big_endian=True, rows_per_strip=2, packbits=True
    )
    pages = decode_tiff_pages(blob)
    assert len(pages) == 3
    for a, (w, h, out) in zip(arrs, pages):
        want = a[:, :, None] if a.ndim == 2 else a
        assert (out == want).all()
    w0, h0, first = decode_tiff(blob)
    assert (first == arrs[0]).all()


def test_multipage_cycle_and_truncation_fail_loud():
    from datafusion_loki_spark.operators.tiff import (
        decode_tiff_pages,
        encode_tiff_pages,
    )

    arrs = [np.zeros((2, 2), np.uint8), np.ones((2, 2), np.uint8)]
    blob = bytearray(encode_tiff_pages(arrs))
    # point the SECOND page's next-IFD pointer back at the first IFD
    # (offset 8): a chain cycle must be loud, not an infinite loop.
    # The second IFD starts where the first page's pointer says; find
    # it by decoding the pointer position: first IFD has 9 entries.
    first_ptr_pos = 8 + 2 + 12 * 9
    (second_ifd,) = struct.unpack("<I", blob[first_ptr_pos : first_ptr_pos + 4])
    second_ptr_pos = second_ifd + 2 + 12 * 9
    struct.pack_into("<I", blob, second_ptr_pos, 8)
    with pytest.raises(ValueError, match="cycle"):
        decode_tiff_pages(bytes(blob))
    # truncating the chain mid-second-page is loud
    good = encode_tiff_pages(arrs)
    with pytest.raises(ValueError):
        decode_tiff_pages(good[:-3])


def test_multipage_ifds_word_aligned_with_odd_packbits_strips():
    # Round-14 ADVICE: TIFF 6.0 requires even IFD/value offsets. An
    # odd-length PackBits strip must not leave the NEXT page's IFD at
    # an odd offset — the writer pads between strips (StripByteCounts
    # keeps the real lengths, so decode is unaffected).
    from datafusion_loki_spark.operators.tiff import (
        decode_tiff_pages,
        encode_tiff_pages,
    )

    rng = np.random.RandomState(14)
    # incompressible noise rows -> PackBits literal runs with odd
    # lengths for odd widths
    arrs = [
        rng.randint(0, 256, (3, 5)).astype(np.uint8),
        rng.randint(0, 256, (3, 7, 3)).astype(np.uint8),
        rng.randint(0, 256, (2, 3)).astype(np.uint8),
    ]
    for be in (False, True):
        e = ">" if be else "<"
        blob = encode_tiff_pages(
            arrs, big_endian=be, rows_per_strip=1, packbits=True
        )
        # walk the IFD chain and assert every IFD offset and every
        # overflow value offset is even
        (ifd_off,) = struct.unpack(e + "I", blob[4:8])
        seen = 0
        while ifd_off:
            assert ifd_off % 2 == 0, f"odd IFD offset {ifd_off} (be={be})"
            (n,) = struct.unpack(e + "H", blob[ifd_off : ifd_off + 2])
            for i in range(n):
                ent = ifd_off + 2 + 12 * i
                tag, ttype, cnt = struct.unpack(
                    e + "HHI", blob[ent : ent + 8]
                )
                size = {1: 1, 3: 2, 4: 4}[ttype] * cnt
                if size > 4:
                    (voff,) = struct.unpack(e + "I", blob[ent + 8 : ent + 12])
                    assert voff % 2 == 0, f"odd value offset tag {tag}"
            ptr = ifd_off + 2 + 12 * n
            (ifd_off,) = struct.unpack(e + "I", blob[ptr : ptr + 4])
            seen += 1
        assert seen == 3
        # and the roundtrip still holds bit-exact
        for a, (w, h, out) in zip(arrs, decode_tiff_pages(blob)):
            want = a[:, :, None] if a.ndim == 2 else a
            assert (out == want).all()
