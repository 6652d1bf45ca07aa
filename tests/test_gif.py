"""GIF codec (operators/gif.py — round 12). The registry row proves the
palette-lookup parity cross-engine; these tests pin the LZW machinery
(variable width growth, the KwKwK case, the 4096 dictionary reset),
interlace reordering, transparency, and the loud-failure contract."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from datafusion_loki_spark.operators.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)


def test_lzw_kwkwk_case():
    # the classic code-equals-next_code sequence: ABABAB... with a
    # 2-symbol alphabet forces the decoder's KwKwK branch immediately
    seq = [0, 1] * 50
    enc = _lzw_encode(seq, 2)
    assert list(_lzw_decode(enc, 2, len(seq))) == seq


def test_lzw_width_growth_and_reset():
    # >4096 distinct phrases: the dictionary fills, the encoder emits
    # CLEAR mid-stream, widths snap back — decode must track exactly
    rng = np.random.RandomState(3)
    seq = rng.randint(0, 4, 60_000).tolist()
    enc = _lzw_encode(seq, 2)
    assert list(_lzw_decode(enc, 2, len(seq))) == seq


def test_interlace_reorders_rows():
    # 8 rows: interlace pass order is 0,4,2,6,1,3,5,7 — encode stores
    # rows in that order, decode must put them back
    pal = np.array([[i, i, i] for i in range(8)], dtype=np.uint8)
    ix = np.tile(np.arange(8).reshape(8, 1), (1, 3))
    w, h, out = decode_gif(encode_gif(ix, pal, interlace=True))
    assert (out[:, :, 0] == ix).all()
    # and a non-interlaced twin is identical
    _, _, out2 = decode_gif(encode_gif(ix, pal))
    assert (out == out2).all()


def test_transparent_index_yields_rgba():
    pal = np.arange(12, dtype=np.uint8).reshape(4, 3)
    ix = np.array([[0, 1], [2, 3]])
    w, h, out = decode_gif(encode_gif(ix, pal, transparent=2))
    assert out.shape == (2, 2, 4)
    assert out[1, 0, 3] == 0 and out[0, 0, 3] == 255
    # without a GCE the output stays RGB
    assert decode_gif(encode_gif(ix, pal))[2].shape == (2, 2, 3)


def test_fail_loud_contract():
    pal = np.zeros((4, 3), dtype=np.uint8)
    good = encode_gif(np.array([[1, 2], [3, 0]]), pal)
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTAGIF")
    with pytest.raises(ValueError, match="truncated|trailer|image"):
        decode_gif(good[:20])
    # trailer with no image
    with pytest.raises(ValueError, match="no image"):
        decode_gif(good[:13] + bytes(12) + b"\x3b")
    # writer guards
    with pytest.raises(ValueError, match="power of two"):
        encode_gif(np.array([[0]]), np.zeros((3, 3), dtype=np.uint8))
    with pytest.raises(ValueError, match="out of range"):
        encode_gif(np.array([[7]]), pal)


def test_pixel_index_outside_color_table_fails_loud():
    # hand-shrink the color table after encoding: a 4-entry image
    # re-declared as 2 colors must be rejected, not silently wrapped
    pal4 = np.arange(12, dtype=np.uint8).reshape(4, 3)
    blob = bytearray(encode_gif(np.array([[3, 1]]), pal4))
    # GCT size field lives in the logical-screen packed byte
    blob[10] = (blob[10] & 0xF8) | 0x00  # declare 2 entries
    shrunk = bytes(blob[:13]) + bytes(blob[13 : 13 + 6]) + bytes(
        blob[13 + 12 :]
    )
    with pytest.raises(ValueError, match="color table|out of sequence|truncated"):
        decode_gif(shrunk)


@settings(max_examples=120, deadline=None)
@given(
    w=st.integers(1, 23),
    h=st.integers(1, 17),
    npal_log=st.integers(1, 8),
    interlace=st.booleans(),
    trans=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_gif_roundtrip_property(w, h, npal_log, interlace, trans, seed):
    rng = np.random.RandomState(seed)
    npal = 1 << npal_log
    pal = rng.randint(0, 256, (npal, 3)).astype(np.uint8)
    ix = rng.randint(0, npal, (h, w))
    t = int(rng.randint(0, npal)) if trans else None
    gw, gh, out = decode_gif(
        encode_gif(ix, pal, transparent=t, interlace=interlace)
    )
    assert (gw, gh) == (w, h)
    assert (out[:, :, :3] == pal[ix]).all()
    if t is not None:
        assert out.shape[2] == 4
        assert (out[:, :, 3] == np.where(ix == t, 0, 255)).all()


def test_lzw_trailing_data_and_overshoot_fail_loud():
    # round-12 ADVICE: excess entropy data past the expected pixel
    # count must surface as the decoder's descriptive error, never a
    # downstream numpy reshape failure, and the stream must terminate
    # with an END code at the data boundary
    enc = _lzw_encode([1, 2, 3] * 3, 2)
    with pytest.raises(ValueError, match="continues past"):
        _lzw_decode(enc, 2, 5)  # stream carries 9 pixels
    # a final dictionary entry that overshoots expect is also loud:
    # AAAA... makes the last entry multi-symbol, so asking for a count
    # that lands mid-entry trips the exact-count check
    enc2 = _lzw_encode([1] * 10, 2)
    with pytest.raises(ValueError, match="produced|continues past"):
        _lzw_decode(enc2, 2, 9)
    # and a full decode of both streams still round-trips
    assert list(_lzw_decode(enc, 2, 9)) == [1, 2, 3] * 3
    assert list(_lzw_decode(enc2, 2, 10)) == [1] * 10


def test_gif_with_trailing_entropy_garbage_fails_loud():
    # splice extra LZW data into a valid single-image stream: the
    # decoder must reject it at the LZW layer with its own message
    idx = np.arange(16).reshape(4, 4) % 4
    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]])
    good = encode_gif(idx, pal)
    lzw_good = _lzw_encode(idx.reshape(-1), 2)
    lzw_long = _lzw_encode(list(idx.reshape(-1)) + [1, 2, 3, 0], 2)
    assert good.count(bytes([len(lzw_good)]) + lzw_good) == 1
    bad = good.replace(
        bytes([len(lzw_good)]) + lzw_good,
        bytes([len(lzw_long)]) + lzw_long,
    )
    with pytest.raises(ValueError, match="produced|continues past"):
        decode_gif(bad)


# --- animation (decode_gif_frames, round 13) -----------------------------


def _pal4():
    return np.array(
        [[9, 8, 7], [200, 0, 0], [0, 200, 0], [0, 0, 200]], dtype=np.uint8
    )


def test_animation_disposal_protocol():
    from datafusion_loki_spark.operators.gif import (
        decode_gif_frames,
        encode_gif_frames,
    )

    pal = _pal4()
    rng = np.random.RandomState(7)
    f0 = rng.randint(0, 4, (5, 7))
    f1 = rng.randint(0, 4, (3, 5))
    f2 = rng.randint(0, 4, (4, 4))
    gif = encode_gif_frames(
        [
            {"idx": f0, "interlace": True, "disposal": 1},
            {"idx": f1, "pos": (1, 1), "transparent": 0, "disposal": 3},
            {
                "idx": f2,
                "pos": (2, 0),
                "transparent": 0,
                "local_palette": pal[::-1].copy(),
            },
        ],
        pal,
        loop=True,  # NETSCAPE block must be skipped by framing
    )
    sw, sh, frames = decode_gif_frames(gif)
    assert (sw, sh, len(frames)) == (7, 5, 3)
    c0 = pal[f0]
    assert (frames[0] == c0).all()
    c1 = c0.copy()
    r = c1[1:4, 1:6]
    d = f1 != 0
    r[d] = pal[f1[d]]
    assert (frames[1] == c1).all()
    # disposal 3 on frame 1 restores c0 BEFORE frame 2 draws; frame 2
    # looks up the reversed LOCAL table
    c2 = c0.copy()
    r = c2[0:4, 2:6]
    d = f2 != 0
    r[d] = pal[::-1][f2[d]]
    assert (frames[2] == c2).all()


def test_animation_disposal_background_restores_rect():
    from datafusion_loki_spark.operators.gif import (
        decode_gif_frames,
        encode_gif_frames,
    )

    pal = _pal4()
    f0 = np.full((4, 4), 1)
    f1 = np.full((2, 2), 2)
    gif = encode_gif_frames(
        [
            {"idx": f1, "pos": (1, 1), "disposal": 2},
            {"idx": f0, "pos": (0, 0), "transparent": 3},
        ],
        pal,
        sw=4,
        sh=4,
        bg=0,
    )
    _, _, frames = decode_gif_frames(gif)
    # frame 0 canvas: bg everywhere except the 2x2 rect
    want0 = np.empty((4, 4, 3), np.uint8)
    want0[:, :] = pal[0]
    want0[1:3, 1:3] = pal[2]
    assert (frames[0] == want0).all()
    # disposal 2 restored the rect to BACKGROUND before frame 1; frame 1
    # is fully opaque (no index 3 present) so it covers everything
    assert (frames[1] == pal[1]).all()


def test_animation_gce_scopes_to_one_image():
    from datafusion_loki_spark.operators.gif import (
        decode_gif_frames,
        encode_gif_frames,
    )

    pal = _pal4()
    # frame 0 declares transparency; frame 1 has NO GCE — its index 0
    # pixels must be OPAQUE palette entries, not see-through
    f = np.array([[0, 1], [2, 0]])
    gif = encode_gif_frames(
        [
            {"idx": np.full((2, 2), 1), "transparent": 0, "disposal": 1},
            {"idx": f},
        ],
        pal,
    )
    _, _, frames = decode_gif_frames(gif)
    assert (frames[1] == pal[f]).all()


def test_animation_fail_loud():
    from datafusion_loki_spark.operators.gif import (
        decode_gif_frames,
        encode_gif_frames,
    )

    pal = _pal4()
    with pytest.raises(ValueError, match="escapes"):
        decode_gif_frames(
            encode_gif_frames(
                [
                    {"idx": np.zeros((2, 2), int)},
                    {"idx": np.zeros((2, 2), int), "pos": (1, 1)},
                ],
                pal,
            )
        )
    # truncation loses the trailer
    good = encode_gif_frames([{"idx": np.zeros((2, 2), int)}], pal)
    with pytest.raises(ValueError):
        decode_gif_frames(good[:-1] )
    # single-image face unchanged: first frame only
    from datafusion_loki_spark.operators.gif import decode_gif

    w, h, arr = decode_gif(good)
    assert (w, h) == (2, 2)


@settings(max_examples=60, deadline=None)
@given(
    sw=st.integers(2, 10),
    sh=st.integers(2, 10),
    n_frames=st.integers(1, 4),
    seed=st.integers(0, 2**31 - 1),
)
def test_animation_property_vs_reference_compositor(sw, sh, n_frames, seed):
    # independent reference: composite with plain python loops straight
    # from the frame specs, against the decoder's full wire roundtrip
    # (random rects, disposals 0-3, optional transparency/local
    # palette/interlace per frame)
    from datafusion_loki_spark.operators.gif import (
        decode_gif_frames,
        encode_gif_frames,
    )

    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, (8, 3)).astype(np.uint8)
    specs = []
    for _ in range(n_frames):
        w = int(rng.randint(1, sw + 1))
        h = int(rng.randint(1, sh + 1))
        lx = int(rng.randint(0, sw - w + 1))
        ty = int(rng.randint(0, sh - h + 1))
        spec = {
            "idx": rng.randint(0, 8, (h, w)),
            "pos": (lx, ty),
            "disposal": int(rng.randint(0, 4)),
            "interlace": bool(rng.rand() < 0.3),
        }
        if rng.rand() < 0.5:
            spec["transparent"] = int(rng.randint(0, 8))
        if rng.rand() < 0.3:
            spec["local_palette"] = rng.randint(0, 256, (8, 3)).astype(
                np.uint8
            )
        specs.append(spec)
    gif = encode_gif_frames(specs, pal, sw=sw, sh=sh, bg=3)
    gw, gh, frames = decode_gif_frames(gif)
    assert (gw, gh, len(frames)) == (sw, sh, n_frames)

    canvas = np.empty((sh, sw, 3), np.uint8)
    canvas[:, :] = pal[3]
    for spec, got in zip(specs, frames):
        lx, ty = spec["pos"]
        h, w = spec["idx"].shape
        ct = spec.get("local_palette")
        ct = pal if ct is None else ct
        before = canvas[ty : ty + h, lx : lx + w].copy()
        for y in range(h):
            for x in range(w):
                v = int(spec["idx"][y, x])
                if spec.get("transparent") is not None and v == spec[
                    "transparent"
                ]:
                    continue
                canvas[ty + y, lx + x] = ct[v]
        assert (got == canvas).all()
        d = spec["disposal"]
        if d == 2:
            canvas[ty : ty + h, lx : lx + w] = pal[3]
        elif d == 3:
            canvas[ty : ty + h, lx : lx + w] = before


def test_lzw_min_code_size_9_to_11_rejected_decoder_owned():
    # Round-14 ADVICE: min code sizes 9-11 used to crash the literal
    # table init (bytes([i]) for i in range(clear)) with the opaque
    # numpy/bytes message 'bytes must be in range(0, 256)'. Palette
    # indices are < 256 by construction, so >8 is invalid — the
    # decoder must own the error.
    pal = np.arange(12, dtype=np.uint8).reshape(4, 3)
    idx = np.array([[0, 1], [2, 3]], dtype=np.int64)
    blob = bytearray(encode_gif(idx, pal))
    # header(6) + LSD(7) + GCT(3*4) + image sep(1) + descriptor(9)
    mc_pos = 6 + 7 + 3 * 4 + 1 + 9
    assert blob[mc_pos] == 2  # 4-color palette -> min code 2
    for bad in (0, 1, 9, 10, 11, 12):
        patched = bytearray(blob)
        patched[mc_pos] = bad
        with pytest.raises(ValueError, match="minimum code size"):
            decode_gif(bytes(patched))
    # 8 stays valid territory (table init must not crash); the stream
    # was written at width 3 so decode may fail loud on CONTENT, but
    # never with the raw bytes-range crash
    patched = bytearray(blob)
    patched[mc_pos] = 8
    try:
        decode_gif(bytes(patched))
    except ValueError:
        pass


def test_gif_dimension_bomb_rejected_before_allocation():
    # round 15 (the VP8X canvas lesson applied to the family): a
    # 13-byte header or 9-byte image descriptor can demand a
    # multi-gigabyte canvas/index grid; both must be rejected before
    # any allocation
    import struct as _struct

    hdr = b"GIF89a" + _struct.pack("<HHBBB", 65535, 65535, 0, 0, 0)
    with pytest.raises(ValueError, match="exceeds the supported area"):
        decode_gif(hdr + b"\x3b")
    # screen fine, image descriptor huge
    pal = np.zeros((2, 3), np.uint8)
    good = encode_gif(np.zeros((2, 2), np.int64), pal)
    i = good.index(b"\x2c")
    bad = bytearray(good)
    _struct.pack_into("<HH", bad, i + 5, 65535, 65535)
    with pytest.raises(ValueError, match="exceeds the supported area"):
        decode_gif(bytes(bad))
