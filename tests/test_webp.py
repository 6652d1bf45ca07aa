"""WebP lossless / VP8L codec (operators/webp.py — late round 14, the
format that retires the PIL gate's loudest remaining entry). Pins:
roundtrip properties over every encoder mode (literal / cache / LZ77 /
subtract-green / all 14 predictor modes / color transform / palette
bundling classes / meta-prefix groups), wire-level anchors for the
spec's literal tables (the 120-entry neighbor map and the
code-length-code order — encoder/decoder symmetry alone cannot catch
a mis-transcribed table), hand-built streams for the simple-code and
RLE code-length paths the fixed-table encoder never emits, and the
fail-loud contract."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from datafusion_loki_spark.operators.webp import (
    _BitWriter,
    _canon_codes,
    _CLC_ORDER,
    _DIST_MAP,
    _fixed_lengths,
    decode_webp,
    encode_webp_lossless,
)


def _rgba(arr):
    if arr.shape[2] == 4:
        return arr
    return np.concatenate(
        [arr, np.full((*arr.shape[:2], 1), 255, np.uint8)], axis=2
    )


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 20),
    h=st.integers(1, 20),
    alpha=st.booleans(),
    cache=st.integers(0, 8),
    lz77=st.booleans(),
    subg=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_roundtrip_property(w, h, alpha, cache, lz77, subg, seed):
    rng = np.random.RandomState(seed)
    arr = rng.randint(0, 256, (h, w, 4 if alpha else 3)).astype(np.uint8)
    gw, gh, out = decode_webp(
        encode_webp_lossless(
            arr, cache_bits=cache, lz77=lz77, subtract_green=subg
        )
    )
    assert (gw, gh) == (w, h)
    assert (out == _rgba(arr)).all()


@pytest.mark.parametrize("mode", range(14))
def test_predictor_modes_roundtrip(mode):
    rng = np.random.RandomState(mode)
    arr = rng.randint(0, 256, (9, 11, 4)).astype(np.uint8)
    _, _, out = decode_webp(
        encode_webp_lossless(arr, predictor_mode=mode)
    )
    assert (out == arr).all()


def test_color_transform_and_combinations():
    rng = np.random.RandomState(7)
    arr = rng.randint(0, 256, (10, 7, 4)).astype(np.uint8)
    for elems in ((-35, 60, -100), (127, -128, 1), (0, 0, 0)):
        _, _, out = decode_webp(
            encode_webp_lossless(arr, color_elems=elems)
        )
        assert (out == arr).all(), elems
    _, _, out = decode_webp(
        encode_webp_lossless(
            arr, predictor_mode=12, color_elems=(20, -9, 5),
            subtract_green=True, cache_bits=4, lz77=True,
        )
    )
    assert (out == arr).all()


@settings(max_examples=30, deadline=None)
@given(
    n=st.sampled_from([1, 2, 3, 4, 5, 16, 17, 200, 256]),
    w=st.integers(1, 17),
    h=st.integers(1, 9),
    meta=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_palette_bundling_property(n, w, h, meta, seed):
    rng = np.random.RandomState(seed)
    pal = rng.randint(0, 256, (n, 4)).astype(np.uint8)
    idx = rng.randint(0, n, (h, w)).astype(np.uint8)
    gw, gh, out = decode_webp(
        encode_webp_lossless(idx, palette=pal, meta_bits=2 if meta else 0)
    )
    assert (gw, gh) == (w, h)
    assert (out == pal[idx]).all()


def test_meta_prefix_groups_are_not_interchangeable():
    # the encoder's two meta groups use REVERSED length tables; a
    # decoder ignoring the meta image would misparse — this pins that
    # the groups genuinely differ (a checkerboard image round-trips
    # only if group selection is correct per block)
    rng = np.random.RandomState(3)
    arr = rng.randint(0, 256, (13, 18, 4)).astype(np.uint8)
    _, _, out = decode_webp(encode_webp_lossless(arr, meta_bits=2))
    assert (out == arr).all()


def test_distance_map_wire_anchor():
    # the first 8 and a late entry of the spec's 120-entry neighbor
    # map, anchored literally (RFC 9649 §4.2.2) — symmetry cannot
    # catch a transposed table
    assert _DIST_MAP[:8] == (
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    )
    assert _DIST_MAP[119] == (8, 7)
    assert _DIST_MAP[96] == (8, 0)
    assert len(_DIST_MAP) == 120
    # every entry maps to a strictly positive distance for w >= 9
    for dx, dy in _DIST_MAP:
        assert dy * 9 + dx >= 1


def test_clc_order_wire_anchor():
    assert _CLC_ORDER == (
        17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15
    )


def test_fixed_length_tables_are_complete():
    for alphabet in (40, 256, 280, 280 + 64, 296):
        lens = _fixed_lengths(alphabet)
        assert len(lens) == alphabet
        assert abs(sum(2.0 ** -l for l in lens) - 1.0) < 1e-12


def _wrap(bits_writer) -> bytes:
    body = b"\x2f" + bits_writer.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _simple_code(bw, symbols, first_8bit=True):
    """Emit a simple prefix code (1 or 2 symbols)."""
    bw.put(1, 1)
    bw.put(len(symbols) - 1, 1)
    if first_8bit:
        bw.put(1, 1)
        bw.put(symbols[0], 8)
    else:
        bw.put(0, 1)
        bw.put(symbols[0], 1)
    if len(symbols) == 2:
        bw.put(symbols[1], 8)


def test_hand_built_simple_codes_stream():
    # a 2x1 image of two known pixels built entirely from simple
    # codes — the path the fixed-table encoder never emits. Green code
    # has 2 symbols (10, 200); r/b/a are single-symbol (zero bits).
    bw = _BitWriter()
    bw.put(1, 14)  # w-1 -> 2
    bw.put(0, 14)  # h-1 -> 1
    bw.put(0, 1)  # alpha hint
    bw.put(0, 3)  # version
    bw.put(0, 1)  # no transforms
    bw.put(0, 1)  # no cache
    bw.put(0, 1)  # no meta
    _simple_code(bw, [10, 200])  # green
    _simple_code(bw, [30])       # red
    _simple_code(bw, [40])       # blue
    _simple_code(bw, [255])      # alpha
    _simple_code(bw, [0], first_8bit=False)  # distance (unused)
    # pixels: green=10 (code 0), green=200 (code 1); r/b/a free
    bw.put(0, 1)
    bw.put(1, 1)
    w, h, out = decode_webp(_wrap(bw))
    assert (w, h) == (2, 1)
    assert out[0, 0].tolist() == [30, 10, 40, 255]
    assert out[0, 1].tolist() == [30, 200, 40, 255]


def test_hand_built_rle_code_lengths_and_max_symbol():
    # a 4x1 image whose GREEN code transmits lengths via op 16 (repeat
    # previous), 17 (short zero run), and the max_symbol short-circuit;
    # exercises every branch of _read_code_lengths the encoder skips.
    bw = _BitWriter()
    bw.put(3, 14)   # w = 4
    bw.put(0, 14)   # h = 1
    bw.put(0, 1)
    bw.put(0, 3)
    bw.put(0, 1)    # no transforms
    bw.put(0, 1)    # no cache
    bw.put(0, 1)    # no meta
    # GREEN code, normal form. Goal lengths: symbols 0..3 -> 2 bits
    # each (complete over a 4-leaf depth-2 tree... 4 * 2^-2 = 1 OK),
    # everything else 0. Transmit as: lit 2, op16 (repeat prev len
    # 3 + read2(0) = 3 times) -> 4 symbols of length 2, then stop via
    # max_symbol = 4.
    # clc: used symbols {2, 16}: lengths 1 and 1.
    # positions in _CLC_ORDER: 2 -> idx 5, 16 -> idx 8 => num = 9
    bw.put(0, 1)        # not simple
    bw.put(9 - 4, 4)    # num_code_lengths = 9
    for i in range(9):
        sym = _CLC_ORDER[i]
        bw.put(1 if sym in (2, 16) else 0, 3)
    # canonical over {2, 16}: both length 1 -> 2 gets code 0, 16 code 1
    # max_symbol caps the number of code-length SYMBOL READS (the
    # spec's loop decrements per read, not per covered slot): we read
    # exactly 2 (one literal + one op 16)
    bw.put(1, 1)        # use max_symbol
    bw.put(0, 3)        # length_nbits = 2
    bw.put(0, 2)        # max_symbol = 2 + 0 = 2 reads
    bw.put_code(0, 1)   # lit length 2 (for symbol 0)
    bw.put_code(1, 1)   # op 16: repeat prev
    bw.put(0, 2)        # 3 + 0 = 3 repeats -> symbols 1..3 get len 2
    # RED: normal form exercising op 17 (zero run) + literal lengths:
    # lengths: symbol 0 -> 1, symbols 1..10 zero via op17 (3+read3),
    # symbol 11 -> 1. used clc symbols {1, 17}: 1 bit each.
    # positions: 17 -> idx 0, 1 -> idx 3 => num = 4
    bw.put(0, 1)
    bw.put(0, 4)        # num = 4
    for i in range(4):
        sym = _CLC_ORDER[i]
        bw.put(1 if sym in (1, 17) else 0, 3)
    # canonical over {1, 17}: symbol 1 -> code 0, symbol 17 -> code 1
    bw.put(0, 1)        # no max_symbol
    bw.put_code(0, 1)   # symbol 0: length 1
    bw.put_code(1, 1)   # op 17
    bw.put(7, 3)        # 3 + 7 = 10 zeros -> symbols 1..10
    bw.put_code(0, 1)   # symbol 11: length 1
    # remaining 244 symbols default 0: emit op 18 twice (11+127, 11+95)
    # -> clc must cover 18 too... instead use op 17 loops: each covers
    # <= 10; simpler: the spec stops reading at alphabet end only via
    # ops — pad with op 17 runs: ceil(244/10) reads. Keep it short:
    # use max_symbol instead. Rebuild: set max_symbol = 12.
    # (the stream above already omitted max_symbol; compensate by
    # emitting op-17 runs to fill exactly)
    remaining = 256 - 12
    while remaining > 0:
        take = min(remaining, 10)
        bw.put_code(1, 1)
        bw.put(take - 3, 3)
        remaining -= take
    _simple_code(bw, [40])   # blue
    _simple_code(bw, [255])  # alpha
    _simple_code(bw, [0], first_8bit=False)  # distance
    # 4 pixels: green symbols 0..3 (codes 00,01,10,11 at len 2); red
    # alternates its two 1-bit symbols (0 -> sym 0, 1 -> sym 11)
    for g, r in ((0, 0), (1, 1), (2, 0), (3, 1)):
        bw.put_code(g, 2)
        bw.put_code(r, 1)
    w, h, out = decode_webp(_wrap(bw))
    assert (w, h) == (4, 1)
    assert out[:, :, 1].reshape(-1).tolist() == [0, 1, 2, 3]
    assert out[:, :, 0].reshape(-1).tolist() == [0, 11, 0, 11]


def test_fail_loud_contract():
    arr = np.zeros((3, 3, 3), dtype=np.uint8)
    good = encode_webp_lossless(arr)
    with pytest.raises(ValueError, match="RIFF"):
        decode_webp(b"not a webp")
    with pytest.raises(ValueError, match="WEBP"):
        decode_webp(b"RIFF\x04\x00\x00\x00AVI ")
    # lossy VP8 and extended VP8X are loud, never a fake fallback
    for ck in (b"VP8 ", b"VP8X"):
        bad = bytearray(good)
        bad[12:16] = ck
        with pytest.raises(ValueError, match="VP8"):
            decode_webp(bytes(bad))
    # RIFF size mismatch
    with pytest.raises(ValueError, match="size"):
        decode_webp(good[:-1])
    # signature byte
    bad = bytearray(good)
    bad[20] = 0x2E
    with pytest.raises(ValueError, match="signature"):
        decode_webp(bytes(bad))
    # version bits
    bw = _BitWriter()
    bw.put(0, 14)
    bw.put(0, 14)
    bw.put(0, 1)
    bw.put(5, 3)  # version 5
    with pytest.raises(ValueError, match="version"):
        decode_webp(_wrap(bw))
    # truncated bitstream
    with pytest.raises(ValueError, match="truncated"):
        decode_webp(_trunc(good))


def _trunc(good: bytes) -> bytes:
    # drop the last 4 payload bytes and fix both sizes
    b = bytearray(good[:-4])
    struct.pack_into("<I", b, 4, len(b) - 8)
    (cksize,) = struct.unpack_from("<I", b, 16)
    struct.pack_into("<I", b, 16, cksize - 4)
    return bytes(b)


def test_backreference_before_start_is_loud():
    # a back-reference reaching before the image start, as the FIRST
    # symbol. Simple codes cap symbols at 8 bits, so the length-code
    # symbol 258 needs the normal form: green lengths {7: 1, 258: 1}
    # (complete), transmitted with RLE ops 17/18 for the zero spans —
    # which also exercises op 18's long-run branch with exact fills.
    bw = _BitWriter()
    bw.put(3, 14)
    bw.put(0, 14)
    bw.put(0, 1)
    bw.put(0, 3)
    bw.put(0, 1)  # no transforms
    bw.put(0, 1)  # no cache
    bw.put(0, 1)  # no meta
    # green, normal form; used clc symbols {1, 17, 18} -> lengths
    # {18: 1, 1: 2, 17: 2} (complete). positions in _CLC_ORDER:
    # 17 -> 0, 18 -> 1, 1 -> 3 => num = 4
    bw.put(0, 1)
    bw.put(0, 4)  # num = 4
    for i in range(4):
        sym = _CLC_ORDER[i]
        bw.put({17: 2, 18: 1, 1: 2}.get(sym, 0), 3)
    # canonical: 18 -> code 0 (len 1); len 2: symbol 1 -> 10, 17 -> 11
    bw.put(0, 1)  # no max_symbol
    bw.put_code(3, 2)  # op 17: zeros for symbols 0..6
    bw.put(4, 3)       # 3 + 4 = 7
    bw.put_code(2, 2)  # symbol 7: length 1
    bw.put_code(0, 1)  # op 18
    bw.put(127, 7)     # 11 + 127 = 138 zeros (symbols 8..145)
    bw.put_code(0, 1)  # op 18
    bw.put(101, 7)     # 11 + 101 = 112 zeros (146..257)
    bw.put_code(2, 2)  # symbol 258: length 1
    bw.put_code(0, 1)  # op 18
    bw.put(10, 7)      # 11 + 10 = 21 zeros (259..279)
    _simple_code(bw, [30])
    _simple_code(bw, [40])
    _simple_code(bw, [255])
    _simple_code(bw, [1], first_8bit=False)  # distance sym 1 -> dist 1
    bw.put_code(1, 1)  # green symbol 258: copy length 3, nothing decoded
    with pytest.raises(ValueError, match="before image start"):
        decode_webp(_wrap(bw))


def test_decode_image_dispatch_and_admission_sniff():
    from datafusion_loki_spark.operators.multimodal import decode_image

    rng = np.random.RandomState(5)
    arr = rng.randint(0, 256, (4, 6, 3)).astype(np.uint8)
    out = decode_image(encode_webp_lossless(arr, lz77=True))
    assert out.shape == (4, 6, 4)
    assert (out[:, :, :3] == arr).all()
    assert (out[:, :, 3] == 255).all()


def test_meta_index_masks_alpha_byte():
    # RFC 9649 §5.2.1: group index is (red << 8) | green, 16 bits. An
    # entropy-image pixel carrying nonzero ALPHA (legal for a foreign
    # writer; our encoder always emits alpha=0) must not widen the
    # index (round-15 ADVICE regression pin).
    from datafusion_loki_spark.operators.webp import _meta_index

    px = np.array(
        [
            0xFF_03_02_55,  # alpha=0xFF, r=3, g=2 -> (3<<8)|2 = 770
            0x00_00_01_00,  # r=0, g=1 -> 1
            0x80_FF_FF_00,  # alpha=0x80, r=g=0xFF -> 0xFFFF
        ],
        dtype=np.uint32,
    )
    idx = _meta_index(px)
    assert idx.dtype == np.int64
    assert idx.tolist() == [770, 1, 0xFFFF]


# --- animated WebP (VP8X/ANIM/ANMF, round 15) --------------------------

def _anim_rgba(rng, h, w, alpha=255):
    px = rng.randint(0, 256, (h, w, 4)).astype(np.uint8)
    if alpha is not None:
        px[:, :, 3] = alpha
    return px


def test_webp_anim_compositing_protocol():
    from datafusion_loki_spark.operators.webp import (
        decode_webp,
        decode_webp_frames,
        encode_webp_anim,
    )

    rng = np.random.RandomState(21)
    f0 = _anim_rgba(rng, 4, 4)
    f1 = _anim_rgba(rng, 2, 2)
    f2 = _anim_rgba(rng, 2, 2)
    blob = encode_webp_anim(
        [
            {"px": f0, "duration": 40},
            {"px": f1, "pos": (2, 2), "dispose": 1, "duration": 50},
            {"px": f2, "duration": 60},
        ],
        bg=(5, 7, 9, 255),
        loop=3,
    )
    cw, ch, canvases, durs = decode_webp_frames(blob)
    assert (cw, ch, durs) == (4, 4, [40, 50, 60])
    assert (canvases[0] == f0).all()
    exp1 = f0.copy()
    exp1[2:4, 2:4] = f1
    assert (canvases[1] == exp1).all()
    exp2 = exp1.copy()
    exp2[2:4, 2:4] = np.array([5, 7, 9, 255], np.uint8)  # disposal
    exp2[0:2, 0:2] = f2
    assert (canvases[2] == exp2).all()
    # decode_webp on an animation returns the first composited canvas
    w, h, arr = decode_webp(blob)
    assert (w, h) == (4, 4) and (arr == canvases[0]).all()


def test_webp_anim_alpha_blending_integer_formula():
    from datafusion_loki_spark.operators.webp import (
        decode_webp_frames,
        encode_webp_anim,
    )

    rng = np.random.RandomState(23)
    base = _anim_rgba(rng, 2, 2)              # opaque
    top = _anim_rgba(rng, 2, 2, alpha=None)   # random alpha
    blob = encode_webp_anim(
        [{"px": base}, {"px": top, "blend": True}]
    )
    _, _, canvases, _ = decode_webp_frames(blob)
    s, d = top.astype(np.int64), base.astype(np.int64)
    sa, da = s[:, :, 3], d[:, :, 3]
    a255 = sa * 255 + da * (255 - sa)
    n = (
        s[:, :, :3] * (sa * 255)[..., None]
        + d[:, :, :3] * (da * (255 - sa))[..., None]
    )
    exp = np.dstack([n // a255[..., None], (a255 // 255)[..., None]])
    assert (canvases[1].astype(np.int64) == exp).all()
    # blending onto the transparent initial canvas keeps src values
    blob = encode_webp_anim([{"px": top, "blend": True}])
    _, _, canvases, _ = decode_webp_frames(blob)
    nz = top[:, :, 3] > 0
    assert (canvases[0][nz] == top[nz]).all()


def test_webp_anim_vp8x_still_and_metadata_skip():
    from datafusion_loki_spark.operators.webp import (
        decode_webp,
        encode_webp_lossless,
    )

    rng = np.random.RandomState(25)
    px = _anim_rgba(rng, 3, 5)
    inner = encode_webp_lossless(px)[12:]
    vp8x = (
        bytes([0x10, 0, 0, 0])
        + (4).to_bytes(3, "little")
        + (2).to_bytes(3, "little")
    )
    meta = b"EXIF" + struct.pack("<I", 3) + b"abc\x00"  # odd size + pad
    body = b"VP8X" + struct.pack("<I", 10) + vp8x + meta + inner
    blob = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body
    w, h, arr = decode_webp(blob)
    assert (w, h) == (5, 3) and (arr == px).all()


def test_webp_anim_fail_loud_contract():
    from datafusion_loki_spark.operators.webp import (
        decode_webp_frames,
        encode_webp_anim,
    )

    rng = np.random.RandomState(27)
    f0 = _anim_rgba(rng, 4, 4)
    with pytest.raises(ValueError, match="even"):
        encode_webp_anim([{"px": f0, "pos": (1, 0)}])
    with pytest.raises(ValueError, match="escapes"):
        encode_webp_anim([{"px": f0}], canvas=(2, 2))
    blob = encode_webp_anim(
        [{"px": f0}, {"px": _anim_rgba(rng, 2, 2), "pos": (2, 2)}]
    )
    # truncated tail
    with pytest.raises(ValueError):
        decode_webp_frames(blob[:-6] + blob[-2:])
    # frame escaping the canvas: patch the second ANMF's width-1 field
    i = blob.rindex(b"ANMF")
    bad = bytearray(blob)
    bad[i + 8 + 6] = 7  # width-1 = 7 -> 8 wide at x=2 on a 4-canvas
    with pytest.raises(ValueError, match="escapes|disagrees"):
        decode_webp_frames(bytes(bad))
    # ANMF before ANIM: excise the ANIM chunk
    j = blob.index(b"ANIM")
    k = blob.index(b"ANMF")
    bad = blob[:j] + blob[k:]
    bad = (
        b"RIFF"
        + struct.pack("<I", len(bad) - 8)
        + bad[8:]
    )
    with pytest.raises(ValueError, match="before the ANIM"):
        decode_webp_frames(bad)
    # non-animated flag
    nb = bytearray(blob)
    p = nb.index(b"VP8X") + 8
    nb[p] &= ~0x02
    with pytest.raises(ValueError, match="animation flag"):
        decode_webp_frames(bytes(nb))


def test_webp_anim_canvas_bomb_rejected_before_allocation():
    # offline-fuzz round-15 catch: a mutated VP8X header demanded a
    # 4 TiB canvas and died in np.zeros — the area guard must fire
    # BEFORE allocation
    from datafusion_loki_spark.operators.webp import (
        decode_webp_frames,
        encode_webp_anim,
    )

    rng = np.random.RandomState(29)
    blob = bytearray(
        encode_webp_anim([{"px": _anim_rgba(rng, 4, 4)}])
    )
    p = blob.index(b"VP8X") + 8 + 4  # canvas width-1 field
    blob[p : p + 6] = (0xFFFFFF).to_bytes(3, "little") * 2
    with pytest.raises(ValueError, match="exceeds the supported area"):
        decode_webp_frames(bytes(blob))
