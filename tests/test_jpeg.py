"""Baseline JPEG codec (operators/jpeg.py — round 12, the decode
family's last compressed-format gap). The registry row proves the
DC-only integer-exact path cross-engine; these tests pin the GENERAL
machinery on crafted inputs: Huffman/zigzag/dequant plumbing against an
independent O(n^4) IDCT reference, quantization-bounded round trips,
4:2:0 subsampling, restart markers, and the loud-failure contract."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import example, given, settings, strategies as st

from datafusion_loki_spark.operators.jpeg import (
    _ZZ_FLAT,
    decode_jpeg,
    encode_jpeg,
)


def _ref_idct(coef):
    """Direct O(n^4) IDCT per T.81 A.3.3 — written independently of the
    decoder's matrix form, so a basis/orientation bug cannot cancel."""
    out = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * coef[u, v]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            out[x, y] = s / 4.0
    return out


def test_dc_only_blocks_decode_exactly():
    # quant DC step 8: a constant block of value v codes to v-128 and
    # decodes to exactly v — the integer-exact construction the
    # registry oracle replays
    v = np.arange(40, dtype=np.uint8).reshape(5, 8) * 6
    img = np.repeat(np.repeat(v, 8, axis=0), 8, axis=1)
    w, h, out = decode_jpeg(encode_jpeg(img))
    assert (w, h) == (64, 40)
    assert (out[:, :, 0] == img).all()


def test_known_coefficients_match_reference_idct():
    # hand-plant quantized coefficients through the REAL bitstream
    # (encode writes them verbatim at quant=1 on an image built from
    # the reference IDCT), then compare decode vs the O(n^4) reference
    rng = np.random.RandomState(5)
    coef = np.zeros((8, 8))
    coef[0, 0] = 80.0
    coef[1, 2] = -33.0
    coef[3, 1] = 17.0
    coef[7, 7] = 9.0
    ref = np.clip(np.round(_ref_idct(coef) + 128.0), 0, 255)
    # encode the reference image losslessly enough (quant=1) and check
    # the decoder reproduces it within rounding of the two pipelines.
    # <= 1 here is an EMPIRICAL pin for these FIXED inputs (deterministic
    # seeds — the assert can never flake); the provable any-content bound
    # is <= 3 (derivation at test_gray_quant1_roundtrip_bound).
    w, h, out = decode_jpeg(
        encode_jpeg(ref.astype(np.uint8), quant=np.ones(64))
    )
    assert np.abs(out[:, :, 0].astype(int) - ref.astype(int)).max() <= 1
    # also check several random smooth blocks (same fixed-seed caveat)
    for _ in range(5):
        c2 = np.zeros((8, 8))
        c2[:3, :3] = rng.randint(-50, 50, (3, 3))
        img = np.clip(np.round(_ref_idct(c2) + 128.0), 0, 255)
        _, _, out = decode_jpeg(
            encode_jpeg(img.astype(np.uint8), quant=np.ones(64))
        )
        assert np.abs(out[:, :, 0].astype(int) - img.astype(int)).max() <= 1


def test_zigzag_is_the_standard_order():
    # spot-pin the canonical sequence (first/last stretch) — generated
    # order must equal the spec's table, not merely be self-consistent
    want_head = [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4]
    assert list(_ZZ_FLAT[:15]) == want_head
    assert list(_ZZ_FLAT[-3:]) == [47, 55, 62, 63][1:]


def test_color_roundtrip_bounds():
    rng = np.random.RandomState(9)
    img = rng.randint(0, 256, (16, 13, 3), dtype=np.uint8)
    _, _, out = decode_jpeg(encode_jpeg(img, quant=np.ones(64)))
    assert out.shape == (16, 13, 3)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 3


def test_subsampled_chroma_upsamples_and_crops():
    # gray content (chroma exactly 128 everywhere) survives 4:2:0
    # untouched; odd dims force MCU padding + crop on both axes
    rng = np.random.RandomState(2)
    g = rng.randint(0, 256, (19, 21), dtype=np.uint8)
    img = np.stack([g, g, g], axis=-1)
    w, h, out = decode_jpeg(
        encode_jpeg(img, quant=np.ones(64), subsample=True)
    )
    assert (w, h) == (21, 19)
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


def test_422_sampling_roundtrip_and_progressive_parity():
    # 4:2:2 (luma (2,1)): chroma halves horizontally only — gray
    # content survives within color-space rounding, and the
    # progressive script stays bit-identical to baseline on the
    # asymmetric grid (non-interleaved AC bands differ per axis)
    rng = np.random.RandomState(14)
    g = rng.randint(0, 256, (19, 21), dtype=np.uint8)
    img = np.stack([g, g, g], axis=-1)
    _, _, out = decode_jpeg(
        encode_jpeg(img, quant=np.ones(64), subsample="422")
    )
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2
    c = rng.randint(0, 256, (17, 23, 3)).astype(np.uint8)
    b = decode_jpeg(encode_jpeg(c, subsample="422"))[2]
    p = decode_jpeg(encode_jpeg(c, subsample="422", progressive=True))[2]
    assert (b == p).all()
    with pytest.raises(ValueError, match="subsample mode"):
        encode_jpeg(c, subsample="411")


def test_restart_markers_do_not_change_pixels():
    rng = np.random.RandomState(4)
    g = rng.randint(0, 256, (24, 40), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(g, quant=np.ones(64)))[2]
    for dri in (1, 2, 5):
        withr = decode_jpeg(
            encode_jpeg(g, quant=np.ones(64), restart_interval=dri)
        )[2]
        assert (withr == base).all(), dri


def test_fail_loud_contract():
    g = np.full((8, 8), 50, dtype=np.uint8)
    good = encode_jpeg(g)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")
    # lossless SOF3 stays unsupported (progressive SOF2 decodes since
    # round 12 — a baseline-shaped scan under it fails the progressive
    # band validation instead)
    i = good.index(b"\xff\xc0")
    with pytest.raises(ValueError, match="supported"):
        decode_jpeg(good[:i] + b"\xff\xc3" + good[i + 2 :])
    with pytest.raises(ValueError, match="Se=0"):
        decode_jpeg(good[:i] + b"\xff\xc2" + good[i + 2 :])
    # 16-bit DQT: flip Pq in the DQT segment header
    j = good.index(b"\xff\xdb")
    bad = bytearray(good)
    bad[j + 4] = 0x10
    with pytest.raises(ValueError, match="16-bit quantization"):
        decode_jpeg(bytes(bad))
    # truncated entropy data: cut before EOI
    with pytest.raises(ValueError, match="truncated|terminating"):
        decode_jpeg(good[:-4])
    # 12-bit precision
    k = good.index(b"\xff\xc0")
    bad = bytearray(good)
    bad[k + 4] = 12
    with pytest.raises(ValueError, match="precision"):
        decode_jpeg(bytes(bad))


# --- progressive (SOF2, round 12) ---------------------------------------


def test_progressive_equals_baseline_bit_for_bit():
    # the invariant that keeps both sides of the successive-
    # approximation protocol honest: the SAME quantized coefficients
    # delivered across DC/AC first + refinement scans must reconstruct
    # the IDENTICAL pixels the single baseline scan produces
    rng = np.random.RandomState(6)
    for shape, kw in [
        ((24, 17), {}),
        ((40, 33), {"quant": np.ones(64)}),
        ((16, 16, 3), {"quant": np.ones(64)}),
        ((19, 21, 3), {"quant": np.ones(64), "subsample": True}),
        ((64, 40), {}),
    ]:
        img = rng.randint(0, 256, shape).astype(np.uint8)
        b = decode_jpeg(encode_jpeg(img, **kw))[2]
        p = decode_jpeg(encode_jpeg(img, progressive=True, **kw))[2]
        assert (b == p).all(), (shape, kw)


def test_progressive_dc_only_stays_integer_exact():
    # the registry construction through the progressive script: the
    # AC scans are pure EOBRUN (all zero), DC arrives as approx+refine,
    # and the decode must still be EXACT (the full-hash oracle's bar)
    v = (np.arange(40, dtype=np.uint8).reshape(5, 8) * 6 + 3)
    img = np.repeat(np.repeat(v, 8, axis=0), 8, axis=1)
    w, h, out = decode_jpeg(encode_jpeg(img, progressive=True))
    assert (w, h) == (64, 40)
    assert (out[:, :, 0] == img).all()


def test_progressive_malformed_scans_fail_loud():
    g = np.full((8, 8), 50, dtype=np.uint8)
    prog = encode_jpeg(g, progressive=True)
    # a baseline-shaped (0..63) scan under SOF2 violates the DC band rule
    base = encode_jpeg(g)
    i = base.index(b"\xff\xc0")
    with pytest.raises(ValueError, match="Se=0"):
        decode_jpeg(base[:i] + b"\xff\xc2" + base[i + 2 :])
    # truncating mid-scans loses the EOI and/or entropy data
    with pytest.raises(ValueError):
        decode_jpeg(prog[:-6])


def test_progressive_restart_intervals_equal_baseline():
    # round 13: the progressive emitters chunk every scan into DRI
    # restart segments (MCUs interleaved, blocks otherwise) — the
    # decoder's progressive-restart path (per-segment predictor/EOBRUN/
    # correction-bit reset) must still reconstruct the baseline pixels
    # exactly, across gray/color/subsampled geometry
    rng = np.random.RandomState(21)
    for shape, kw in [
        ((24, 17), {}),
        ((40, 33), {"quant": np.ones(64)}),
        ((19, 21, 3), {"quant": np.ones(64), "subsample": True}),
    ]:
        img = rng.randint(0, 256, shape).astype(np.uint8)
        b = decode_jpeg(encode_jpeg(img, **kw))[2]
        for dri in (1, 3, 7):
            p = decode_jpeg(
                encode_jpeg(
                    img, progressive=True, restart_interval=dri, **kw
                )
            )[2]
            assert (b == p).all(), (shape, kw, dri)


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(1, 32),
    h=st.integers(1, 32),
    color=st.booleans(),
    sub=st.booleans(),
    q8=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_progressive_equals_baseline_property(w, h, color, sub, q8, seed):
    # random content/geometry sweep: every EOBRUN shape, ZRL-in-
    # refinement, correction-bit ordering, and band-edge case the
    # emitters can produce must decode to the baseline pixels exactly
    rng = np.random.RandomState(seed)
    shape = (h, w, 3) if color else (h, w)
    img = rng.randint(0, 256, shape).astype(np.uint8)
    kw = {"quant": np.ones(64)} if q8 else {}
    if color and sub:
        kw["subsample"] = True
    b = decode_jpeg(encode_jpeg(img, **kw))[2]
    p = decode_jpeg(encode_jpeg(img, progressive=True, **kw))[2]
    assert (b == p).all()


@settings(max_examples=40, deadline=None)
@example(w=10, h=10, seed=16, dri=0)  # round-12 falsifier of the old <=1 claim
@given(
    w=st.integers(1, 40),
    h=st.integers(1, 40),
    seed=st.integers(0, 2**31 - 1),
    dri=st.sampled_from([0, 0, 3]),
)
def test_gray_quant1_roundtrip_bound(w, h, seed, dri):
    # quant=1 does NOT make the pipeline lossless: quantization still
    # rounds each of the 64 float DCT coefficients by up to 0.5, and the
    # IDCT (separable, 2-D gain = 1-D gain squared over the /4 norm)
    # amplifies coefficient L-inf error by at most
    #   S^2 / 4, where S = max_x sum_u c_u |cos((2x+1)u*pi/16)| = 5.2837
    #   (c_0 = 1/sqrt2, c_u = 1 otherwise; the sum is identical for all
    #   eight x by the cosine half-sample symmetry)
    # so the pixel-space error is <= 0.5 * 5.2837^2 / 4 = 3.490, plus 0.5
    # for the final round-to-integer: 3.99 -> integer error <= 3 for ANY
    # content, any geometry (odd sizes exercise MCU padding + crop).
    # <=1 was a round-12 overclaim; hypothesis found error 2 at the
    # pinned @example above.
    rng = np.random.RandomState(seed)
    g = rng.randint(0, 256, (h, w)).astype(np.uint8)
    gw, gh, out = decode_jpeg(
        encode_jpeg(g, quant=np.ones(64), restart_interval=dri)
    )
    assert (gw, gh) == (w, h)
    assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).max() <= 3


@settings(max_examples=20, deadline=None)
@given(
    w=st.integers(1, 24),
    h=st.integers(1, 24),
    seed=st.integers(0, 2**31 - 1),
    sub=st.booleans(),
)
def test_color_smooth_roundtrip_bound(w, h, seed, sub):
    # smooth gradients (the content JPEG is FOR) at quant=1: tight
    # bounds even through 4:2:0 (box-average + replicate upsample on a
    # LINEAR gradient reconstructs within the chroma step size)
    rng = np.random.RandomState(seed)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    # clip, never wrap: a modulo gradient has 200->0 cliffs that are
    # NOT smooth — chroma box-averaging across one blows any bound
    base = np.clip(xx * 2 + yy * 3 + int(rng.randint(0, 64)), 0, 195)
    img = np.stack(
        [base, base + 20, base + 40], axis=-1
    ).astype(np.uint8)
    _, _, out = decode_jpeg(
        encode_jpeg(img, quant=np.ones(64), subsample=sub)
    )
    tol = 10 if sub else 3
    assert np.abs(out.astype(int) - img.astype(int)).max() <= tol


def test_oversubscribed_dht_rejected_without_lut_blowup():
    # Round-14 ADVICE (medium): a DHT claiming more codes at a length
    # than canonical capacity (code + n > 2^len) used to push the LUT
    # slice base past the table end, silently EXTENDING the list by ~8M
    # entries per table — a memory-amplification vector on untrusted
    # input. The validating builder must reject it loud before filling,
    # and no cached table may exceed its declared 2^width size.
    from datafusion_loki_spark.operators.jpeg import (
        _COMB_CACHE,
        _code_lut,
        _combined_ac_table,
        _combined_dc_table,
    )

    # 255 codes at length 1 (capacity 2) — the ADVICE's crafted shape
    bits = tuple([255] + [0] * 15)
    with pytest.raises(ValueError, match="over-subscribed"):
        _code_lut(bits, tuple(range(255)))
    # 3 codes at length 2 after 1 at length 1 (2*1 + 3 > 4): the
    # doubling-carry case, not just the single-length overflow
    bits2 = tuple([1, 3] + [0] * 14)
    with pytest.raises(ValueError, match="over-subscribed"):
        _code_lut(bits2, (0, 1, 2, 3))
    # exactly-full tables remain valid (2 at len 1 is the boundary)
    sh, msk, lut = _code_lut(tuple([2] + [0] * 15), (7, 9))
    assert len(lut) == msk + 1 and lut[0] == (1, 7) and lut[-1] == (1, 9)
    # the combined builders honor their declared width too (they are
    # only reached post-validation, but a blowup there would be the
    # same memory bug)
    for builder in (
        lambda b, v: _combined_dc_table(b, v),
        lambda b, v: _combined_ac_table(b, v, False, 0),
        lambda b, v: _combined_ac_table(b, v, True, 1),
    ):
        csh, cmsk, clut = builder(tuple([2] + [0] * 15), (3, 0x23))
        assert len(clut) == cmsk + 1
    # every cached table is exactly its declared size (shift+mask agree)
    for (ssh, smsk, slut) in _COMB_CACHE.values():
        assert len(slut) == smsk + 1 == (1 << (64 - ssh))


def test_oversubscribed_dht_in_stream_fails_loud():
    # same guard through the full decode path: take a real JPEG and
    # corrupt its first DHT's BITS counts to over-subscribe
    px = np.arange(64, dtype=np.uint8).reshape(8, 8)
    blob = bytearray(encode_jpeg(px))
    i = blob.find(b"\xff\xc4")
    assert i > 0
    # BITS array starts 5 bytes after the marker (len(2) + Tc/Th(1))
    blob[i + 5] = 255
    with pytest.raises(ValueError):
        decode_jpeg(bytes(blob))


def test_zero_sampling_factor_component_is_loud():
    # round-14 fuzz catch (latent since round 12): a mutated SOF can
    # zero ONE component's sampling factor while another keeps
    # hmax/vmax legal — the divisibility check then crashed with
    # ZeroDivisionError instead of the decoder's loud contract.
    px = np.arange(36, dtype=np.uint8).reshape(3, 4, 3)
    blob = bytearray(encode_jpeg(px, subsample="420"))
    i = blob.find(b"\xff\xc0")
    assert i > 0
    # component 2's h/v byte: SOF body = prec(1) h(2) w(2) nc(1) then
    # per-component (id, hv, tq); component index 1's hv sits at +4+6+
    comp1_hv = i + 4 + 6 + 3 * 1 + 1
    for bad in (0x00, 0x01 << 4, 0x10 | 0x00, 0x30 | 0x01):
        b2 = bytearray(blob)
        b2[comp1_hv] = bad
        with pytest.raises(ValueError):
            decode_jpeg(bytes(b2))


def test_sos_empty_or_truncated_segment_is_loud():
    # offline-fuzz round-15 catch (surfaced through the JPEG-in-TIFF
    # merged-stream path): an SOS whose segment body is empty or too
    # short for its component list must raise the decoder's own
    # ValueError, never IndexError
    blob = bytearray(encode_jpeg(np.full((8, 8), 99, np.uint8)))
    i = blob.index(b"\xff\xda")
    empty = blob[:i] + b"\xff\xda\x00\x02" + blob[i + 14 :]
    with pytest.raises(ValueError, match="SOS segment truncated"):
        decode_jpeg(bytes(empty))
    short = bytearray(blob)
    short[i + 2 : i + 4] = (4).to_bytes(2, "big")  # 1 comp needs >= 6
    with pytest.raises(ValueError, match="SOS segment truncated"):
        decode_jpeg(bytes(short))
