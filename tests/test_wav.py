"""WAV codec (operators/wav.py — round 13, the audio modality's real
decode path). The registry row (mm_decode_wav) proves the signed-LE
sample arithmetic cross-engine; these tests pin the RIFF chunk walk
(word-aligned skipping, extra chunks, odd-size padding), both sample
layouts, and the loud-failure contract."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from datafusion_loki_spark.operators.wav import decode_wav, encode_wav


def test_roundtrip_16bit_stereo_with_skippable_chunk():
    rng = np.random.RandomState(3)
    s = rng.randint(-32768, 32768, (50, 2)).astype(np.int16)
    wav = encode_wav(s, 44100, bits=16, extra_chunk=(b"LIST", b"INFOx"))
    ch, rate, bits, out = decode_wav(wav)
    assert (ch, rate, bits) == (2, 44100, 16)
    assert out.dtype == np.int16 and (out == s).all()


def test_roundtrip_8bit_mono_odd_data_size():
    # 33 mono 8-bit frames: the data chunk is odd-sized, so the writer
    # pads and the RIFF size math must stay consistent
    rng = np.random.RandomState(4)
    s = rng.randint(0, 256, (33, 1)).astype(np.uint8)
    ch, rate, bits, out = decode_wav(encode_wav(s, 8000, bits=8))
    assert (ch, rate, bits) == (1, 8000, 8)
    assert out.dtype == np.uint8 and (out == s).all()


@settings(max_examples=60, deadline=None)
@given(
    n=st.integers(1, 200),
    ch=st.integers(1, 4),
    bits=st.sampled_from([8, 16]),
    seed=st.integers(0, 2**31 - 1),
    extra=st.booleans(),
)
def test_roundtrip_property(n, ch, bits, seed, extra):
    rng = np.random.RandomState(seed)
    if bits == 8:
        s = rng.randint(0, 256, (n, ch)).astype(np.uint8)
    else:
        s = rng.randint(-32768, 32768, (n, ch)).astype(np.int16)
    kw = {"extra_chunk": (b"fact", bytes([seed % 256] * (seed % 7)))} if (
        extra
    ) else {}
    got = decode_wav(encode_wav(s, 16000, bits=bits, **kw))[3]
    assert (got == s).all()


def test_fail_loud_contract():
    s = np.zeros((10, 2), dtype=np.int16)
    good = encode_wav(s, 8000)
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"not a wav at all")
    with pytest.raises(ValueError, match="WAVE"):
        decode_wav(b"RIFF" + struct.pack("<I", 4) + b"AVI ")
    # truncation breaks the RIFF size accounting first
    with pytest.raises(ValueError, match="RIFF size|truncated"):
        decode_wav(good[:-3])
    # format tag 3 (float) is SUPPORTED since round 14 — retagging a
    # 16-bit int stream as float now dies on the depth gate instead,
    # still loud; MS-ADPCM (tag 2) is supported since late round 14
    # (dies on ITS fmt checks here); a truly unknown tag (a-law
    # sibling 0x31 GSM) keeps the tag error
    i = good.index(b"fmt ") + 8
    bad = bytearray(good)
    bad[i] = 3
    with pytest.raises(ValueError, match="float WAV bit depth"):
        decode_wav(bytes(bad))
    bad[i] = 2
    with pytest.raises(ValueError, match="MS-ADPCM"):
        decode_wav(bytes(bad))
    bad[i] = 0x31
    with pytest.raises(ValueError, match="format tag"):
        decode_wav(bytes(bad))
    # 24-bit: unsupported, loud (flip wBitsPerSample and block align
    # to stay self-consistent — the depth gate must fire, not the
    # consistency check)
    bad = bytearray(good)
    bad[i + 14] = 24
    bad[i + 12] = 6
    bad[i + 6] = 0x5D  # byte rate 8000*6 = 48000 = 0xBB80... recompute
    with pytest.raises(ValueError):
        decode_wav(bytes(bad))
    # block align inconsistent with channels x bits
    bad = bytearray(good)
    bad[i + 12] = 7
    with pytest.raises(ValueError, match="block align"):
        decode_wav(bytes(bad))
    # data size not a multiple of the frame: shrink the data chunk by
    # one byte and fix up the RIFF size
    j = good.index(b"data")
    (dsz,) = struct.unpack("<I", good[j + 4 : j + 8])
    bad = bytearray(good[: j + 4])
    bad += struct.pack("<I", dsz - 1)
    bad += good[j + 8 : j + 8 + dsz - 1]
    bad += b"\x00"  # pad: odd size
    riff = bytearray(bad)
    struct.pack_into("<I", riff, 4, len(riff) - 8)
    with pytest.raises(ValueError, match="multiple of"):
        decode_wav(bytes(riff))
    # two data chunks
    dbl = encode_wav(s, 8000, extra_chunk=(b"data", b"\x00" * 4))
    with pytest.raises(ValueError, match="more than one data"):
        decode_wav(dbl)
    # missing fmt: strip it by rebuilding
    nofmt = (
        b"RIFF"
        + struct.pack("<I", 4 + 8 + 4)
        + b"WAVE"
        + b"data"
        + struct.pack("<I", 4)
        + b"\x00" * 4
    )
    with pytest.raises(ValueError, match="missing its fmt"):
        decode_wav(nofmt)


# --- round 14: IEEE-float PCM (format tag 3) ---


def test_roundtrip_float32():
    rng = np.random.RandomState(4)
    # integer-valued floats (exact) AND true fractional floats — the
    # branch must carry both bit-exactly (float32 container roundtrip)
    for vals in (
        rng.randint(-32768, 32768, (40, 2)).astype(np.float32),
        (rng.randn(17, 1) * 0.25).astype(np.float32),
    ):
        blob = encode_wav(vals, 44100, bits=32,
                          extra_chunk=(b"fact", b"\x11\x00\x00\x00"))
        ch, rate, bits, out = decode_wav(blob)
        assert (ch, rate, bits) == (vals.shape[1], 44100, 32)
        assert out.dtype == np.float32
        assert (out == vals).all()


def test_float_fail_loud_contract():
    vals = np.zeros((4, 1), dtype=np.float32)
    blob = bytearray(encode_wav(vals, 8000, bits=32))
    i = blob.index(b"fmt ") + 8
    # tag 3 with an integer-class bit depth is loud (64-bit float IS
    # supported since late round 14; 16 under tag 3 is not)
    bad = bytearray(blob)
    struct.pack_into("<H", bad, i + 14, 16)
    struct.pack_into("<H", bad, i + 12, 2)      # block align 1ch x 16b
    with pytest.raises(ValueError, match="float WAV bit depth"):
        decode_wav(bytes(bad))
    # Microsoft ADPCM (tag 2) is a real decoder since late round 14
    # (dies on ITS fmt checks when retagged); extensible (0xFFFE) dies
    # on ITS OWN check (a 16-byte PCM fmt can't carry the 40-byte
    # extensible layout)
    bad = bytearray(blob)
    struct.pack_into("<H", bad, i, 2)
    with pytest.raises(ValueError, match="MS-ADPCM"):
        decode_wav(bytes(bad))
    bad = bytearray(blob)
    struct.pack_into("<H", bad, i, 0xFFFE)
    with pytest.raises(ValueError, match="40-byte"):
        decode_wav(bytes(bad))
    # encode rejects unknown depths (24 is supported since late r14)
    with pytest.raises(ValueError, match="bits must be"):
        encode_wav(vals, 8000, bits=12)


# --- round 14: IMA ADPCM (format tag 0x11) ---


def test_adpcm_hand_vector():
    # decode one mono block by hand against the IMA tables: header
    # sample 100 at step index 0 (step 7), nibbles 0x3 (diff
    # 1+3 = +4, index -1 -> clamped 0) then 0xB (8|3: -4, idx 0) ...
    # built as a crafted stream, NOT via the encoder — pins the
    # decoder's table walk independently of the quantizer twin
    from datafusion_loki_spark.operators.wav import _ima_step

    spb, block_align = 9, 8  # 1 word: 4 bytes = 8 nibbles, mono
    nibs = [3, 0xB, 7, 0xF, 0, 8, 1, 9]
    data = struct.pack("<hBB", 100, 0, 0) + bytes(
        nibs[i] | (nibs[i + 1] << 4) for i in range(0, 8, 2)
    )
    fmt = struct.pack("<HHIIHHHH", 0x11, 1, 8000, 4000, block_align, 4, 2, spb)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    blob = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    ch, rate, bits, out = decode_wav(blob)
    assert (ch, rate, bits) == (1, 8000, 4)
    # independent replay of the spec walk
    pred, idx = 100, 0
    want = [100]
    for n in nibs:
        pred, idx = _ima_step(pred, idx, n)
        want.append(pred)
    assert out[:, 0].tolist() == want
    # the concrete first steps, fully by hand: step 7, nibble 3 ->
    # diff = 0 + 1 + 3 = 4 -> 104; nibble 0xB -> sign bit, same
    # magnitude bits at step 7 (index clamped at 0) -> back to 100
    assert want[1] == 104 and want[2] == 100


def test_adpcm_roundtrip_bounded_error_and_carry():
    from datafusion_loki_spark.operators.wav import encode_wav_adpcm

    t = np.arange(1500)
    for chn in (1, 2, 3):
        sig = (
            8000
            * np.sin(2 * np.pi * t[:, None] * (np.arange(chn) + 1) * 440 / 16000)
        ).astype(np.int16)
        ch, rate, bits, out = decode_wav(encode_wav_adpcm(sig, 16000))
        assert (ch, rate, bits) == (chn, 16000, 4)
        assert out.shape == sig.shape
        assert out.dtype == np.int16
        # every block's header sample is exact; steady-state tracking
        # error stays within a few step sizes of the signal slope
        err = np.abs(out.astype(np.int32) - sig.astype(np.int32))
        assert err[0].max() == 0
        assert err[100:].max() < 1500, err[100:].max()


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(1, 120),
    ch=st.integers(1, 3),
    words=st.integers(1, 4),
    seed=st.integers(0, 2**31 - 1),
)
def test_adpcm_shape_and_fact_trim_property(n, ch, words, seed):
    from datafusion_loki_spark.operators.wav import encode_wav_adpcm

    rng = np.random.RandomState(seed)
    sig = rng.randint(-3000, 3000, (n, ch)).astype(np.int16)
    got_ch, rate, bits, out = decode_wav(
        encode_wav_adpcm(sig, 22050, block_words=words)
    )
    assert (got_ch, bits) == (ch, 4)
    # fact trims the padded final block back to the true frame count
    assert out.shape == (n, ch)
    assert (out[0] == sig[0]).all()


def test_adpcm_fail_loud_contract():
    from datafusion_loki_spark.operators.wav import encode_wav_adpcm

    sig = np.zeros((40, 1), dtype=np.int16)
    good = bytearray(encode_wav_adpcm(sig, 8000))
    # fmt starts at byte 20 (RIFF 12 + 'fmt '+size 8)
    FMT = 20
    # step index out of range in a block header: data chunk starts
    # after fmt (24 bytes) + fact (12 bytes) + 'data'+size
    data_off = good.index(b"data") + 8
    bad = bytearray(good)
    bad[data_off + 2] = 89  # index byte of the first block header
    with pytest.raises(ValueError, match="step index"):
        decode_wav(bytes(bad))
    # wSamplesPerBlock inconsistent with block align
    bad = bytearray(good)
    struct.pack_into("<H", bad, FMT + 18, 99)
    with pytest.raises(ValueError, match="wSamplesPerBlock|inconsistent"):
        decode_wav(bytes(bad))
    # fact count out of the final block's range
    fact_off = good.index(b"fact") + 8
    bad = bytearray(good)
    struct.pack_into("<I", bad, fact_off, 999)
    with pytest.raises(ValueError, match="fact"):
        decode_wav(bytes(bad))
    # truncated fmt (cbSize/wSamplesPerBlock missing): rebuild with a
    # 16-byte fmt but keep tag 0x11
    fmt16 = struct.pack("<HHIIHH", 0x11, 1, 8000, 4000, 8, 4)
    chunks = (
        b"fmt " + struct.pack("<I", 16) + fmt16
        + b"data" + struct.pack("<I", 8) + bytes(8)
    )
    blob = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    with pytest.raises(ValueError, match="wSamplesPerBlock"):
        decode_wav(blob)
    # bits != 4 under tag 0x11
    bad = bytearray(good)
    struct.pack_into("<H", bad, FMT + 14, 8)
    with pytest.raises(ValueError, match="bit depth must be 4"):
        decode_wav(bytes(bad))
    # retagging the IMA stream as MS-ADPCM (tag 2) dies on the
    # MS-ADPCM fmt layout checks (supported since late round 14)
    bad = bytearray(good)
    struct.pack_into("<H", bad, FMT, 2)
    with pytest.raises(ValueError, match="MS-ADPCM"):
        decode_wav(bytes(bad))
    # data not a whole number of blocks
    nblocks_off = good.index(b"data") + 4
    (dsz,) = struct.unpack_from("<I", good, nblocks_off)
    bad = bytearray(good)
    bad[nblocks_off:nblocks_off + 4] = struct.pack("<I", dsz - 4)
    del bad[-4:]
    struct.pack_into("<I", bad, 4, len(bad) - 8)
    # fact now disagrees OR block misaligned — either way loud
    with pytest.raises(ValueError):
        decode_wav(bytes(bad))


def test_adpcm_predictor_clamps_at_int16_bounds():
    # a block header may start the predictor near the rail with the
    # step table maxed (index 88, step 32767): nibble 7 adds ~28k and
    # MUST clamp to 32767, nibble 15 subtracts and must clamp at
    # -32768 — the spec's saturation, not wraparound
    spb, block_align = 9, 8
    for p0, nib, want in ((32000, 7, 32767), (-32000, 15, -32768)):
        nibs = [nib] * 8
        data = struct.pack("<hBB", p0, 88, 0) + bytes(
            nibs[i] | (nibs[i + 1] << 4) for i in range(0, 8, 2)
        )
        fmt = struct.pack(
            "<HHIIHHHH", 0x11, 1, 8000, 4000, block_align, 4, 2, spb
        )
        chunks = (
            b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data
        )
        blob = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
        _, _, _, out = decode_wav(blob)
        assert out[-1, 0] == want
        assert abs(out[:, 0].astype(np.int32)).max() <= 32768


# --- round 14 (late): 24/32-bit int, float64, WAVE_FORMAT_EXTENSIBLE ---


@settings(max_examples=40, deadline=None)
@given(
    n=st.integers(1, 60),
    ch=st.integers(1, 6),
    layout=st.sampled_from(["i24", "i32", "f64", "i24x", "f32x"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_wide_layout_roundtrip_property(n, ch, layout, seed):
    rng = np.random.RandomState(seed)
    if layout in ("i24", "i24x"):
        sig = rng.randint(-(1 << 23), 1 << 23, (n, ch)).astype(np.int32)
        blob = encode_wav(sig, 48000, bits=24, extensible=layout == "i24x")
        want_bits, want_dtype = 24, np.int32
    elif layout == "i32":
        sig = rng.randint(-(1 << 31), (1 << 31) - 1, (n, ch)).astype(
            np.int32
        )
        blob = encode_wav(sig, 48000, bits=32, int32=True)
        want_bits, want_dtype = 32, np.int32
    elif layout == "f64":
        sig = rng.standard_normal((n, ch))
        blob = encode_wav(sig, 48000, bits=64)
        want_bits, want_dtype = 64, np.float64
    else:
        sig = rng.standard_normal((n, ch)).astype(np.float32)
        blob = encode_wav(sig, 48000, bits=32, extensible=True)
        want_bits, want_dtype = 32, np.float32
    got_ch, rate, bits, out = decode_wav(blob)
    assert (got_ch, rate, bits) == (ch, 48000, want_bits)
    assert out.dtype == want_dtype
    assert np.array_equal(out, sig)


def test_wav_24bit_sign_extension_exact():
    # the widen path must sign-extend bit 23, not zero-fill: -1 is
    # 0xFFFFFF on the wire, +max is 0x7FFFFF
    sig = np.array([[-1], [-(1 << 23)], [(1 << 23) - 1], [0]], np.int32)
    blob = encode_wav(sig, 8000, bits=24)
    data_off = blob.index(b"data") + 8
    assert blob[data_off : data_off + 3] == b"\xff\xff\xff"
    _, _, _, out = decode_wav(blob)
    assert out[:, 0].tolist() == [-1, -(1 << 23), (1 << 23) - 1, 0]


def test_extensible_fail_loud_contract():
    sig = np.zeros((4, 2), dtype=np.int16)
    good = bytearray(encode_wav(sig, 8000, bits=16, extensible=True))
    FMT = 20
    # foreign SubFormat GUID tail
    bad = bytearray(good)
    bad[FMT + 30] ^= 0xFF
    with pytest.raises(ValueError, match="GUID"):
        decode_wav(bytes(bad))
    # non-PCM subformat (a-law = 6)
    bad = bytearray(good)
    struct.pack_into("<H", bad, FMT + 24, 6)
    with pytest.raises(ValueError, match="subformat 6"):
        decode_wav(bytes(bad))
    # sub-container valid bits (20 valid in a 24-bit container class)
    bad = bytearray(good)
    struct.pack_into("<H", bad, FMT + 18, 12)
    with pytest.raises(ValueError, match="valid bits"):
        decode_wav(bytes(bad))
    # truncated extensible fmt (16-byte fmt with tag 0xFFFE)
    fmt16 = struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16)
    chunks = (
        b"fmt " + struct.pack("<I", 16) + fmt16
        + b"data" + struct.pack("<I", 4) + bytes(4)
    )
    blob = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    with pytest.raises(ValueError, match="40-byte"):
        decode_wav(blob)


# --- late round 14: G.711 A-law / mu-law (format tags 6 / 7) ---


def test_g711_anchor_points_and_symmetry():
    from datafusion_loki_spark.operators.wav import (
        _ALAW_TABLE,
        _ULAW_TABLE,
    )

    # mu-law's two zeros (0xFF positive-zero, 0x7F negative-zero) and
    # the full-scale codes ((15<<3 + 0x84) << 7 - 0x84 = 32124);
    # A-law's XOR-fixpoint +/-8 smallest steps and its full scale
    # ((15<<4 + 0x108) << 6 = 32256) — all hand-derived from the
    # ITU-T reference recipe, not read back from the table
    assert _ULAW_TABLE[0xFF] == 0 and _ULAW_TABLE[0x7F] == 0
    assert _ULAW_TABLE[0x80] == 32124
    assert _ULAW_TABLE[0x00] == -32124
    assert _ALAW_TABLE[0x55] == -8 and _ALAW_TABLE[0xD5] == 8
    assert _ALAW_TABLE[0xAA] == 32256 and _ALAW_TABLE[0x2A] == -32256
    # sign-bit flip negates, for every code (companded sign symmetry)
    for b in range(256):
        assert _ULAW_TABLE[b ^ 0x80] == -_ULAW_TABLE[b]
        assert _ALAW_TABLE[b ^ 0x80] == -_ALAW_TABLE[b]
    # decode tables are monotone within each positive segment run
    pos_u = sorted(int(_ULAW_TABLE[b]) for b in range(0x80, 0x100))
    assert pos_u[0] <= 0 <= pos_u[-1] == 32124


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(1, 80),
    ch=st.integers(1, 2),
    law=st.sampled_from(["ulaw", "alaw"]),
    seed=st.integers(0, 2**31 - 1),
)
def test_g711_roundtrip_property(n, ch, law, seed):
    from datafusion_loki_spark.operators.wav import (
        _ALAW_TABLE,
        _ULAW_TABLE,
        encode_wav_g711,
    )

    rng = np.random.RandomState(seed)
    comp = bytes(rng.randint(0, 256, n * ch, dtype=np.uint8))
    got_ch, rate, bits, out = decode_wav(
        encode_wav_g711(comp, 8000, law=law, channels=ch)
    )
    assert (got_ch, rate, bits) == (ch, 8000, 8)
    table = _ULAW_TABLE if law == "ulaw" else _ALAW_TABLE
    want = table[np.frombuffer(comp, dtype=np.uint8)].reshape(n, ch)
    assert (out == want).all()


def test_g711_fail_loud_contract():
    from datafusion_loki_spark.operators.wav import encode_wav_g711

    good = bytearray(encode_wav_g711(bytes(20), 8000, law="ulaw"))
    FMT = 20
    # non-8-bit under a G.711 tag
    bad = bytearray(good)
    struct.pack_into("<H", bad, FMT + 14, 16)
    with pytest.raises(ValueError, match="must be 8"):
        decode_wav(bytes(bad))
    # block align inconsistent with channels
    bad = bytearray(good)
    struct.pack_into("<H", bad, FMT + 12, 3)
    with pytest.raises(ValueError, match="block align"):
        decode_wav(bytes(bad))
    with pytest.raises(ValueError, match="law"):
        encode_wav_g711(bytes(4), 8000, law="dlaw")
    with pytest.raises(ValueError, match="tile"):
        encode_wav_g711(bytes(5), 8000, channels=2)


# --- late round 14: MS-ADPCM (format tag 2) ---


def test_msadpcm_hand_vector():
    # one crafted mono block decoded against an independent replay of
    # the published recipe: predictor pair (256, 0), iDelta 32, seeds
    # sample2 = 100 (emitted first), sample1 = 200, nibbles +3 then -4
    from datafusion_loki_spark.operators.wav import _MS_COEFS

    spb, align = 4, 8  # 7-byte header + 1 data byte = 2 nibbles
    data = bytes([0]) + struct.pack("<hhh", 32, 200, 100) + bytes(
        [((3 & 0x0F) << 4) | ((-4) & 0x0F)]
    )
    fmt = struct.pack(
        "<HHIIHHHHH", 2, 1, 8000, 4000, align, 4,
        4 + 4 * len(_MS_COEFS), spb, len(_MS_COEFS),
    ) + b"".join(struct.pack("<hh", a, b) for a, b in _MS_COEFS)
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    blob = b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
    ch, rate, bits, out = decode_wav(blob)
    assert (ch, rate, bits) == (1, 8000, 4)
    # hand replay: pred = (200*256 + 100*0) >> 8 = 200; s = 200 + 32*3
    # = 296; delta -> max(16, (230*32)>>8) = 28 (nibble 3's adaptation)
    # then pred = 296; s = 296 + 28*(-4) = 184
    assert out[:, 0].tolist() == [100, 200, 296, 184]


def test_msadpcm_roundtrip_bounded_error():
    from datafusion_loki_spark.operators.wav import encode_wav_ms_adpcm

    t = np.arange(1200)
    for chn in (1, 2):
        sig = (
            8000
            * np.sin(2 * np.pi * t[:, None] * (np.arange(chn) + 1) * 440 / 16000)
        ).astype(np.int16)
        ch, rate, bits, out = decode_wav(
            encode_wav_ms_adpcm(sig, 16000, block_words=16)
        )
        assert (ch, rate, bits) == (chn, 16000, 4)
        assert out.shape == sig.shape
        err = np.abs(out.astype(np.int32) - sig.astype(np.int32))
        assert err[0].max() == 0 and err[1].max() == 0  # seeds exact
        assert err[50:].max() < 2000, err[50:].max()


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(2, 100),
    ch=st.integers(1, 2),
    words=st.integers(2, 10),
    pred=st.integers(0, 6),
    seed=st.integers(0, 2**31 - 1),
)
def test_msadpcm_shape_fact_trim_and_all_predictors(n, ch, words, pred,
                                                    seed):
    from datafusion_loki_spark.operators.wav import encode_wav_ms_adpcm

    rng = np.random.RandomState(seed)
    sig = rng.randint(-3000, 3000, (n, ch)).astype(np.int16)
    got_ch, _, bits, out = decode_wav(
        encode_wav_ms_adpcm(sig, 22050, block_words=words, predictor=pred)
    )
    assert (got_ch, bits) == (ch, 4)
    assert out.shape == (n, ch)
    assert (out[0] == sig[0]).all() and (out[1] == sig[1]).all()


def test_msadpcm_fail_loud_contract():
    from datafusion_loki_spark.operators.wav import encode_wav_ms_adpcm

    sig = np.zeros((40, 1), dtype=np.int16)
    good = bytearray(encode_wav_ms_adpcm(sig, 8000))
    # predictor index outside the declared table
    data_off = good.index(b"data") + 8
    bad = bytearray(good)
    bad[data_off] = 9
    with pytest.raises(ValueError, match="predictor index"):
        decode_wav(bytes(bad))
    # wSamplesPerBlock inconsistent
    FMT = 20
    bad = bytearray(good)
    struct.pack_into("<H", bad, FMT + 18, 99)
    with pytest.raises(ValueError, match="wSamplesPerBlock|inconsistent"):
        decode_wav(bytes(bad))
    # truncated coefficient table (declare more pairs than cbSize holds)
    bad = bytearray(good)
    struct.pack_into("<H", bad, FMT + 20, 60)
    with pytest.raises(ValueError, match="coefficient"):
        decode_wav(bytes(bad))
    # bits != 4
    bad = bytearray(good)
    struct.pack_into("<H", bad, FMT + 14, 8)
    with pytest.raises(ValueError, match="must be 4"):
        decode_wav(bytes(bad))


def test_msadpcm_predictor_truncates_toward_zero():
    # The reference recipe's C integer division (s1*c1 + s2*c2)/256
    # truncates toward zero; a floor shift is off by one for negative
    # sums and the error compounds through the prediction feedback
    # (round-15 ADVICE regression pin). Pair (512, -256) with s2 > 2*s1
    # makes the sum negative: t = 100*512 - 300*256 = -25600,
    # trunc(t/256) = -100 (floor would give -100 here, so pick a sum
    # not divisible by 256: t = 100*512 - 301*256 = -25856 -> -101
    # either way; use t = 1*512 - 3*256 = -256 -> -1; need remainder:
    # t = 1*512 - 2*256 - odd ... simplest: s1=0, s2=1, c2=-255 ->
    # t = -255, trunc = 0, floor = -1).
    from datafusion_loki_spark.operators.wav import _ms_step

    sample, _ = _ms_step(0, 1, 16, 0, -255, 0)
    assert sample == 0  # floor shift (-255 >> 8) would give -1
    sample, _ = _ms_step(100, 301, 16, 512, -256, 0)
    assert sample == -101
    # positive sums unchanged
    sample, _ = _ms_step(100, 0, 16, 256, 0, 1)
    assert sample == 100 + 16


# --- Sun AU (.snd, round 15) -------------------------------------------

def test_au_all_encodings_roundtrip():
    from datafusion_loki_spark.operators.wav import (
        _ALAW_TABLE,
        _ULAW_TABLE,
        decode_au,
        encode_au,
    )

    raw = bytes(range(256))
    ch, rate, enc, out = decode_au(encode_au(raw, 8000, 1))
    assert (ch, rate, enc) == (1, 8000, 1)
    assert (out[:, 0] == _ULAW_TABLE).all()
    ch, rate, enc, out = decode_au(encode_au(raw, 8000, 27))
    assert (out[:, 0] == _ALAW_TABLE).all()
    s16 = np.arange(-300, 300, 7, dtype=np.int16)
    ch, _, _, out = decode_au(
        encode_au(s16.reshape(-1, 2), 44100, 3, channels=2)
    )
    assert ch == 2 and (out.reshape(-1) == s16).all()
    s8 = np.arange(-128, 128, dtype=np.int8)
    _, _, _, out = decode_au(encode_au(s8, 8000, 2))
    assert (out[:, 0] == s8.astype(np.int16)).all()


def test_au_annotation_skip_and_unknown_size():
    from datafusion_loki_spark.operators.wav import decode_au, encode_au

    raw = bytes([0xFF, 0x7F, 0x00, 0x80])
    blob = encode_au(raw, 8000, 1, annotation=b"some metadata text")
    ch, rate, enc, out = decode_au(blob)
    assert out.shape == (4, 1)
    # unknown-size marker: data runs to end of file
    blob = encode_au(raw, 8000, 1, unknown_size=True)
    assert decode_au(blob)[3].shape == (4, 1)
    # both mu-law zeros decode to 0 through the AU path too
    assert decode_au(encode_au(b"\xff\x7f", 8000, 1))[3].tolist() == [
        [0], [0],
    ]


def test_au_fail_loud_contract():
    import struct as _struct

    from datafusion_loki_spark.operators.wav import decode_au, encode_au

    with pytest.raises(ValueError, match="magic"):
        decode_au(b"RIFF not an au")
    with pytest.raises(ValueError, match="header truncated"):
        decode_au(b".snd\x00\x00")
    good = bytearray(encode_au(bytes(8), 8000, 1))
    _struct.pack_into(">I", good, 4, 12)  # offset inside the header
    with pytest.raises(ValueError, match="overlaps the header"):
        decode_au(bytes(good))
    good = bytearray(encode_au(bytes(8), 8000, 1))
    _struct.pack_into(">I", good, 4, 9999)
    with pytest.raises(ValueError, match="past end"):
        decode_au(bytes(good))
    good = bytearray(encode_au(bytes(8), 8000, 1))
    _struct.pack_into(">I", good, 12, 23)  # FLAC-ish unsupported id
    with pytest.raises(ValueError, match="unsupported AU encoding"):
        decode_au(bytes(good))
    good = bytearray(encode_au(bytes(8), 8000, 1))
    _struct.pack_into(">I", good, 8, 999)  # size past the file
    with pytest.raises(ValueError, match="file holds"):
        decode_au(bytes(good))
    # odd byte count for 16-bit stereo frames
    with pytest.raises(ValueError, match="whole"):
        decode_au(
            encode_au(np.zeros(3, np.int16), 8000, 3, channels=2)
        )
