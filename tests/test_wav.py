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
    # still loud; a truly unknown tag (ADPCM = 2) keeps the tag error
    i = good.index(b"fmt ") + 8
    bad = bytearray(good)
    bad[i] = 3
    with pytest.raises(ValueError, match="float WAV bit depth"):
        decode_wav(bytes(bad))
    bad[i] = 2
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
    # tag 3 with a non-32 bit depth is loud (64-bit float unsupported)
    bad = bytearray(blob)
    struct.pack_into("<H", bad, i + 14, 64)
    struct.pack_into("<H", bad, i + 12, 8)      # block align 1ch x 64b
    with pytest.raises(ValueError, match="float WAV bit depth"):
        decode_wav(bytes(bad))
    # ADPCM (tag 2) and extensible (0xFFFE) stay loud
    for tag in (2, 0xFFFE):
        bad = bytearray(blob)
        struct.pack_into("<H", bad, i, tag)
        with pytest.raises(ValueError, match="format tag"):
            decode_wav(bytes(bad))
    # encode rejects unknown depths
    with pytest.raises(ValueError, match="bits must be"):
        encode_wav(vals, 8000, bits=24)
