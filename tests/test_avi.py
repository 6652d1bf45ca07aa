"""MJPEG AVI container (operators/avi.py — late round 14, the video
modality's first real byte->frames path). Pins the RIFF/LIST walk,
word alignment, header validation, the MJPEG-only codec gate, frame
geometry/count consistency, and the DC-only exactness the registry
face's oracle rests on."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings, strategies as st

from datafusion_loki_spark.operators.avi import (
    decode_avi_frames,
    encode_avi_mjpeg,
)
from datafusion_loki_spark.operators.jpeg import encode_jpeg


def _dc_frame(rng, bx=4, by=3):
    blocks = rng.randint(0, 256, (by, bx)).astype(np.uint8)
    return blocks, encode_jpeg(np.repeat(np.repeat(blocks, 8, 0), 8, 1))


@settings(max_examples=25, deadline=None)
@given(
    n=st.integers(1, 5),
    fps=st.integers(1, 60),
    seed=st.integers(0, 2**31 - 1),
)
def test_roundtrip_property(n, fps, seed):
    rng = np.random.RandomState(seed)
    pairs = [_dc_frame(rng) for _ in range(n)]
    got_fps, frames = decode_avi_frames(
        encode_avi_mjpeg([fb for _, fb in pairs], fps=fps)
    )
    assert abs(got_fps - fps) < 0.01 * fps + 0.01
    assert len(frames) == n
    for (blocks, _), (w, h, arr) in zip(pairs, frames):
        assert (w, h) == (32, 24)
        # DC-only frames are integer-exact through the lossy codec
        assert int(arr.sum(dtype="int64")) == 64 * int(
            blocks.sum(dtype="int64")
        )


def test_odd_frame_sizes_stay_word_aligned():
    # JPEG frame bytes are frequently odd-length; the movi chunk walk
    # must pad — construct frames until one lands odd
    rng = np.random.RandomState(7)
    fbs = [_dc_frame(rng, bx=1, by=1)[1] for _ in range(8)]
    assert any(len(fb) & 1 for fb in fbs)  # at least one odd frame
    _, frames = decode_avi_frames(encode_avi_mjpeg(fbs))
    assert len(frames) == 8


def test_fail_loud_contract():
    rng = np.random.RandomState(1)
    good = encode_avi_mjpeg([_dc_frame(rng)[1] for _ in range(2)])
    with pytest.raises(ValueError, match="RIFF"):
        decode_avi_frames(b"not an avi")
    with pytest.raises(ValueError, match="AVI form"):
        decode_avi_frames(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError, match="size"):
        decode_avi_frames(good[:-3])
    # foreign codec is loud, never a fake fallback
    bad = bytearray(good)
    i = bad.index(b"MJPG")
    bad[i : i + 4] = b"XVID"
    i = bad.index(b"MJPG")
    bad[i : i + 4] = b"XVID"
    with pytest.raises(ValueError, match="MJPEG only"):
        decode_avi_frames(bytes(bad))
    # frame-count disagreement: patch avih dwTotalFrames
    bad = bytearray(good)
    i = bad.index(b"avih") + 8
    struct.pack_into("<I", bad, i + 16, 9)
    with pytest.raises(ValueError, match="declares 9 frames"):
        decode_avi_frames(bytes(bad))
    # geometry disagreement: patch avih dwWidth
    bad = bytearray(good)
    i = bad.index(b"avih") + 8
    struct.pack_into("<I", bad, i + 32, 999)
    with pytest.raises(ValueError, match="disagrees"):
        decode_avi_frames(bytes(bad))
    # a non-video first stream: patch strh fccType
    bad = bytearray(good)
    i = bad.index(b"strh") + 8
    bad[i : i + 4] = b"auds"
    with pytest.raises(ValueError, match="not a video stream"):
        decode_avi_frames(bytes(bad))


def test_other_stream_chunks_are_skipped():
    # inject a '01wb' (stream-1 audio) chunk into movi: the video walk
    # must skip it by framing
    rng = np.random.RandomState(3)
    fb = _dc_frame(rng)[1]
    good = bytearray(encode_avi_mjpeg([fb, fb]))
    movi_at = good.index(b"LIST", good.index(b"movi") - 8)
    # rebuild with an audio chunk between the two frames
    from datafusion_loki_spark.operators.avi import _riff_chunks

    audio = b"01wb" + struct.pack("<I", 4) + b"beep"
    insert_at = good.index(b"00dc", good.index(b"movi"))
    second = good.index(b"00dc", insert_at + 4)
    out = bytearray(good[:second]) + audio + good[second:]
    # fix the sizes: movi LIST and RIFF grow by len(audio)
    movi_size_at = movi_at + 4
    (ms,) = struct.unpack_from("<I", out, movi_size_at)
    struct.pack_into("<I", out, movi_size_at, ms + len(audio))
    struct.pack_into("<I", out, 4, len(out) - 8)
    _, frames = decode_avi_frames(bytes(out))
    assert len(frames) == 2
