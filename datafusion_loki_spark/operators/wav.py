"""WAV (RIFF/WAVE) PCM codec — pure stdlib + numpy, no codec library.

Round 13: the multimodal family's AUDIO modality gets a real
byte->samples path (the image formats got theirs in rounds 9-13; audio
previously had only the deterministic fake-feature face). Per the
public RIFF/WAVE layout (Microsoft/IBM multimedia programming
interface spec; the de-facto canonical PCM container): RIFF header,
chunk walk with word-aligned (odd-size padded) sub-chunks, 'fmt '
validation (PCM format tag, block-align and byte-rate consistency),
'data' frame extraction. Supported sample layouts: 8-bit unsigned and
16-bit signed little-endian integer PCM (format tag 1) and 32-bit
IEEE-float PCM (format tag 3 — round 14), any channel count.
Everything else — 64-bit float, ADPCM, extensible wave formats,
misaligned data sizes, trailing garbage that is not a well-formed
chunk — fails with a loud ValueError, never a fake fallback (the
decode_image family contract).

The encoder twin constructs valid inputs for tests and the registry
face (multimodal.mm_decode_wav), including extra skippable chunks and
odd-size padding, so the decoder's chunk walk is exercised for real.
"""

from __future__ import annotations

import struct

import numpy as np


def decode_wav(payload: bytes):
    """Decode a PCM WAV. Returns (n_channels, sample_rate,
    bits_per_sample, samples) where ``samples`` is an (n_frames,
    n_channels) ndarray — uint8 for 8-bit int PCM, int16 for 16-bit
    int PCM, float32 for 32-bit IEEE-float PCM (format tag 3, round
    14). Loud ValueError on malformed or unsupported streams."""
    if payload[:4] != b"RIFF":
        raise ValueError("not a WAV (RIFF signature missing)")
    if len(payload) < 12 or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV (WAVE form type missing)")
    (riff_size,) = struct.unpack("<I", payload[4:8])
    if riff_size + 8 != len(payload):
        raise ValueError(
            f"RIFF size {riff_size} does not match payload"
            f" ({len(payload) - 8} bytes after the header)"
        )
    pos = 12
    fmt = None
    data = None
    while pos < len(payload):
        if len(payload) - pos < 8:
            raise ValueError("WAV chunk header truncated")
        ckid = payload[pos : pos + 4]
        (cksize,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + cksize]
        if len(body) < cksize:
            raise ValueError(f"WAV chunk {ckid!r} truncated")
        if ckid == b"fmt ":
            fmt = body
        elif ckid == b"data":
            if data is not None:
                raise ValueError("WAV has more than one data chunk")
            data = body
        # other chunks (LIST, fact, cue , ...) are skipped by framing
        pos += 8 + cksize + (cksize & 1)  # word-aligned: odd sizes pad
    if fmt is None or data is None:
        raise ValueError("WAV missing its fmt or data chunk")
    if len(fmt) < 16:
        raise ValueError("WAV fmt chunk shorter than the PCM layout")
    tag, ch, rate, byte_rate, block_align, bits = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if tag not in (1, 3):
        raise ValueError(
            f"unsupported WAV format tag {tag} (integer or IEEE-float"
            " PCM only); no fake fallback"
        )
    if ch == 0 or rate == 0:
        raise ValueError("malformed WAV fmt (zero channels or rate)")
    if tag == 3 and bits != 32:
        raise ValueError(
            f"unsupported float WAV bit depth {bits} (32-bit only)"
        )
    if tag == 1 and bits not in (8, 16):
        raise ValueError(f"unsupported WAV bit depth {bits} (8/16 PCM)")
    if block_align != ch * bits // 8:
        raise ValueError(
            f"WAV block align {block_align} inconsistent with"
            f" {ch} ch x {bits} bits"
        )
    if byte_rate != rate * block_align:
        raise ValueError("WAV byte rate inconsistent with rate x align")
    if len(data) % block_align:
        raise ValueError(
            f"WAV data size {len(data)} not a multiple of the"
            f" {block_align}-byte frame"
        )
    n_frames = len(data) // block_align
    if tag == 3:
        samples = np.frombuffer(data, dtype="<f4").reshape(
            n_frames, ch
        ).astype(np.float32)
        return ch, rate, bits, samples
    dt = np.uint8 if bits == 8 else np.dtype("<i2")
    samples = np.frombuffer(data, dtype=dt).reshape(n_frames, ch)
    if bits == 16:
        samples = samples.astype(np.int16)
    return ch, rate, bits, samples


def encode_wav(samples, rate: int, bits: int = 16, extra_chunk=None) -> bytes:
    """WAV writer for (n_frames, n_channels) samples (uint8 for 8-bit,
    int16 for 16-bit, float32 for 32-bit — written as format tag 3,
    IEEE float). ``extra_chunk`` optionally injects a (ckid, body)
    pair before the data chunk — the decoder must skip it (and its
    odd-size pad byte) by framing."""
    samples = np.asarray(samples)
    if samples.ndim != 2:
        raise ValueError(
            f"encode_wav needs (n_frames, n_channels), got {samples.shape}"
        )
    n, ch = samples.shape
    tag = 1
    if bits == 8:
        body = samples.astype(np.uint8).tobytes()
    elif bits == 16:
        body = samples.astype("<i2").tobytes()
    elif bits == 32:
        tag = 3
        body = samples.astype("<f4").tobytes()
    else:
        raise ValueError(
            f"encode_wav bits must be 8, 16, or 32 (float), got {bits}"
        )
    block_align = ch * bits // 8
    fmt = struct.pack("<HHIIHH", tag, ch, rate, rate * block_align,
                      block_align, bits)
    chunks = bytearray()
    chunks += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    if extra_chunk is not None:
        ckid, cbody = extra_chunk
        chunks += ckid + struct.pack("<I", len(cbody)) + cbody
        if len(cbody) & 1:
            chunks += b"\x00"  # word-align pad
    chunks += b"data" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + bytes(
        chunks
    )
