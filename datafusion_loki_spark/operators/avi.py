"""AVI (RIFF) MJPEG container — pure stdlib, no codec library.

Late round 14: the VIDEO modality gets a real byte->frames path (image
formats landed in rounds 9-14, audio in rounds 13-14; video previously
had only decode-backed GIF animation). Per the public AVI RIFF form
(Microsoft's multimedia file format spec): the outer 'RIFF'/'AVI '
form, LIST chunk walk with word-aligned (odd-size padded) sub-chunks,
the 'hdrl' header list ('avih' MainAVIHeader geometry/frame count,
per-stream 'strl' lists with 'strh' stream headers and 'strf'
BITMAPINFOHEADER formats), and the 'movi' list whose '00dc'/'00db'
chunks carry one compressed frame each. The ONLY supported codec is
MJPEG ('MJPG' fourcc — each frame is a standalone baseline/progressive
JPEG, decoded by operators/jpeg.py); every other codec, a non-video
first stream, geometry disagreements between the container and the
decoded frames, and malformed framing fail with a loud ValueError,
never a fake fallback (the decode family contract).

The encoder twin writes a minimal-but-complete MJPEG AVI (avih + one
'vids'/'MJPG' strl + movi + an idx1 index) to CONSTRUCT valid inputs
for tests and the registry face (multimodal.mm_decode_video): frames
built with the DC-only JPEG construction stay integer-exact through
the lossy codec, so the face's DuckDB oracle replays per-frame sums
from raw payload bytes.
"""

from __future__ import annotations

import struct

from datafusion_loki_spark.operators.jpeg import decode_jpeg


def _riff_chunks(payload: bytes, pos: int, end: int):
    """Word-aligned chunk walk: yields (fourcc, body_start, body_size,
    list_subtype_or_None). Loud on truncation."""
    while pos < end:
        if pos + 8 > end:
            raise ValueError("AVI chunk header truncated")
        cc = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = pos + 8
        if body + size > end:
            raise ValueError(f"AVI chunk {cc!r} overruns its parent")
        sub = None
        if cc in (b"LIST", b"RIFF"):
            if size < 4:
                raise ValueError("AVI LIST without a subtype")
            sub = payload[body : body + 4]
        yield cc, body, size, sub
        pos = body + size + (size & 1)  # word-aligned


def decode_avi_frames(payload: bytes):
    """Decode an MJPEG AVI. Returns (fps, [(w, h, frame ndarray), ...])
    for the FIRST video stream — each frame the full decode_jpeg
    output. Loud ValueError on non-MJPEG codecs, malformed RIFF
    framing, header/frame geometry disagreement, and frame-count
    mismatches against the container's own declaration."""
    if payload[:4] != b"RIFF":
        raise ValueError("not an AVI (RIFF signature missing)")
    if len(payload) < 12 or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI (AVI form type missing)")
    (riff_size,) = struct.unpack("<I", payload[4:8])
    if riff_size + 8 != len(payload):
        raise ValueError(
            f"AVI RIFF size {riff_size} does not match payload"
        )
    avih = None
    strh = None
    strf = None
    movi = None
    for cc, body, size, sub in _riff_chunks(payload, 12, len(payload)):
        if cc == b"LIST" and sub == b"hdrl":
            for c2, b2, s2, sub2 in _riff_chunks(
                payload, body + 4, body + size
            ):
                if c2 == b"avih":
                    avih = payload[b2 : b2 + s2]
                elif c2 == b"LIST" and sub2 == b"strl" and strh is None:
                    for c3, b3, s3, _ in _riff_chunks(
                        payload, b2 + 4, b2 + s2
                    ):
                        if c3 == b"strh" and strh is None:
                            strh = payload[b3 : b3 + s3]
                        elif c3 == b"strf" and strf is None:
                            strf = payload[b3 : b3 + s3]
        elif cc == b"LIST" and sub == b"movi":
            movi = (body + 4, body + size)
    if avih is None or len(avih) < 40:
        raise ValueError("AVI missing its avih header")
    if strh is None or len(strh) < 32 or movi is None:
        raise ValueError("AVI missing its stream header or movi list")
    micro_per_frame, _, _, _flags, total_frames = struct.unpack(
        "<IIIII", avih[:20]
    )
    aw, ah = struct.unpack("<II", avih[32:40])
    if strh[:4] != b"vids":
        raise ValueError(
            f"AVI first stream is {strh[:4]!r}, not a video stream"
        )
    handler = strh[4:8]
    if strf is None or len(strf) < 20:
        raise ValueError("AVI video stream missing its BITMAPINFOHEADER")
    compression = strf[16:20]
    if handler not in (b"MJPG", b"mjpg", b"\x00\x00\x00\x00") or \
            compression not in (b"MJPG", b"mjpg"):
        raise ValueError(
            f"unsupported AVI codec (handler {handler!r}, compression"
            f" {compression!r}); MJPEG only — no fake fallback"
        )
    fps = 1e6 / micro_per_frame if micro_per_frame else 0.0
    frames = []
    for cc, body, size, _sub in _riff_chunks(payload, movi[0], movi[1]):
        if cc[2:4] in (b"dc", b"db") and cc[:2].isdigit():
            if cc[:2] != b"00":
                continue  # frames of other streams
            w, h, arr = decode_jpeg(payload[body : body + size])
            if (w, h) != (aw, ah):
                raise ValueError(
                    f"AVI frame geometry {w}x{h} disagrees with the"
                    f" container's {aw}x{ah}"
                )
            frames.append((w, h, arr))
    if total_frames != len(frames):
        raise ValueError(
            f"AVI declares {total_frames} frames but its movi list"
            f" carries {len(frames)}"
        )
    if not frames:
        raise ValueError("AVI has no frames")
    return fps, frames


def encode_avi_mjpeg(frames, fps: int = 10) -> bytes:
    """MJPEG AVI writer twin: ``frames`` is a list of JPEG byte
    strings (already encoded — the caller controls the construction)
    that must share one geometry, probed from the first frame's SOF."""
    from datafusion_loki_spark.operators.jpeg import decode_jpeg as _dec

    if not frames:
        raise ValueError("encode_avi_mjpeg needs at least one frame")
    w, h, _ = _dec(frames[0])

    def chunk(cc: bytes, body: bytes) -> bytes:
        out = cc + struct.pack("<I", len(body)) + body
        if len(body) & 1:
            out += b"\x00"
        return out

    def lst(sub: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", sub + body)

    avih = struct.pack(
        "<IIIIIIIIII",
        1_000_000 // fps, 0, 0, 0x10, len(frames),
        0, 1, 0, w, h,
    ) + b"\x00" * 16
    strh = (
        b"vids" + b"MJPG" + struct.pack(
            "<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames),
            0, 0, 0,
        ) + struct.pack("<hhhh", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, 0, 0, 0, 0, 0
    )
    # biCompression = 'MJPG' fourcc at offset 16
    strf = strf[:16] + b"MJPG" + strf[20:]
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi_body = b"".join(chunk(b"00dc", fb) for fb in frames)
    movi = lst(b"movi", movi_body)
    # idx1: one entry per frame (fourcc, flags=KEYFRAME, offset from
    # the movi subtype, length) — present for real-player parity
    idx = bytearray()
    off = 4
    for fb in frames:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(fb))
        off += 8 + len(fb) + (len(fb) & 1)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", bytes(idx))
    return b"RIFF" + struct.pack("<I", len(body)) + body
