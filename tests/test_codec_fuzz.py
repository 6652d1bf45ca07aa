"""Cross-codec mutation fuzz (round 13): the fail-loud contract says a
malformed stream raises ValueError with the decoder's own message —
NEVER an IndexError / struct.error / numpy exception leaking from the
guts (those read as crashes to a pipeline and carry no diagnosis).
Deterministic seeds; the round-13 sweep found exactly one escape
(TIFF zero-count tag -> IndexError), fixed and pinned here."""

from __future__ import annotations

import random

import numpy as np
import pytest

from datafusion_loki_spark.operators.gif import (
    decode_gif,
    decode_gif_frames,
    encode_gif,
    encode_gif_frames,
)
from datafusion_loki_spark.operators.jpeg import decode_jpeg, encode_jpeg
from datafusion_loki_spark.operators.multimodal import (
    decode_bmp,
    decode_pbm,
    decode_pgm,
    decode_png,
    decode_png_frames,
    encode_bmp8,
    encode_bmp_packed,
    encode_png,
    encode_png_frames,
)
from datafusion_loki_spark.operators.tiff import decode_tiff, encode_tiff
from datafusion_loki_spark.operators.wav import (
    decode_au,
    decode_wav,
    encode_au,
    encode_wav,
    encode_wav_adpcm,
    encode_wav_g711,
    encode_wav_ms_adpcm,
)
from datafusion_loki_spark.operators.avi import (
    decode_avi_frames,
    encode_avi_mjpeg,
)
from datafusion_loki_spark.operators.webp import (
    decode_webp,
    decode_webp_frames,
    encode_webp_anim,
    encode_webp_lossless,
)

_RNG = np.random.RandomState(0)
_PX = _RNG.randint(0, 256, (5, 7, 3)).astype(np.uint8)
_PAL = _RNG.randint(0, 256, (16, 3)).astype(np.uint8)
_SAMPLES = _RNG.randint(-32768, 32768, (20, 2)).astype(np.int16)

_SEEDS = {
    "png": (encode_png(_PX), decode_png),
    # round 15: the Netpbm gray/bitmap members (header walk, packed
    # rows) under mutation
    "pgm": (
        b"P5 7 5 255\n# c\n" + bytes(_PX[:, :, 1].reshape(-1)),
        decode_pgm,
    ),
    "pbm": (
        b"P4 7 5\n" + bytes(np.packbits(_PX[:, :, 2] % 2, axis=1)),
        decode_pbm,
    ),
    # round 15: APNG — acTL/fcTL/fdAT walk, sequence numbers, per-frame
    # sub-PNG reassembly, compositing bookkeeping under mutation
    "apng": (
        encode_png_frames(
            [
                {"px": np.dstack([_PX, np.full((5, 7), 255, np.uint8)])},
                {
                    "px": np.dstack(
                        [_PX[:2, :2], np.full((2, 2), 255, np.uint8)]
                    ),
                    "pos": (2, 2),
                    "dispose": 1,
                },
            ]
        ),
        decode_png_frames,
    ),
    "jpeg": (encode_jpeg(_PX[:, :, 0]), decode_jpeg),
    "jpeg_prog": (
        encode_jpeg(_PX[:, :, 0], progressive=True, restart_interval=2),
        decode_jpeg,
    ),
    "gif": (
        encode_gif(_PX[:, :, 0].astype(np.int64) % 16, _PAL, interlace=True),
        decode_gif,
    ),
    "gif_frames": (
        encode_gif_frames(
            [
                {"idx": _PX[:, :, 0].astype(np.int64) % 16},
                {
                    "idx": _PX[:2, :3, 0].astype(np.int64) % 16,
                    "pos": (1, 1),
                    "transparent": 0,
                    "disposal": 3,
                },
            ],
            _PAL,
            loop=True,
        ),
        decode_gif_frames,
    ),
    "tiff": (
        encode_tiff(_PX, big_endian=True, rows_per_strip=2, packbits=True),
        decode_tiff,
    ),
    # round 14: the LZW + predictor branch (MSB codes, EarlyChange,
    # cumsum undo) gets its own mutation corpus
    "tiff_lzw": (
        encode_tiff(_PX, rows_per_strip=3, lzw=True, predictor=True),
        decode_tiff,
    ),
    # round 14 (late session): palette + deflate (photometric 3 /
    # Compression 8) — ColorMap offsets/counts and zlib strips under
    # mutation
    "tiff_palette": (
        encode_tiff(
            (_PX[:, :, 0] % 16).astype(np.uint8),
            palette=np.vstack([_PAL, np.zeros((240, 3), np.uint8)]),
            rows_per_strip=2,
            deflate=True,
        ),
        decode_tiff,
    ),
    # late round 14: the tiled organization — tile bookkeeping, padded
    # edge tiles, per-tile predictor under mutation
    "tiff_tiled": (
        encode_tiff(
            np.tile(_PX, (5, 4, 1))[:20, :17],
            tile=(16, 16), lzw=True, predictor=True,
        ),
        decode_tiff,
    ),
    # round 14 (late session): planar configuration 2 — per-plane strip
    # bookkeeping under mutation
    "tiff_planar": (
        encode_tiff(_PX, planar=True, rows_per_strip=2, deflate=True),
        decode_tiff,
    ),
    # round 15: JPEG-in-TIFF (Compression 7) — the JPEGTables tag-7
    # read, the SOI+tables+body merge, and the per-strip entropy
    # decode under mutation
    "tiff_jpeg": (
        encode_tiff(
            np.repeat(np.repeat(_PX[:, :, 0], 8, 0), 8, 1),
            jpeg=True, jpeg_tables=True, rows_per_strip=16,
        ),
        decode_tiff,
    ),
    "wav": (
        encode_wav(_SAMPLES, 8000, extra_chunk=(b"LIST", b"abc")),
        decode_wav,
    ),
    # round 15: Sun AU — big-endian header words, annotation offset
    # skip, unknown-size marker under mutation
    "au": (
        encode_au(
            bytes(_PX[:, :, 0].reshape(-1)[:30]), 8000, 1,
            annotation=b"meta",
        ),
        decode_au,
    ),
    # round 14: the IEEE-float (format tag 3) branch
    "wav_float": (
        encode_wav(
            np.asarray(_SAMPLES, dtype=np.float32),
            8000,
            bits=32,
            extra_chunk=(b"fact", b"\x28\x00\x00\x00"),
        ),
        decode_wav,
    ),
    "bmp_rle8": (
        encode_bmp8(_PX[:, :, 0].astype(np.uint8) % 16, _PAL, rle=True),
        decode_bmp,
    ),
    # late round 14: the sub-byte layouts — 4-bit BI_RLE4 and packed
    # 1-bit rows under mutation
    "bmp_rle4": (
        encode_bmp_packed(
            _PX[:, :, 0].astype(np.uint8) % 16, _PAL, bpp=4, rle=True
        ),
        decode_bmp,
    ),
    "bmp_1bit": (
        encode_bmp_packed(
            _PX[:, :, 0].astype(np.uint8) % 2, _PAL[:2], bpp=1
        ),
        decode_bmp,
    ),
    # round 14 (late session): the IMA ADPCM branch (format tag 0x11 —
    # block headers, nibble words, fact trimming)
    "wav_adpcm": (
        encode_wav_adpcm(_SAMPLES // 4, 8000, block_words=2),
        decode_wav,
    ),
    # late round 14: G.711 mu-law framing under mutation (the table
    # expansion itself is total — every byte decodes — so the fuzz
    # targets the RIFF/fmt validation around it)
    "wav_g711": (
        encode_wav_g711(bytes(_PX[:, :, 0].reshape(-1)[:30]), 8000,
                        law="alaw", channels=2),
        decode_wav,
    ),
    # late round 14: MS-ADPCM (tag 2) — coefficient table, block
    # headers, signed high-first nibbles under mutation
    "wav_msadpcm": (
        encode_wav_ms_adpcm(_SAMPLES // 4, 8000, block_words=4,
                            predictor=1),
        decode_wav,
    ),
    # round 14 (late session): WAVE_FORMAT_EXTENSIBLE wrapping 24-bit
    # PCM — GUID validation, valid-bits check, 3-byte frame widening
    "wav_ext24": (
        encode_wav(
            (_SAMPLES.astype(np.int32) << 7), 8000, bits=24,
            extensible=True,
        ),
        decode_wav,
    ),
    # round 14 (late session): VP8L — prefix-code tables, LZ77,
    # color cache, and the transform chain under mutation
    "webp": (
        encode_webp_lossless(
            np.repeat(_PX, 2, axis=1), cache_bits=4, lz77=True,
            subtract_green=True,
        ),
        decode_webp,
    ),
    # round 15: the VP8X/ANIM/ANMF animation container — chunk walk,
    # frame geometry/subchunk framing, compositing bookkeeping under
    # mutation
    "webp_anim": (
        encode_webp_anim(
            [
                {"px": np.dstack([_PX, np.full((5, 7), 255, np.uint8)])},
                {
                    "px": np.dstack(
                        [_PX[:2, :2], np.full((2, 2), 255, np.uint8)]
                    ),
                    "pos": (2, 2),
                    "dispose": 1,
                },
            ],
            bg=(1, 2, 3, 255),
        ),
        decode_webp_frames,
    ),
    # late round 14: the MJPEG AVI container — RIFF/LIST framing,
    # header consistency, per-frame JPEG under mutation
    "avi_mjpeg": (
        encode_avi_mjpeg(
            [
                encode_jpeg(
                    np.repeat(np.repeat(_PX[:3, :4, 0], 8, 0), 8, 1)
                )
            ]
            * 2
        ),
        lambda b: decode_avi_frames(b),
    ),
    "webp_palette": (
        encode_webp_lossless(
            (_PX[:, :, 0] % 16).astype(np.uint8),
            palette=np.hstack(
                [_PAL, np.full((16, 1), 255, np.uint8)]
            ),
            meta_bits=2,
        ),
        decode_webp,
    ),
}


@pytest.mark.parametrize("name", sorted(_SEEDS))
def test_mutated_streams_fail_with_valueerror_only(name):
    blob, dec = _SEEDS[name]
    r = random.Random(13)
    for _ in range(1500):
        b = bytearray(blob)
        for _ in range(r.randint(1, 5)):
            op = r.random()
            if op < 0.45 and len(b) > 1:
                b[r.randrange(len(b))] = r.randrange(256)
            elif op < 0.65 and len(b) > 4:
                del b[r.randrange(len(b))]
            elif op < 0.85:
                b.insert(r.randrange(len(b) + 1), r.randrange(256))
            elif len(b) > 8:
                # splice a chunk from elsewhere (the op that found the
                # JPEG SOF struct.error — segment-length confusions)
                i, j = sorted((r.randrange(len(b)), r.randrange(len(b))))
                b[r.randrange(len(b)):][:0] = b[i:j][:16]
        try:
            dec(bytes(b))  # decoding to SOMETHING is fine; crashing is not
        except ValueError:
            pass  # the loud contract


def test_tiff_zero_count_tag_is_loud():
    # the round-13 fuzz catch, pinned as a crafted case: zero out the
    # ImageLength tag's count field — must be 'zero values', not an
    # IndexError on [0]
    import struct

    blob = bytearray(encode_tiff(_PX))
    i = blob.index(struct.pack("<HHI", 257, 4, 1))
    struct.pack_into("<I", blob, i + 4, 0)
    with pytest.raises(ValueError, match="zero values"):
        decode_tiff(bytes(blob))
