"""Baseline TIFF codec — pure stdlib + numpy, no codec library.

Round 13: TIFF leaves the PIL-gated list (decode_image's loud gate now
covers only WebP/AVIF-class formats). Per the public TIFF 6.0
specification (Adobe, 1992): both byte orders ('II' little / 'MM'
big), the first IFD's tag walk (SHORT/LONG value reading, inline
vs offset-addressed values), strip assembly via StripOffsets /
StripByteCounts / RowsPerStrip, chunky planar layout, 8-bit grayscale
(photometric 0 WhiteIsZero — inverted per spec — and 1 BlackIsZero)
RGB (photometric 2) and palette-color (photometric 3 via the ColorMap
tag, 16-bit entries mapped to 8-bit by their high byte — round 14),
Compression 1 (none), 5 (LZW, spec section 13 — round 14, MSB-first
codes with the EarlyChange width discipline), 8 / 32946 (zlib deflate
per TIFF Technical Note 2 — round 14, output bounded at the expected
strip size so a crafted stream cannot balloon) and 32773 (PackBits,
spec section 9), horizontal predictor (tag 317 = 2, spec section 14 —
round 14), both planar configurations (chunky and planar=2 separate
sample planes, all of sample 0's strips first — round 14), and the
TILED organization (spec section 15 — late round 14: 16-multiple tile
geometry, full-size zero-padded edge tiles, per-tile compression with
the predictor context restarting at each tile row). Round 15 adds new-style
JPEG-in-TIFF (Compression 7 + JPEGTables per Technical Note 2) and
the tiled planar-2 combination. Everything else —
old-style JPEG, sample depths other than 8 — fails with
a loud ValueError, never a fake fallback (decode_image contract).

The encoder twin constructs valid inputs for tests and the registry
face (multimodal.mm_decode_tiff): either endian, configurable
RowsPerStrip, optional PackBits (a REAL run/literal compressor, so
round trips exercise both branch types and the -128 noop is covered by
crafted streams).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# tag ids (TIFF 6.0 section 8)
_T_WIDTH = 256
_T_HEIGHT = 257
_T_BITS = 258
_T_COMPRESSION = 259
_T_PHOTOMETRIC = 262
_T_STRIP_OFFSETS = 273
_T_SPP = 277
_T_ROWS_PER_STRIP = 278
_T_STRIP_COUNTS = 279
_T_PLANAR = 284
_T_PREDICTOR = 317
_T_COLORMAP = 320
_T_TILE_WIDTH = 322
_T_TILE_LENGTH = 323
_T_TILE_OFFSETS = 324
_T_TILE_COUNTS = 325
_T_JPEG_TABLES = 347  # TIFF Technical Note 2 (Compression 7)


def _jpeg_decode_chunk(raw, expect_h, expect_w, spp, tables):
    """Decode one Compression-7 strip/tile: a complete (or, with a
    JPEGTables tag, abbreviated) JPEG interchange stream per TIFF
    Technical Note 2. With shared tables the streams merge as
    SOI + tables-body + strip-body — table segments the strip also
    carries simply re-define. Geometry must match the strip/tile
    bookkeeping exactly; a JPEG stream declaring other dimensions is
    malformed framing, not a resize request."""
    from datafusion_loki_spark.operators.jpeg import decode_jpeg

    if raw[:2] != b"\xff\xd8":
        raise ValueError("TIFF JPEG chunk missing SOI")
    if tables is not None:
        raw = b"\xff\xd8" + tables[2:-2] + raw[2:]
    w, h, arr = decode_jpeg(raw)
    if (h, w) != (expect_h, expect_w) or arr.shape[2] != spp:
        raise ValueError(
            f"TIFF JPEG chunk decodes to {h}x{w}x{arr.shape[2]},"
            f" expected {expect_h}x{expect_w}x{spp}"
        )
    return arr.tobytes()

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _packbits_decode(data: bytes, expect: int) -> bytes:
    """PackBits (TIFF 6.0 section 9): n in [0,127] copies n+1 literals,
    n in [-127,-1] repeats the next byte 1-n times, -128 is a noop.
    Decodes exactly ``expect`` bytes — loud on shortfall or overshoot
    (the GIF LZW terminator lesson: a count mismatch must surface as
    the decoder's own error)."""
    out = bytearray()
    p = 0
    while p < len(data):
        n = data[p]
        p += 1
        if n == 128:  # -128: noop
            continue
        if n < 128:
            lit = data[p : p + n + 1]
            if len(lit) != n + 1:
                raise ValueError("TIFF PackBits literal run truncated")
            out += lit
            p += n + 1
        else:
            if p >= len(data):
                raise ValueError("TIFF PackBits repeat run truncated")
            out += bytes([data[p]]) * (257 - n)
            p += 1
        if len(out) > expect:
            raise ValueError(
                f"TIFF PackBits produced {len(out)} bytes,"
                f" expected {expect}"
            )
    if len(out) != expect:
        raise ValueError(
            f"TIFF PackBits produced {len(out)} bytes, expected {expect}"
        )
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    """REAL run/literal PackBits compressor (repeat runs >= 3 bytes,
    literal runs otherwise, both capped at 128)."""
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        # measure the repeat run at i
        j = i + 1
        while j < n and j - i < 128 and data[j] == data[i]:
            j += 1
        if j - i >= 3:
            out += bytes([257 - (j - i), data[i]])
            i = j
            continue
        # literal run: scan to the next >=3 repeat, then emit in
        # <=128-byte chunks (a literal length byte must stay <= 127 —
        # 0x80 is the noop)
        lit_end = i
        while lit_end < n:
            j = lit_end + 1
            while j < n and data[j] == data[lit_end]:
                j += 1
            if j - lit_end >= 3:
                break
            lit_end = j
        for s in range(i, lit_end, 128):
            chunk = data[s : min(lit_end, s + 128)]
            out += bytes([len(chunk) - 1]) + chunk
        i = lit_end
    return bytes(out)


def _deflate_decode(data: bytes, expect: int) -> bytes:
    """Deflate-in-TIFF (Compression 8 per TIFF Technical Note 2, and
    the legacy 32946 code — both a raw zlib stream). Output is CAPPED
    at ``expect`` + 1 bytes via decompressobj's max_length, so a
    crafted high-ratio stream cannot balloon past the strip size it
    claims (the BMP RLE8 allocation-bomb lesson); shortfall, overshoot,
    trailing garbage, and zlib-level corruption are all the decoder's
    own loud ValueError."""
    dec = zlib.decompressobj()
    try:
        out = dec.decompress(data, expect + 1)
    except zlib.error as ex:
        raise ValueError(f"TIFF deflate strip malformed: {ex}") from None
    if len(out) > expect:
        raise ValueError(
            f"TIFF deflate produced more than the {expect} bytes expected"
        )
    if len(out) < expect or not dec.eof:
        raise ValueError(
            f"TIFF deflate produced {len(out)} bytes"
            f"{' (stream unfinished)' if not dec.eof else ''},"
            f" expected {expect}"
        )
    if dec.unused_data:
        raise ValueError("TIFF deflate strip carries trailing garbage")
    return out


def _lzw_decode_tiff(data: bytes, expect: int) -> bytes:
    """TIFF 6.0 section 13 LZW: MSB-first code packing (the opposite
    bit order of GIF's gif.py:_lzw_decode, same table discipline),
    ClearCode 256 / EOI 257 / first entry 258, 9->12 bit widths with
    the spec's EarlyChange off-by-one (the read width grows one entry
    earlier than the decoder's own table requires — see the inline
    sync derivation; verified by the width-boundary corpus test).
    Decodes exactly ``expect`` bytes and requires the EOI terminator —
    shortfall, overshoot, truncation, and codes past the table end are
    all the decoder's own loud errors (the round-13 GIF terminator/
    overshoot lessons carried over)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    table: list = []
    width = 9
    prev = None

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    while True:
        while nbits < width:
            if pos >= n:
                raise ValueError("TIFF LZW stream truncated")
            acc = (acc << 8) | data[pos]
            pos += 1
            nbits += 8
        nbits -= width
        code = (acc >> nbits) & ((1 << width) - 1)
        if code == EOI:
            break
        if code == CLEAR:
            reset()
            continue
        if prev is None:
            if code > 255:
                raise ValueError("TIFF LZW first code not a literal")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
        else:
            raise ValueError("TIFF LZW code past the table end")
        out += entry
        if len(out) > expect:
            raise ValueError(
                f"TIFF LZW produced {len(out)} bytes, expected {expect}"
            )
        if prev is not None and len(table) < 4096:
            # (the 4096 cap: a conforming encoder clears at 4094; a
            # foreign stream that never clears can't reference codes
            # past 4095 anyway, so further appends are dead weight)
            table.append(prev + entry[:1])
        prev = entry
        # EarlyChange sync (traced against the encoder, the GIF-family
        # off-by-one lesson): the ENCODER grows its emit width after
        # assigning entry 2^w - 2 (its next_code == 2^w - 1). The
        # decoder builds each entry one code LATER than the encoder
        # assigned it, so when the encoder's first w+1-bit code
        # arrives, the decoder has only built entries through
        # 2^w - 3 — it must grow its READ width when its table length
        # reaches 2^w - 2, one entry earlier than its own table would
        # require ("early change", TIFF 6.0 p.61 / libtiff's
        # maxcode-1 decoder asymmetry).
        if len(table) == (1 << width) - 2 and width < 12:
            width += 1
    if len(out) != expect:
        raise ValueError(
            f"TIFF LZW produced {len(out)} bytes, expected {expect}"
        )
    return bytes(out)


def _lzw_encode_tiff(data: bytes) -> bytes:
    """TIFF LZW compressor twin: MSB-first puts, leading ClearCode,
    EarlyChange width bumps mirroring the decoder, table flush via
    ClearCode when the next assignment would reach 4094 (the spec's
    recommended reset point), trailing EOI, 0-padded tail byte (the
    pad bits are never read back: EOI gates the decode)."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code, width):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
        acc &= (1 << nbits) - 1

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    put(CLEAR, width)
    prev = b""
    for b in data:
        cur = prev + bytes([b])
        if cur in table:
            prev = cur
            continue
        put(table[prev], width)
        table[cur] = next_code
        next_code += 1
        # decoder's table is one entry BEHIND the encoder's (it can't
        # build an entry until it has seen the next code), so its
        # EarlyChange fires when len(table) == 2^w - 1 exactly as
        # next_code reaches 2^w - 1 here
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
        if next_code == 4094:
            put(CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        prev = bytes([b])
    if prev:
        put(table[prev], width)
        # the decoder builds one more table entry while processing
        # this final code and applies its EarlyChange check BEFORE
        # reading EOI — mirror it (libtiff's LZWPostEncode bumps
        # free_ent after the flushed code for exactly this reason;
        # late-round-14 catch: a tile-sized payload landed the width
        # boundary precisely between the last data code and EOI, and
        # the un-grown EOI read back as a truncated stream)
        next_code += 1
        if next_code == (1 << width) - 1 and width < 12:
            width += 1
    put(EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _tiff_endian(payload: bytes) -> str:
    if payload[:4] == b"II\x2a\x00":
        return "<"
    if payload[:4] == b"MM\x00\x2a":
        return ">"
    raise ValueError("not a TIFF (byte-order/42 signature missing)")


def decode_tiff(payload: bytes):
    """Decode the FIRST IFD of a baseline TIFF. Returns (width, height,
    uint8 ndarray (h, w, c)) with c = 1 (grayscale, WhiteIsZero
    inverted per spec) or 3 (RGB). Loud ValueError on malformed or
    unsupported layouts. (decode_tiff_pages walks the whole IFD chain —
    round 13, the multi-page scanned-document shape.)"""
    e = _tiff_endian(payload)
    if len(payload) < 8:
        raise ValueError("TIFF header truncated")
    (ifd_off,) = struct.unpack(e + "I", payload[4:8])
    w, h, arr, _nxt = _decode_ifd(payload, e, ifd_off)
    return w, h, arr


def decode_tiff_pages(payload: bytes):
    """Decode EVERY page of a multi-page TIFF by walking the IFD chain
    (round 13). Returns a list of (width, height, uint8 ndarray)
    triples in chain order. Loud on malformed chains, incl. pointer
    CYCLES (each next-IFD offset must be strictly new) and an
    unreasonable page count (the chain is bounded by the payload: every
    IFD occupies >= 14 distinct bytes)."""
    e = _tiff_endian(payload)
    if len(payload) < 8:
        raise ValueError("TIFF header truncated")
    (ifd_off,) = struct.unpack(e + "I", payload[4:8])
    pages = []
    seen = set()
    while ifd_off != 0:
        if ifd_off in seen:
            raise ValueError("TIFF IFD chain contains a cycle")
        if len(seen) * 14 > len(payload):
            raise ValueError("TIFF IFD chain longer than the payload allows")
        seen.add(ifd_off)
        w, h, arr, ifd_off = _decode_ifd(payload, e, ifd_off)
        pages.append((w, h, arr))
    if not pages:
        raise ValueError("TIFF has no pages")
    return pages


def _decode_ifd(payload: bytes, e: str, ifd_off: int):
    """One IFD: tag walk, strip assembly, PackBits. Returns (w, h,
    (h, w, c) uint8 array, next_ifd_offset)."""

    def read_tag_values(ttype, count, raw):
        if ttype == 3:
            fmt, size = "H", 2
        elif ttype == 4:
            fmt, size = "I", 4
        elif ttype in (1, 7):  # BYTE / UNDEFINED (JPEGTables)
            fmt, size = "B", 1
        else:
            raise ValueError(f"unsupported TIFF tag type {ttype}")
        total = size * count
        if total <= 4:
            buf = raw[:total]
        else:
            (off,) = struct.unpack(e + "I", raw)
            buf = payload[off : off + total]
            if len(buf) < total:
                raise ValueError("TIFF tag value block truncated")
        return list(struct.unpack(e + fmt * count, buf))

    if ifd_off + 2 > len(payload):
        raise ValueError("TIFF IFD offset out of range")
    (n_tags,) = struct.unpack(e + "H", payload[ifd_off : ifd_off + 2])
    tags = {}
    for k in range(n_tags):
        base = ifd_off + 2 + 12 * k
        ent = payload[base : base + 12]
        if len(ent) < 12:
            raise ValueError("TIFF IFD entry truncated")
        tag, ttype, count = struct.unpack(e + "HHI", ent[:8])
        tags[tag] = (ttype, count, ent[8:12])

    def tag_vals(tag, default=None):
        if tag not in tags:
            if default is not None:
                return default
            raise ValueError(f"TIFF missing required tag {tag}")
        ttype, count, raw = tags[tag]
        if count == 0:
            # a present-but-empty tag is malformed, not missing — the
            # callers index [0] (fuzz-found IndexError escape)
            raise ValueError(f"TIFF tag {tag} has zero values")
        return read_tag_values(ttype, count, raw)

    w = tag_vals(_T_WIDTH)[0]
    h = tag_vals(_T_HEIGHT)[0]
    if w == 0 or h == 0:
        raise ValueError("malformed TIFF dimensions")
    spp = tag_vals(_T_SPP, [1])[0]
    bits = tag_vals(_T_BITS, [8])
    photometric = tag_vals(_T_PHOTOMETRIC)[0]
    compression = tag_vals(_T_COMPRESSION, [1])[0]
    planar = tag_vals(_T_PLANAR, [1])[0]
    predictor = tag_vals(_T_PREDICTOR, [1])[0]
    if any(b != 8 for b in bits) or len(bits) not in (1, spp):
        raise ValueError(f"unsupported TIFF sample depth {bits} (8-bit only)")
    if planar not in (1, 2):
        raise ValueError(
            f"unsupported TIFF planar configuration {planar}"
            " (chunky/planar only)"
        )
    if compression not in (1, 5, 7, 8, 32773, 32946):
        raise ValueError(
            f"unsupported TIFF compression {compression}"
            " (none/LZW/JPEG/deflate/PackBits only); no fake fallback"
        )
    if predictor not in (1, 2):
        raise ValueError(
            f"unsupported TIFF predictor {predictor}"
            " (none/horizontal only); no fake fallback"
        )
    jtables = None
    if compression == 7:
        # new-style JPEG (TIFF Technical Note 2, round 15). The
        # decoded values follow the JPEG stream's JFIF conventions:
        # photometric 6 streams are YCbCr on the wire and return as
        # RGB (the standard libtiff JPEGCOLORMODE_RGB reading);
        # photometric 2 would mean the stream codes RGB WITHOUT the
        # color transform, which this decoder's JFIF conversion would
        # silently mangle — loud instead of wrong.
        if predictor != 1:
            raise ValueError("TIFF predictor with JPEG compression")
        if planar != 1:
            raise ValueError("planar JPEG-in-TIFF is not supported")
        if photometric not in (1, 6) or spp != (1 if photometric == 1 else 3):
            raise ValueError(
                f"JPEG-in-TIFF photometric {photometric}/spp {spp}"
                " unsupported (grayscale 1 or YCbCr 6 only)"
            )
        if _T_JPEG_TABLES in tags:
            jtables = bytes(tag_vals(_T_JPEG_TABLES))
            if (
                len(jtables) < 4
                or jtables[:2] != b"\xff\xd8"
                or jtables[-2:] != b"\xff\xd9"
            ):
                raise ValueError(
                    "TIFF JPEGTables is not an SOI..EOI table stream"
                )
    cmap = None
    if photometric in (0, 1):
        if spp != 1:
            raise ValueError("grayscale TIFF with SamplesPerPixel != 1")
    elif photometric == 2:
        if spp != 3:
            raise ValueError("RGB TIFF with SamplesPerPixel != 3")
    elif photometric == 6:
        if compression != 7:
            raise ValueError(
                "YCbCr photometric is only supported with JPEG"
                " compression"
            )
    elif photometric == 3:
        if spp != 1:
            raise ValueError("palette TIFF with SamplesPerPixel != 1")
        cm = tag_vals(_T_COLORMAP)
        # 3 * 2^BitsPerSample 16-bit entries (TIFF 6.0 section 5), laid
        # out as all reds, all greens, all blues; mapped to 8-bit by the
        # high byte (the spec scales full white to 65535)
        if len(cm) != 3 * 256:
            raise ValueError(
                f"TIFF ColorMap holds {len(cm)} values, expected {3 * 256}"
            )
        if any(v > 0xFFFF or v < 0 for v in cm):
            raise ValueError("TIFF ColorMap value out of 16-bit range")
        cmap = (
            np.asarray(cm, dtype=np.uint16).reshape(3, 256) >> 8
        ).astype(np.uint8)
    else:
        raise ValueError(
            f"unsupported TIFF photometric {photometric}"
            " (gray/RGB/palette only)"
        )
    if _T_TILE_WIDTH in tags:  # tiled organization (late round 14)
        tw = tag_vals(_T_TILE_WIDTH)[0]
        tl = tag_vals(_T_TILE_LENGTH)[0]
        # TIFF 6.0 section 15: tile dimensions must be multiples of 16
        if tw == 0 or tl == 0 or tw % 16 or tl % 16:
            raise ValueError(
                f"malformed TIFF tile geometry {tw}x{tl}"
                " (16-multiples required)"
            )
        toffs = tag_vals(_T_TILE_OFFSETS)
        tcounts = tag_vals(_T_TILE_COUNTS)
        across = -(-w // tw)
        down = -(-h // tl)
        # planar=2 (round 15): each sample in its own plane of tiles,
        # all of sample 0's tiles first (TIFF 6.0 section 15 follows
        # the strip rule of section 8); tiles then carry ONE sample
        n_planes_t = spp if planar == 2 else 1
        per_plane_t = across * down
        n_tiles = per_plane_t * n_planes_t
        if len(toffs) != n_tiles or len(tcounts) != n_tiles:
            raise ValueError(
                f"TIFF tile bookkeeping mismatch: {len(toffs)} offsets /"
                f" {len(tcounts)} counts for {n_tiles} tiles"
            )
        tspp = spp // n_planes_t
        tbytes = tw * tl * tspp  # tiles are FULL size, edges padded
        canvas = np.zeros((h, w, spp), dtype=np.uint8)
        for ti in range(n_tiles):
            raw = payload[toffs[ti] : toffs[ti] + tcounts[ti]]
            if len(raw) < tcounts[ti]:
                raise ValueError(f"TIFF tile {ti} truncated")
            if compression == 32773:
                raw = _packbits_decode(raw, tbytes)
            elif compression == 5:
                raw = _lzw_decode_tiff(raw, tbytes)
            elif compression == 7:
                raw = _jpeg_decode_chunk(raw, tl, tw, spp, jtables)
            elif compression in (8, 32946):
                raw = _deflate_decode(raw, tbytes)
            elif len(raw) != tbytes:
                raise ValueError(
                    f"TIFF tile {ti} holds {len(raw)} bytes,"
                    f" expected {tbytes}"
                )
            tile = np.frombuffer(raw, dtype=np.uint8).reshape(tl, tw, tspp)
            if predictor == 2:
                # horizontal differencing restarts at each TILE row —
                # undoing it across assembled image rows would bleed
                # deltas between horizontally adjacent tiles
                tile = (
                    np.cumsum(tile.astype(np.uint32), axis=1) % 256
                ).astype(np.uint8)
            k = ti % per_plane_t
            plane = ti // per_plane_t
            y0 = (k // across) * tl
            x0 = (k % across) * tw
            ys, xs = min(tl, h - y0), min(tw, w - x0)
            if planar == 2 and spp > 1:
                canvas[y0 : y0 + tl, x0 : x0 + tw, plane] = tile[
                    :ys, :xs, 0
                ]
            else:
                canvas[y0 : y0 + tl, x0 : x0 + tw] = tile[:ys, :xs]
        arr = canvas
        if photometric == 0:
            arr = (255 - arr.astype(np.int16)).astype(np.uint8)
        elif photometric == 3:
            idx = arr[:, :, 0]
            arr = np.stack(
                [cmap[0][idx], cmap[1][idx], cmap[2][idx]], axis=-1
            )
        nxt_pos = ifd_off + 2 + 12 * n_tags
        nxt_raw = payload[nxt_pos : nxt_pos + 4]
        if len(nxt_raw) < 4:
            raise ValueError("TIFF next-IFD pointer truncated")
        (next_ifd,) = struct.unpack(e + "I", nxt_raw)
        return w, h, arr, next_ifd
    rows_per_strip = tag_vals(_T_ROWS_PER_STRIP, [h])[0]
    if rows_per_strip == 0:
        raise ValueError("malformed TIFF RowsPerStrip 0")
    offsets = tag_vals(_T_STRIP_OFFSETS)
    counts = tag_vals(_T_STRIP_COUNTS)
    per_plane = -(-h // rows_per_strip)
    # planar=2 (round 14): each sample stored in its own plane of
    # strips — StripOffsets holds SamplesPerPixel * StripsPerImage
    # entries, all of sample 0's strips first (TIFF 6.0 section 8,
    # PlanarConfiguration); strip stride is then ONE sample per pixel
    n_planes = spp if planar == 2 else 1
    n_strips = per_plane * n_planes
    if len(offsets) != n_strips or len(counts) != n_strips:
        raise ValueError(
            f"TIFF strip bookkeeping mismatch: {len(offsets)} offsets /"
            f" {len(counts)} counts for {n_strips} strips"
        )
    stride = w * (spp // n_planes)

    def read_strips(strip_ids):
        out = bytearray()
        for s in strip_ids:
            rows = min(
                rows_per_strip, h - (s % per_plane) * rows_per_strip
            )
            raw = payload[offsets[s] : offsets[s] + counts[s]]
            if len(raw) < counts[s]:
                raise ValueError(f"TIFF strip {s} truncated")
            if compression == 32773:
                raw = _packbits_decode(raw, rows * stride)
            elif compression == 5:
                raw = _lzw_decode_tiff(raw, rows * stride)
            elif compression == 7:
                raw = _jpeg_decode_chunk(raw, rows, w, spp, jtables)
            elif compression in (8, 32946):
                raw = _deflate_decode(raw, rows * stride)
            elif len(raw) != rows * stride:
                raise ValueError(
                    f"TIFF strip {s} holds {len(raw)} bytes,"
                    f" expected {rows * stride}"
                )
            out += raw
        return bytes(out)

    if planar == 2 and spp > 1:
        planes = [
            np.frombuffer(
                read_strips(range(p * per_plane, (p + 1) * per_plane)),
                dtype=np.uint8,
            ).reshape(h, w)
            for p in range(spp)
        ]
        arr = np.stack(planes, axis=-1)
    else:
        arr = np.frombuffer(
            read_strips(range(per_plane)), dtype=np.uint8
        ).reshape(h, w, spp)
    if predictor == 2:
        # horizontal differencing (TIFF 6.0 section 14): samples after
        # the first in each row are deltas from the previous pixel's
        # same channel, mod 256 — undone BEFORE any photometric work
        # (channel == plane under planar=2, so axis-1 cumsum holds in
        # both layouts)
        arr = (
            np.cumsum(arr.astype(np.uint32), axis=1) % 256
        ).astype(np.uint8)
    if photometric == 0:  # WhiteIsZero: invert per spec
        arr = (255 - arr.astype(np.int16)).astype(np.uint8)
    elif photometric == 3:  # palette lookup: indices -> RGB
        idx = arr[:, :, 0]
        arr = np.stack(
            [cmap[0][idx], cmap[1][idx], cmap[2][idx]], axis=-1
        )
    nxt_pos = ifd_off + 2 + 12 * n_tags
    nxt_raw = payload[nxt_pos : nxt_pos + 4]
    if len(nxt_raw) < 4:
        raise ValueError("TIFF next-IFD pointer truncated")
    (next_ifd,) = struct.unpack(e + "I", nxt_raw)
    return w, h, arr, next_ifd


def _split_jpeg_tables(stream: bytes):
    """Split a complete JPEG interchange stream into (tables_stream,
    abbreviated_stream) per TIFF Technical Note 2: DQT/DHT segments
    move to an SOI..EOI table-specification stream (the JPEGTables tag
    body); everything else — SOF, DRI, the SOS and its entropy tail —
    stays in the abbreviated per-strip stream."""
    if stream[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    tables = bytearray(b"\xff\xd8")
    body = bytearray(b"\xff\xd8")
    i = 2
    while True:
        if i + 4 > len(stream) or stream[i] != 0xFF:
            raise ValueError("bad JPEG segment framing")
        marker = stream[i + 1]
        if marker == 0xDA:  # SOS: entropy data through EOI
            body += stream[i:]
            break
        (ln,) = struct.unpack(">H", stream[i + 2 : i + 4])
        seg = stream[i : i + 2 + ln]
        if marker in (0xDB, 0xC4):
            tables += seg
        else:
            body += seg
        i += 2 + ln
    tables += b"\xff\xd9"
    return bytes(tables), bytes(body)


def encode_tiff(
    arr,
    big_endian: bool = False,
    rows_per_strip: "int | None" = None,
    packbits: bool = False,
    lzw: bool = False,
    deflate: bool = False,
    predictor: bool = False,
    palette=None,
    planar: bool = False,
    tile: "tuple | None" = None,
    jpeg: bool = False,
    jpeg_tables: bool = False,
) -> bytes:
    """TIFF writer for (h, w) grayscale (BlackIsZero) or (h, w, 3) RGB
    uint8 arrays — either byte order, configurable strip height,
    optional PackBits, LZW or deflate (round 14), optional horizontal
    predictor, optional 256-entry palette (round 14: ``arr`` becomes
    photometric-3 indices; ``palette`` is (256, 3) uint8, written as
    the spec's 16-bit ColorMap via v * 257 so the high-byte read-back
    is exact)."""
    return encode_tiff_pages(
        [arr],
        big_endian=big_endian,
        rows_per_strip=rows_per_strip,
        packbits=packbits,
        lzw=lzw,
        deflate=deflate,
        predictor=predictor,
        palette=palette,
        planar=planar,
        tile=tile,
        jpeg=jpeg,
        jpeg_tables=jpeg_tables,
    )


def encode_tiff_pages(
    arrs,
    big_endian: bool = False,
    rows_per_strip: "int | None" = None,
    packbits: bool = False,
    lzw: bool = False,
    deflate: bool = False,
    predictor: bool = False,
    palette=None,
    planar: bool = False,
    tile: "tuple | None" = None,
    jpeg: bool = False,
    jpeg_tables: bool = False,
) -> bytes:
    """Multi-page TIFF writer (round 13 — decode_tiff_pages' twin):
    one IFD per array, chained through the next-IFD pointers; pages may
    mix grayscale and RGB. Shared options apply to every page.
    ``lzw`` writes Compression 5 (round 14); ``deflate`` writes
    Compression 8 (round 14, TIFF Technical Note 2); ``predictor``
    applies horizontal differencing (tag 317 = 2) before compression —
    the dominant real-world scanned/geo TIFF layout is LZW + predictor.
    ``palette`` (round 14) switches every page to photometric 3: pages
    must then be single-channel index arrays and the shared (256, 3)
    uint8 palette is written as each page's 16-bit ColorMap.
    ``planar`` (round 14) writes PlanarConfiguration 2: each sample in
    its own plane of strips, all of sample 0's strips first.
    ``tile`` = (tile_width, tile_length) (late round 14) switches the
    page to the TILED organization (TIFF 6.0 section 15): 16-multiple
    tile geometry, edge tiles zero-padded to full size, per-tile
    compression and per-tile-row predictor; composes with ``planar``
    (round 15: per-plane single-channel tiles, plane-major) but not
    ``rows_per_strip``."""
    if not arrs:
        raise ValueError("encode_tiff_pages needs at least one page")
    if packbits + lzw + deflate + jpeg > 1:
        raise ValueError(
            "pick one compression: packbits, lzw, deflate or jpeg"
        )
    if jpeg_tables and not jpeg:
        raise ValueError("jpeg_tables requires jpeg compression")
    if jpeg and (predictor or planar or palette is not None):
        raise ValueError(
            "jpeg compression is incompatible with predictor/planar/"
            "palette"
        )
    if tile is not None:
        tw_opt, tl_opt = int(tile[0]), int(tile[1])
        if tw_opt <= 0 or tl_opt <= 0 or tw_opt % 16 or tl_opt % 16:
            raise ValueError(
                f"tile geometry {tile} must be positive 16-multiples"
            )
        if rows_per_strip is not None:
            raise ValueError("pick one organization: tiles or strips")
    if palette is not None:
        palette = np.asarray(palette, dtype=np.uint8)
        if palette.shape != (256, 3):
            raise ValueError(
                f"palette must be (256, 3) uint8, got {palette.shape}"
            )
    e = ">" if big_endian else "<"

    def build_page(arr, base):
        """One page's bytes with ABSOLUTE offsets, laid out at ``base``:
        IFD + overflow value blocks + strip data. Returns (bytes,
        next_ptr_pos) — the position of the 4-byte next-IFD pointer
        inside the returned block (relative), patched by the caller."""
        arr = np.asarray(arr, dtype=np.uint8)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        if arr.ndim != 3 or arr.shape[2] not in (1, 3):
            raise ValueError(
                f"encode_tiff needs (h, w[, 1|3]), got shape {arr.shape}"
            )
        h, w, spp = arr.shape
        if palette is not None and spp != 1:
            raise ValueError(
                "palette TIFF pages must be single-channel index arrays"
            )
        if predictor and tile is None:
            # horizontal differencing: first pixel kept, the rest are
            # per-channel deltas mod 256 (decode undoes via cumsum).
            # Tiled pages skip this — their predictor context restarts
            # at each tile row and is applied inside the tile loop
            d = arr.astype(np.int16)
            d[:, 1:, :] = d[:, 1:, :] - d[:, :-1, :]
            arr = (d % 256).astype(np.uint8)
        rps = h if rows_per_strip is None else max(1, rows_per_strip)
        n_strips = -(-h // rps)
        use_planar = planar and spp > 1
        use_tiles = tile is not None
        raw_strips = []
        if use_tiles:
            # tiled organization: full-size zero-padded tiles,
            # row-major; per-tile predictor context. With planar=2
            # (round 15) each sample gets its own plane of
            # single-channel tiles, all of sample 0's tiles first
            across = -(-w // tw_opt)
            down = -(-h // tl_opt)
            padded = np.zeros(
                (down * tl_opt, across * tw_opt, spp), dtype=np.uint8
            )
            padded[:h, :w] = arr
            planes_t = (
                [padded[:, :, p : p + 1] for p in range(spp)]
                if use_planar
                else [padded]
            )
            for plane_px in planes_t:
                for ty in range(down):
                    for tx in range(across):
                        t = plane_px[
                            ty * tl_opt : (ty + 1) * tl_opt,
                            tx * tw_opt : (tx + 1) * tw_opt,
                        ]
                        if predictor:
                            d = t.astype(np.int16)
                            d[:, 1:, :] = d[:, 1:, :] - d[:, :-1, :]
                            t = (d % 256).astype(np.uint8)
                        raw_strips.append(t if jpeg else t.tobytes())
        elif use_planar:
            # planar=2: all of sample 0's strips first, then sample 1's
            for p in range(spp):
                for si in range(n_strips):
                    raw_strips.append(
                        np.ascontiguousarray(
                            arr[si * rps : (si + 1) * rps, :, p]
                        ).tobytes()
                    )
        else:
            for si in range(n_strips):
                sl = arr[si * rps : (si + 1) * rps]
                raw_strips.append(sl if jpeg else sl.tobytes())
        strips = []
        for chunk in raw_strips:
            if jpeg:
                # one complete JPEG interchange stream per strip/tile
                # (TIFF Technical Note 2); split into shared tables +
                # abbreviated bodies below when jpeg_tables is set
                from datafusion_loki_spark.operators.jpeg import (
                    encode_jpeg,
                )

                chunk = encode_jpeg(
                    chunk if chunk.shape[2] == 3 else chunk[:, :, 0]
                )
            elif packbits:
                chunk = _packbits_encode(chunk)
            elif lzw:
                chunk = _lzw_encode_tiff(chunk)
            elif deflate:
                chunk = zlib.compress(chunk)
            strips.append(chunk)
        shared_tables = None
        if jpeg and jpeg_tables:
            split = [_split_jpeg_tables(s) for s in strips]
            shared_tables = split[0][0]
            if any(t != shared_tables for t, _ in split):
                raise ValueError(
                    "jpeg_tables needs identical tables across strips"
                )
            strips = [body for _, body in split]

        entries = []  # (tag, type, values)
        photometric = (
            3
            if palette is not None
            else (6 if jpeg else 2) if spp == 3 else 1
        )
        entries.append((_T_WIDTH, 4, [w]))
        entries.append((_T_HEIGHT, 4, [h]))
        if use_tiles:
            entries.append((_T_TILE_WIDTH, 4, [tw_opt]))
            entries.append((_T_TILE_LENGTH, 4, [tl_opt]))
        entries.append((_T_BITS, 3, [8] * spp))
        entries.append(
            (
                _T_COMPRESSION,
                3,
                [
                    32773 if packbits
                    else 5 if lzw
                    else 7 if jpeg
                    else 8 if deflate
                    else 1
                ],
            )
        )
        if shared_tables is not None:
            entries.append(
                (_T_JPEG_TABLES, 7, list(shared_tables))
            )
        if predictor:
            entries.append((_T_PREDICTOR, 3, [2]))
        entries.append((_T_PHOTOMETRIC, 3, [photometric]))
        if palette is not None:
            # all reds, all greens, all blues; v * 257 = v<<8 | v, so
            # the decoder's high-byte mapping recovers v exactly
            entries.append(
                (
                    _T_COLORMAP,
                    3,
                    [
                        int(palette[i, ch]) * 257
                        for ch in range(3)
                        for i in range(256)
                    ],
                )
            )
        if use_tiles:
            entries.append(
                (_T_TILE_OFFSETS, 4, [0] * len(strips))
            )  # patched
            entries.append(
                (_T_TILE_COUNTS, 4, [len(sd) for sd in strips])
            )
        else:
            entries.append(
                (_T_STRIP_OFFSETS, 4, [0] * len(strips))
            )  # patched
            entries.append((_T_ROWS_PER_STRIP, 4, [rps]))
            entries.append(
                (_T_STRIP_COUNTS, 4, [len(sd) for sd in strips])
            )
        entries.append((_T_SPP, 3, [spp]))
        if use_planar:
            entries.append((_T_PLANAR, 3, [2]))
        entries.sort()

        ifd_size = 2 + 12 * len(entries) + 4
        overflow_off = base + ifd_size
        overflow = bytearray()

        def value_bytes(ttype, vals):
            if ttype == 7:  # UNDEFINED: raw bytes (JPEGTables)
                return bytes(vals)
            fmt = {3: "H", 4: "I"}[ttype]
            return struct.pack(e + fmt * len(vals), *vals)

        probe = 0
        for _tag, ttype, vals in entries:
            vb = value_bytes(ttype, vals)
            if len(vb) > 4:
                probe += len(vb) + (len(vb) & 1)
        data_off = overflow_off + probe
        offsets = []
        pos = data_off
        for sdata in strips:
            offsets.append(pos)
            # word-align each strip (TIFF 6.0 requires even IFD/value
            # offsets; an odd PackBits strip would otherwise leave the
            # NEXT page's IFD at an odd offset — round-14 ADVICE). The
            # pad byte sits BETWEEN strips; StripByteCounts stays the
            # real length, so readers are unaffected.
            pos += len(sdata) + (len(sdata) & 1)

        out = bytearray()
        out += struct.pack(e + "H", len(entries))
        for tag, ttype, vals in entries:
            if tag in (_T_STRIP_OFFSETS, _T_TILE_OFFSETS):
                vals = offsets
            vb = value_bytes(ttype, vals)
            out += struct.pack(e + "HHI", tag, ttype, len(vals))
            if len(vb) <= 4:
                out += vb + b"\x00" * (4 - len(vb))
            else:
                out += struct.pack(e + "I", overflow_off + len(overflow))
                overflow += vb
                if len(vb) & 1:
                    overflow += b"\x00"
        next_ptr_pos = len(out)
        out += struct.pack(e + "I", 0)  # next IFD (caller patches)
        out += overflow
        for sdata in strips:
            out += sdata
            if len(sdata) & 1:
                out += b"\x00"
        return out, next_ptr_pos

    blob = bytearray()
    blob += (b"MM\x00\x2a" if big_endian else b"II\x2a\x00")
    blob += struct.pack(e + "I", 8)  # first IFD right after the header
    base = 8
    pending_ptr = None  # absolute position of the previous page's pointer
    for arr in arrs:
        if pending_ptr is not None:
            struct.pack_into(e + "I", blob, pending_ptr, base)
        page, next_ptr_pos = build_page(arr, base)
        pending_ptr = base + next_ptr_pos
        blob += page
        base += len(page)
    return bytes(blob)
