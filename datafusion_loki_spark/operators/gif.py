"""GIF decoder — pure stdlib + numpy, no codec library.

Round 12, the decode family's lossless-compressed palette format: a
REAL byte->pixels path for GIF87a/GIF89a per the public spec (W3C/
CompuServe GIF89a specification): logical-screen + image descriptors,
global/local color tables, variable-width LSB-first LZW decompression
with dictionary growth and CLEAR/END handling, the 4-pass GIF
interlace row order, and GCE transparency (RGBA output when a
transparent index is declared). Decodes the FIRST image of a stream
(animation frames beyond the first are out of scope — loud, never a
silent partial). Unlike JPEG, GIF is lossless, so the registry face
(multimodal.mm_decode_gif) carries the same full-hash two-level
palette oracle as the palette PNG twin.

The encoder twin constructs valid inputs: a REAL dictionary-building
LZW compressor (so round-trip tests exercise code-width growth and the
4096-entry dictionary reset), optional interlace, optional transparent
index via a GCE block.
"""

from __future__ import annotations

import struct

import numpy as np

# the 4 interlace passes: (first row, row step)
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> list:
    rows = []
    for y0, dy in _INTERLACE:
        rows.extend(range(y0, h, dy))
    return rows


def _parse_screen(payload: bytes):
    """Header + logical screen descriptor + optional global color
    table. Returns (sw, sh, bg_index, gct_or_None, pos)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (signature missing)")
    if len(payload) < 13:
        raise ValueError("GIF logical screen descriptor truncated")
    sw, sh, packed, bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    if sw * sh > 1 << 28:
        # allocation bomb guard (round 15): the compositing canvas is
        # allocated straight from these header fields
        raise ValueError(
            f"GIF screen {sw}x{sh} exceeds the supported area (2^28 px)"
        )
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8)
        if gct.size != 3 * n:
            raise ValueError("GIF global color table truncated")
        gct = gct.reshape(n, 3)
        pos += 3 * n
    return sw, sh, bg, gct, pos


def _parse_image(payload: bytes, pos: int, gct):
    """One image block (descriptor at payload[pos:], AFTER the 0x2C
    introducer): local color table, LZW data, de-interlace. Returns
    (lx, ty, w, h, index grid (h, w) int64, color table, pos_after)."""
    if pos + 9 > len(payload):
        raise ValueError("GIF image descriptor truncated")
    lx, ty, w, h, ipacked = struct.unpack("<HHHHB", payload[pos : pos + 9])
    pos += 9
    if w == 0 or h == 0:
        raise ValueError("malformed GIF dimensions")
    if w * h > 1 << 28:
        # allocation bomb guard (round 15, the VP8X canvas lesson): a
        # 13-byte descriptor can otherwise demand a 34 GB int64 index
        # grid before any data-length check runs
        raise ValueError(
            f"GIF image {w}x{h} exceeds the supported area (2^28 px)"
        )
    ct = gct
    if ipacked & 0x80:  # local color table
        n = 2 << (ipacked & 0x07)
        ct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8)
        if ct.size != 3 * n:
            raise ValueError("GIF local color table truncated")
        ct = ct.reshape(n, 3)
        pos += 3 * n
    if ct is None:
        raise ValueError("GIF image has no color table")
    if pos >= len(payload):
        raise ValueError("GIF LZW header truncated")
    min_code = payload[pos]
    pos += 1
    # palette indices are < 256 by construction, so the largest valid
    # minimum code size is 8 (clear code 256). 9-11 would make the
    # literal-table init (bytes([i]) for i in range(clear)) crash with
    # an opaque 'bytes must be in range(0, 256)' instead of a
    # decoder-owned error (round-14 ADVICE, verified by probe).
    if not 2 <= min_code <= 8:
        raise ValueError(f"invalid GIF LZW minimum code size {min_code}")
    data, pos = _sub_blocks(payload, pos)
    idx = np.frombuffer(
        _lzw_decode(bytes(data), min_code, w * h), dtype=np.uint8
    ).astype(np.int64)
    if int(idx.max(initial=0)) >= ct.shape[0]:
        raise ValueError(
            f"GIF pixel index {int(idx.max())} outside the"
            f" {ct.shape[0]}-entry color table"
        )
    grid = idx.reshape(h, w)
    if ipacked & 0x40:  # interlaced: rows arrive in 4-pass order
        out = np.zeros((h, w), dtype=np.int64)
        out[_interlace_order(h)] = grid
        grid = out
    return lx, ty, w, h, grid, ct, pos


def decode_gif(payload: bytes):
    """Decode the first image of a GIF. Returns (width, height, uint8
    ndarray): (h, w, 3) RGB, or (h, w, 4) RGBA when the preceding
    Graphic Control Extension declares a transparent index. Loud
    ValueError on malformed streams. (decode_gif_frames walks EVERY
    frame with disposal compositing — this single-image face stays the
    registry twin's contract.)"""
    _sw, _sh, _bg, gct, pos = _parse_screen(payload)
    transparent = None
    while True:
        if pos >= len(payload):
            raise ValueError("GIF ends without an image or trailer")
        b = payload[pos]
        pos += 1
        if b == 0x3B:  # trailer
            raise ValueError("GIF has no image data")
        if b == 0x21:  # extension
            if pos >= len(payload):
                raise ValueError("GIF extension truncated")
            label = payload[pos]
            pos += 1
            blocks, pos = _sub_blocks(payload, pos)
            if label == 0xF9 and len(blocks) >= 4:  # GCE
                if blocks[0] & 0x01:
                    transparent = blocks[3]
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        break
    _lx, _ty, w, h, grid, ct, _pos = _parse_image(payload, pos, gct)
    rgb = ct[grid]
    if transparent is None:
        return w, h, rgb.astype(np.uint8)
    alpha = np.where(grid == transparent, 0, 255).astype(np.uint8)
    return w, h, np.dstack([rgb.astype(np.uint8), alpha])


def decode_gif_frames(payload: bytes):
    """Decode EVERY frame of an animated GIF, composited onto the
    logical-screen canvas per the GIF89a disposal protocol (round-12
    verdict Next #5 — the first-image-only gap). Returns (sw, sh,
    [canvas_0, canvas_1, ...]) where each canvas is the (sh, sw, 3)
    uint8 RGB state of the screen AFTER that frame renders — the
    deliverable of an animation decoder.

    Spec-literal semantics (GIF89a section 23; this is the 'restore to
    background COLOR' reading, not the browser clear-to-transparent
    variant — output is RGB, there is no canvas alpha):

    - the canvas initializes to the background color (GCT[bg]);
    - a frame draws its rectangle at (left, top), skipping pixels equal
      to its GCE transparent index (the canvas shows through);
    - disposal 0/1 (none): the drawn state persists;
    - disposal 2 (background): after rendering, the frame's RECTANGLE
      is restored to the background color before the next frame;
    - disposal 3 (previous): after rendering, the frame's rectangle is
      restored to the canvas state from before this frame drew.

    Unknown extensions (NETSCAPE loop blocks, comments, plain text)
    are skipped by sub-block framing; a GCE applies to exactly the next
    image (reset after). Loud ValueError on malformed streams, frames
    escaping the logical screen, or disposal 2 without a global color
    table (no background color exists to restore)."""
    sw, sh, bg, gct, pos = _parse_screen(payload)
    if gct is None:
        raise ValueError("animated GIF compositing needs a global color table")
    if bg >= gct.shape[0]:
        raise ValueError(f"GIF background index {bg} outside color table")
    canvas = np.empty((sh, sw, 3), dtype=np.uint8)
    canvas[:, :] = gct[bg]
    frames = []
    disposal, transparent = 0, None
    while True:
        if pos >= len(payload):
            raise ValueError("GIF ends without a trailer")
        b = payload[pos]
        pos += 1
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension
            if pos >= len(payload):
                raise ValueError("GIF extension truncated")
            label = payload[pos]
            pos += 1
            blocks, pos = _sub_blocks(payload, pos)
            if label == 0xF9 and len(blocks) >= 4:  # GCE
                disposal = (blocks[0] >> 2) & 0x07
                transparent = blocks[3] if blocks[0] & 0x01 else None
            continue
        if b != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{b:02x}")
        lx, ty, w, h, grid, ct, pos = _parse_image(payload, pos, gct)
        if lx + w > sw or ty + h > sh:
            raise ValueError(
                f"GIF frame {len(frames)} rect ({lx},{ty},{w},{h})"
                f" escapes the {sw}x{sh} logical screen"
            )
        before = canvas[ty : ty + h, lx : lx + w].copy()
        region = canvas[ty : ty + h, lx : lx + w]
        if transparent is None:
            region[:, :] = ct[grid]
        else:
            draw = grid != transparent
            region[draw] = ct[grid[draw]]
        frames.append(canvas.copy())
        if disposal == 2:
            canvas[ty : ty + h, lx : lx + w] = gct[bg]
        elif disposal == 3:
            canvas[ty : ty + h, lx : lx + w] = before
        disposal, transparent = 0, None  # a GCE scopes to ONE image
    if not frames:
        raise ValueError("GIF has no image data")
    return sw, sh, frames


def _sub_blocks(payload: bytes, pos: int):
    """Concatenate a GIF sub-block chain; returns (bytes, pos_after)."""
    out = bytearray()
    while True:
        if pos >= len(payload):
            raise ValueError("GIF sub-block chain truncated")
        n = payload[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        blk = payload[pos : pos + n]
        if len(blk) != n:
            raise ValueError("GIF sub-block truncated")
        out += blk
        pos += n


def _lzw_decode(data: bytes, min_code: int, expect: int) -> bytes:
    """Variable-width LSB-first GIF LZW. Decodes exactly ``expect``
    pixels (loud on shortfall or dictionary misuse). Output and table
    entries are BYTES (palette indices are < 256 by construction), so
    memory stays 1 byte/pixel — bounded by the declared image size,
    the same guarantee as PNG's bounded inflate (round 13; the int-list
    version cost ~28 bytes/pixel)."""
    clear = 1 << min_code
    end = clear + 1
    out = bytearray()
    # bit reader: LSB-first across the concatenated sub-block bytes
    acc = 0
    nbits = 0
    p = 0

    def read(width):
        nonlocal acc, nbits, p
        while nbits < width:
            if p >= len(data):
                raise ValueError("GIF LZW stream truncated")
            acc |= data[p] << nbits
            nbits += 8
            p += 1
        v = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return v

    table = {}
    width = min_code + 1
    next_code = end + 1
    prev = None
    final_bump = False  # did the LAST iteration's assignment grow width?

    def reset():
        nonlocal table, width, next_code, prev
        table = {i: bytes([i]) for i in range(clear)}
        width = min_code + 1
        next_code = end + 1
        prev = None

    reset()
    while len(out) < expect:
        code = read(width)
        final_bump = False
        if code == clear:
            reset()
            continue
        if code == end:
            raise ValueError(
                f"GIF LZW ended at {len(out)} of {expect} pixels"
            )
        if prev is None:
            if code not in table:
                raise ValueError("GIF LZW first code not a literal")
            entry = table[code]
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError(f"GIF LZW code {code} out of sequence")
        out += entry
        if prev is not None and next_code < 4096:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
                final_bump = True
        prev = entry
    # the final dictionary entry can overshoot the pixel count, and a
    # malformed stream can carry entropy data past it — both must
    # surface HERE as the decoder's documented loud error, not later as
    # an opaque numpy reshape failure (round-12 ADVICE)
    if len(out) != expect:
        raise ValueError(
            f"GIF LZW produced {len(out)} pixels, expected {expect}"
        )
    # terminator check: the next code must be END. One genuine width
    # ambiguity exists at this position only — if the FINAL table
    # assignment landed exactly on 2^width, decoders that grow the read
    # width on "next code to assign reaches capacity" (ours) expect END
    # at width+1 while encoders that grow on "assigned code needs more
    # bits" (ours, and common in the wild) emit it at the old width.
    # Both conventions round-trip identically on every DATA code (the
    # decoder's table lags the encoder's by one assignment), so accept
    # END under either width — but ONLY when the final assignment
    # actually grew the width; anything else is trailing garbage.
    def _terminates(w, a, nb, q):
        while True:
            while nb < w:
                if q >= len(data):
                    return False  # truncated before any terminator
                a |= data[q] << nb
                nb += 8
                q += 1
            code = a & ((1 << w) - 1)
            a >>= w
            nb -= w
            if code == clear:  # a trailing CLEAR resets the read width
                w = min_code + 1
                continue
            return code == end

    widths = {width, width - 1} if final_bump else {width}
    if not any(_terminates(w, acc, nbits, p) for w in widths):
        raise ValueError(
            f"GIF LZW stream continues past the {expect}-pixel image"
            " (no END code at the data boundary)"
        )
    return bytes(out)


# --- encoder (test/registry input construction) -------------------------------


def _lzw_encode(indices, min_code: int) -> bytes:
    """REAL dictionary-building GIF LZW compressor (variable width,
    LSB-first, dictionary reset at 4096) — round trips exercise the
    decoder's growth/reset paths, not a degenerate clear-every-code
    stream."""
    clear = 1 << min_code
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def put(code, width):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {(i,): i for i in range(clear)}
    width = min_code + 1
    next_code = end + 1
    put(clear, width)
    run = ()
    for v in indices:
        v = int(v)
        if v >= clear:
            raise ValueError(f"index {v} exceeds LZW alphabet {clear}")
        cand = run + (v,)
        if cand in table:
            run = cand
            continue
        put(table[run], width)
        if next_code < 4096:
            table[cand] = next_code
            # GIF width bump happens when next_code EXCEEDS the width
            # capacity after assignment (encoder emits at the width the
            # decoder will read the NEXT code with)
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            put(clear, width)
            table = {(i,): i for i in range(clear)}
            width = min_code + 1
            next_code = end + 1
        run = (v,)
    if run:
        put(table[run], width)
    put(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _palette_ok(pal) -> np.ndarray:
    pal = np.asarray(pal, dtype=np.uint8).reshape(-1, 3)
    n = pal.shape[0]
    if n < 2 or n > 256 or n & (n - 1):
        raise ValueError(f"palette size {n} must be a power of two in 2..256")
    return pal


def _image_block(idx, pal_n: int, lx: int, ty: int, interlace: bool,
                 local_pal=None) -> bytes:
    """Image descriptor + optional local color table + LZW data stream
    for one frame — shared by the single- and multi-frame writers."""
    idx = np.asarray(idx, dtype=np.int64)
    if idx.ndim != 2:
        raise ValueError(f"frame needs (h, w) indices, got {idx.shape}")
    n = pal_n if local_pal is None else local_pal.shape[0]
    if int(idx.max(initial=0)) >= n or int(idx.min(initial=0)) < 0:
        raise ValueError("palette index out of range")
    h, w = idx.shape
    ipacked = 0x40 if interlace else 0x00
    out = bytearray()
    if local_pal is not None:
        ipacked |= 0x80 | (local_pal.shape[0].bit_length() - 2)
    out += struct.pack("<BHHHHB", 0x2C, lx, ty, w, h, ipacked)
    if local_pal is not None:
        out += local_pal.tobytes()
    seq = idx[_interlace_order(h)] if interlace else idx
    bits = max(2, n.bit_length() - 1)  # LZW minimum code size (>= 2)
    out.append(bits)
    lzw = _lzw_encode(seq.reshape(-1), bits)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)  # block terminator
    return bytes(out)


def encode_gif_frames(
    frames,
    palette,
    sw: "int | None" = None,
    sh: "int | None" = None,
    bg: int = 0,
    loop: bool = False,
) -> bytes:
    """GIF89a ANIMATION writer (decode_gif_frames' test/registry input
    twin). ``frames`` is a list of dicts: ``idx`` (h, w) palette
    indices (required); optional ``pos`` (lx, ty) default (0, 0),
    ``disposal`` 0..3, ``transparent`` index, ``local_palette`` (its
    own power-of-two color table), ``interlace``. The logical screen
    defaults to the first frame's extent; ``loop`` emits the NETSCAPE
    2.0 application extension (decoders must skip it)."""
    pal = _palette_ok(palette)
    n = pal.shape[0]
    if not frames:
        raise ValueError("animation needs at least one frame")
    f0 = np.asarray(frames[0]["idx"])
    if sw is None or sh is None:
        lx0, ty0 = frames[0].get("pos", (0, 0))
        sh_, sw_ = f0.shape
        sw, sh = lx0 + sw_, ty0 + sh_
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", sw, sh, 0x80 | (n.bit_length() - 2), bg, 0)
    out += pal.tobytes()
    if loop:  # NETSCAPE 2.0 looping block (app extension, sub-block framed)
        out += bytes([0x21, 0xFF, 11]) + b"NETSCAPE2.0"
        out += bytes([3, 1, 0, 0, 0])  # loop count 0 = forever
    for f in frames:
        disposal = int(f.get("disposal", 0))
        transparent = f.get("transparent")
        if disposal or transparent is not None:
            flags = (disposal & 0x07) << 2
            if transparent is not None:
                flags |= 0x01
            out += bytes(
                [0x21, 0xF9, 4, flags, 0, 0, int(transparent or 0), 0]
            )
        lpal = f.get("local_palette")
        if lpal is not None:
            lpal = _palette_ok(lpal)
        lx, ty = f.get("pos", (0, 0))
        out += _image_block(
            f["idx"], n, lx, ty, bool(f.get("interlace", False)), lpal
        )
    out.append(0x3B)  # trailer
    return bytes(out)


def encode_gif(
    idx,
    palette,
    transparent: "int | None" = None,
    interlace: bool = False,
) -> bytes:
    """GIF89a writer for (h, w) palette indices over an (n, 3) color
    table (n a power of two, 2..256). Optional transparent index (via
    a GCE block) and interlace."""
    idx = np.asarray(idx, dtype=np.int64)
    if idx.ndim != 2:
        raise ValueError(f"encode_gif needs (h, w) indices, got {idx.shape}")
    pal = _palette_ok(palette)
    n = pal.shape[0]
    h, w = idx.shape
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (n.bit_length() - 2), 0, 0)
    out += pal.tobytes()
    if transparent is not None:
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, int(transparent), 0])
    out += _image_block(idx, n, 0, 0, interlace)
    out.append(0x3B)  # trailer
    return bytes(out)
