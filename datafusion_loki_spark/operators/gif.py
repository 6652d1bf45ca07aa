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


def decode_gif(payload: bytes):
    """Decode the first image of a GIF. Returns (width, height, uint8
    ndarray): (h, w, 3) RGB, or (h, w, 4) RGBA when the preceding
    Graphic Control Extension declares a transparent index. Loud
    ValueError on malformed streams."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF (signature missing)")
    if len(payload) < 13:
        raise ValueError("GIF logical screen descriptor truncated")
    sw, sh, packed, _bg, _ar = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8)
        if gct.size != 3 * n:
            raise ValueError("GIF global color table truncated")
        gct = gct.reshape(n, 3)
        pos += 3 * n
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
    if pos + 9 > len(payload):
        raise ValueError("GIF image descriptor truncated")
    _lx, _ty, w, h, ipacked = struct.unpack("<HHHHB", payload[pos : pos + 9])
    pos += 9
    if w == 0 or h == 0:
        raise ValueError("malformed GIF dimensions")
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
    if not 2 <= min_code <= 11:
        raise ValueError(f"invalid GIF LZW minimum code size {min_code}")
    data, pos = _sub_blocks(payload, pos)
    idx = _lzw_decode(bytes(data), min_code, w * h)
    idx = np.asarray(idx, dtype=np.int64)
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
    rgb = ct[grid]
    if transparent is None:
        return w, h, rgb.astype(np.uint8)
    alpha = np.where(grid == transparent, 0, 255).astype(np.uint8)
    return w, h, np.dstack([rgb.astype(np.uint8), alpha])


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


def _lzw_decode(data: bytes, min_code: int, expect: int) -> list:
    """Variable-width LSB-first GIF LZW. Decodes exactly ``expect``
    pixels (loud on shortfall or dictionary misuse)."""
    clear = 1 << min_code
    end = clear + 1
    out = []
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
        table = {i: (i,) for i in range(clear)}
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
            entry = prev + (prev[0],)  # the KwKwK case
        else:
            raise ValueError(f"GIF LZW code {code} out of sequence")
        out.extend(entry)
        if prev is not None and next_code < 4096:
            table[next_code] = prev + (entry[0],)
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
    return out


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
    pal = np.asarray(palette, dtype=np.uint8).reshape(-1, 3)
    if idx.ndim != 2:
        raise ValueError(f"encode_gif needs (h, w) indices, got {idx.shape}")
    n = pal.shape[0]
    if n < 2 or n > 256 or n & (n - 1):
        raise ValueError(f"palette size {n} must be a power of two in 2..256")
    if int(idx.max(initial=0)) >= n or int(idx.min(initial=0)) < 0:
        raise ValueError("palette index out of range")
    h, w = idx.shape
    bits = max(2, n.bit_length() - 1)  # LZW minimum code size (>= 2)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (n.bit_length() - 2), 0, 0)
    out += pal.tobytes()
    if transparent is not None:
        out += bytes([0x21, 0xF9, 4, 0x01, 0, 0, int(transparent), 0])
    out += struct.pack(
        "<BHHHHB", 0x2C, 0, 0, w, h, 0x40 if interlace else 0x00
    )
    seq = idx[_interlace_order(h)] if interlace else idx
    out.append(bits)
    lzw = _lzw_encode(seq.reshape(-1), bits)
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)
