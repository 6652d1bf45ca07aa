"""WebP lossless (VP8L) codec — pure stdlib + numpy, no codec library.

Late round 14: WebP leaves the PIL-gated list for its LOSSLESS form.
Implemented per the public WebP Lossless Bitstream Specification
(RFC 9649 / Google's VP8L spec): RIFF/WEBP container walk, the 0x2F
signature byte, LSB-first bit reading with DEFLATE-convention
canonical prefix codes (simple 1/2-symbol codes and normal
code-length-coded codes incl. the 16/17/18 repeat ops and the
max_symbol short-circuit), meta-prefix (entropy image) group
selection, color cache (the 0x1e35a7bd multiplicative hash), LZ77
back-references with the 120-entry 2D neighbor distance map, and all
FOUR transforms inverted in reverse order: PREDICTOR (the 14 spatial
modes incl. Select and the clamped add/subtract pair), COLOR
(signed 3.5 fixed-point cross-channel deltas), SUBTRACT_GREEN, and
COLOR_INDEXING (palette with sub-byte pixel bundling at table sizes
<= 16). Round 15: the VP8X extended container — metadata-skipping
still-image wrap AND the ANIM/ANMF animation protocol with VP8L
frames (even stored-/2 offsets, overwrite/alpha-blend compositing,
dispose-to-background, canvases initialized transparent) — with an
encode_webp_anim twin. Lossy VP8 and ALPH stay loud — never a fake
fallback (decode_image contract).

The encoder twin constructs REAL, complete-code VP8L streams for
tests and the registry face: fixed complete Huffman code-length
tables ({8,9} over the 280-symbol green alphabet, {7,8,9} over the
256-symbol channels, {5,6} over the 40 distance symbols — each
satisfying Kraft exactly, so no incomplete-code corner is ever
emitted), optional color cache, optional run-length LZ77 emitting
BOTH plain (>120) and neighbor-map distance codes, optional
subtract-green, and a palette mode with real pixel bundling.

Exactness stance: VP8L is LOSSLESS, so every decoded pixel is
bit-defined by the spec; round trips are exact and the registry
oracle replays channel sums from payload bytes. Where the spec
publishes literal tables (the neighbor map, the code-length-code
order), they are transcribed and pinned by wire-level unit tests;
encoder/decoder symmetry alone cannot catch a mis-transcribed table,
so the tests anchor concrete entries.
"""

from __future__ import annotations

import struct

import numpy as np

# the order code-length-code lengths are transmitted in (RFC 9649 §5.2.2)
_CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

# 120-entry 2D neighbor offsets for distance codes 1..120 (RFC 9649
# §4.2.2, transcribed verbatim; (dx, dy) with dy down, dx right-signed)
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)

_GREEN_EXTRA = 24  # length-prefix symbols appended to the green alphabet


class _BitReader:
    """LSB-first bit reader over the VP8L stream. Reading past the end
    is the decoder's own loud error (never an IndexError)."""

    __slots__ = ("data", "pos", "acc", "nbits", "_wl")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0
        self._wl = None

    def bitpos(self) -> int:
        return self.pos * 8 - self.nbits

    def seek(self, p: int):
        """Resync the byte-based reader to absolute bit position ``p``
        (the pixel loops below run on the window list and hand the
        stream back here for the next header)."""
        k, o = p >> 3, p & 7
        if o:
            self.pos = k + 1
            self.acc = self.data[k] >> o
            self.nbits = 8 - o
        else:
            self.pos = k
            self.acc = 0
            self.nbits = 0

    def windows(self):
        """(wl, nbits): wl[k] holds bytes 4k..4k+8 as one LITTLE-endian
        64-bit int (the LSB-first twin of the JPEG decoder's window
        list), zero-padded 20 bytes past the end so a hot loop may
        overshoot up to ~128 bits before its per-pixel truncation
        check fires; nbits is the REAL bit count."""
        if self._wl is None:
            n = len(self.data)
            m = (n + 3) // 4
            padded = self.data + b"\x00" * (4 * m - n + 20)
            a = np.frombuffer(padded, dtype="<u4").astype(np.uint64)
            self._wl = (a[:-1] | (a[1:] << np.uint64(32))).tolist()
        return self._wl, 8 * len(self.data)

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("VP8L bitstream truncated")
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        v = self.acc & ((1 << n) - 1)
        self.acc >>= n
        self.nbits -= n
        return v

    def peek(self, n: int) -> int:
        """Next ``n`` stream bits WITHOUT consuming; past-the-end bits
        read as 0 (consumption still checks the real bit count — a
        code that needs the missing bits fails loud in consume)."""
        while self.nbits < n and self.pos < len(self.data):
            self.acc |= self.data[self.pos] << self.nbits
            self.pos += 1
            self.nbits += 8
        return self.acc & ((1 << n) - 1)

    def consume(self, n: int):
        if n > self.nbits:
            raise ValueError("VP8L bitstream truncated")
        self.acc >>= n
        self.nbits -= n


def _prefix_decode(br: _BitReader, code: int) -> int:
    """Length/distance prefix decoding (RFC 9649 §4.2.1): codes 0..3
    mean 1..4; above that each pair of codes doubles the range with
    (code-2)>>1 extra bits."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_encode(value: int):
    """(symbol, extra_bits, n_extra) for the prefix coding — the
    encoder-side inverse of _prefix_decode."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    extra = v.bit_length() - 2
    symbol = 2 * extra + ((v >> extra) & 1)
    rest = v & ((1 << extra) - 1)
    return symbol + 2, rest, extra


class _Huff:
    """Canonical prefix decoder (DEFLATE convention: codes assigned by
    ascending (length, symbol), read MSB-of-code-first out of the
    LSB-first stream). A single-symbol code reads ZERO bits. Built from
    a lengths list; loud on over-subscribed or incomplete codes —
    except the deliberate single-symbol case.

    Decoding is one peek + one list index: the LUT is keyed by the
    RAW max_len-bit stream window, i.e. the bit-REVERSED code sits in
    the low bits and every filler pattern above it maps to the same
    (length, symbol) — so no per-bit tree walk and no reversal at
    read time (the codec family's JPEG prefix-LUT lesson)."""

    __slots__ = ("lut", "single", "max_len")

    def __init__(self, lengths):
        nz = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not nz:
            raise ValueError("VP8L prefix code has no symbols")
        if len(nz) == 1:
            self.single = nz[0][1]
            self.lut = None
            self.max_len = 0
            return
        self.single = None
        nz.sort()
        max_len = nz[-1][0]
        if max_len > 15:
            raise ValueError("VP8L prefix code length exceeds 15")
        lut = [None] * (1 << max_len)
        code = 0
        prev_len = nz[0][0]
        kraft = 0
        for ln, sym in nz:
            code <<= ln - prev_len
            prev_len = ln
            if code >= (1 << ln):
                raise ValueError("VP8L prefix code over-subscribed")
            kraft += 1 << (15 - ln)
            rev = 0
            c = code
            for _ in range(ln):
                rev = (rev << 1) | (c & 1)
                c >>= 1
            entry = (ln, sym)
            for filler in range(1 << (max_len - ln)):
                lut[rev | (filler << ln)] = entry
            code += 1
        if kraft != (1 << 15):
            raise ValueError("VP8L prefix code incomplete")
        self.lut = lut
        self.max_len = max_len

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        ln, sym = self.lut[br.peek(self.max_len)]
        br.consume(ln)
        return sym


# decoded-table cache: real corpora repeat code tables across items
# (and the registry face's fixed-table construction repeats them
# exactly), so the LUT build — the dominant per-small-item cost — runs
# once per distinct table (the JPEG _COMB_CACHE discipline)
_HUFF_CACHE: dict = {}


def _huff_cached(lengths) -> _Huff:
    key = tuple(lengths)
    h = _HUFF_CACHE.get(key)
    if h is None:
        h = _Huff(lengths)
        if len(_HUFF_CACHE) < 64:
            _HUFF_CACHE[key] = h
    return h


def _read_code_lengths(br: _BitReader, alphabet: int) -> list:
    """The 'normal' code transmission (RFC 9649 §5.2.2): a prefix code
    over code-length symbols 0..18, then RLE-coded lengths."""
    clc_lens = [0] * 19
    n = 4 + br.read(4)
    if n > 19:
        raise ValueError("VP8L declares more than 19 code-length codes")
    for i in range(n):
        clc_lens[_CLC_ORDER[i]] = br.read(3)
    clc = _huff_cached(clc_lens)
    if br.read(1):  # use length / max_symbol short-circuit
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
        if max_symbol > alphabet:
            raise ValueError("VP8L max_symbol exceeds the alphabet")
    else:
        max_symbol = alphabet
    lengths = [0] * alphabet
    prev = 8
    i = 0
    while i < alphabet and max_symbol > 0:
        max_symbol -= 1
        s = clc.read(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev = s
        elif s == 16:
            rep = 3 + br.read(2)
            if i + rep > alphabet:
                raise ValueError("VP8L code-length repeat overruns")
            for _ in range(rep):
                lengths[i] = prev
                i += 1
        elif s == 17:
            rep = 3 + br.read(3)
            if i + rep > alphabet:
                raise ValueError("VP8L code-length repeat overruns")
            i += rep
        else:
            rep = 11 + br.read(7)
            if i + rep > alphabet:
                raise ValueError("VP8L code-length repeat overruns")
            i += rep
    return lengths


def _read_prefix_code(br: _BitReader, alphabet: int) -> _Huff:
    """One prefix code: the simple (1-2 symbol) form or the normal
    code-length-coded form."""
    if br.read(1):  # simple
        num = 1 + br.read(1)
        if br.read(1):  # first symbol is 8 bits
            s0 = br.read(8)
        else:
            s0 = br.read(1)
        if s0 >= alphabet:
            raise ValueError("VP8L simple-code symbol out of range")
        if num == 1:
            h = _Huff.__new__(_Huff)  # single-symbol: 0-bit read
            h.single = s0
            h.lut = None
            h.max_len = 0
            return h
        s1 = br.read(8)
        if s1 >= alphabet or s1 == s0:
            raise ValueError("VP8L simple-code symbol out of range")
        lengths = [0] * alphabet
        lengths[s0] = 1
        lengths[s1] = 1
        return _huff_cached(lengths)
    lengths = _read_code_lengths(br, alphabet)
    return _huff_cached(lengths)


def _read_group(br: _BitReader, cache_size: int):
    """The 5 prefix codes of one meta group."""
    return (
        _read_prefix_code(br, 256 + _GREEN_EXTRA + cache_size),
        _read_prefix_code(br, 256),
        _read_prefix_code(br, 256),
        _read_prefix_code(br, 256),
        _read_prefix_code(br, 40),
    )


def _meta_index(meta_px) -> "np.ndarray":
    """Meta-prefix group index from entropy-image ARGB pixels.

    RFC 9649 §5.2.1 defines the index as (red << 8) | green — 16 bits.
    The mask must NOT be wider: a conformant stream whose writer left
    nonzero alpha in the entropy-image pixels would otherwise leak that
    byte into the index, inflating the group count or mis-selecting
    groups (round-15 ADVICE fix; self-encoded streams always write
    alpha=0, so roundtrip tests never exercised it)."""
    return ((meta_px >> 8) & 0xFFFF).astype(np.int64)


def _decode_pixels(br: _BitReader, w: int, h: int, is_main: bool):
    """One entropy-coded image (RFC 9649 §5.2): optional color cache,
    optional meta-prefix image (main image only), prefix-coded
    literals / back-references / cache hits. Returns a flat uint32
    ARGB array of length w*h."""
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"VP8L color cache bits {cache_bits} invalid")
    cache_size = (1 << cache_bits) if cache_bits else 0
    meta = None
    meta_shift = 0
    groups_n = 1
    if is_main and br.read(1):
        meta_bits = br.read(3) + 2
        mw = -(-w // (1 << meta_bits))
        mh = -(-h // (1 << meta_bits))
        meta_px = _decode_pixels(br, mw, mh, False)
        meta = _meta_index(meta_px)
        groups_n = int(meta.max()) + 1
        meta_shift = meta_bits
    groups = [_read_group(br, cache_size) for _ in range(groups_n)]

    def flat(huff):
        """(mask, lut) with single-symbol codes normalized to a 1-entry
        LUT at mask 0 — the hot loop needs no branch for them."""
        if huff.single is not None:
            return 0, [(0, huff.single)]
        return (1 << huff.max_len) - 1, huff.lut

    gflat = [tuple(flat(huff) for huff in grp) for grp in groups]
    cache = [0] * cache_size
    out = [0] * (w * h)
    npx = w * h
    i = 0
    mw = -(-w // (1 << meta_shift)) if meta is not None else 0
    (gmask, glut), (rmask, rlut), (bmask, blut), (amask, alut), \
        (dmask, dlut) = gflat[0]
    last_block = -1
    # hot loop on the 64-bit window list (LSB-first: any <=19-bit read
    # at bit position p is one shift off wl[p >> 5]); the truncation
    # check runs once per decoded symbol group — the windows are
    # zero-padded far enough that the bounded overshoot stays in range
    wl, nbits = br.windows()
    p = br.bitpos()
    while i < npx:
        if meta is not None:
            block = ((i // w) >> meta_shift) * mw + ((i % w) >> meta_shift)
            if block != last_block:
                gi = int(meta[block])
                if gi >= groups_n:
                    raise ValueError("VP8L meta group index out of range")
                (gmask, glut), (rmask, rlut), (bmask, blut), \
                    (amask, alut), (dmask, dlut) = gflat[gi]
                last_block = block
        ln, s = glut[(wl[p >> 5] >> (p & 31)) & gmask]
        p += ln
        if s < 256:  # literal
            ln, red = rlut[(wl[p >> 5] >> (p & 31)) & rmask]
            p += ln
            ln, blue = blut[(wl[p >> 5] >> (p & 31)) & bmask]
            p += ln
            ln, alpha = alut[(wl[p >> 5] >> (p & 31)) & amask]
            p += ln
            if p > nbits:
                raise ValueError("VP8L bitstream truncated")
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[i] = px
            i += 1
            if cache_size:
                cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)] = px
        elif s < 256 + _GREEN_EXTRA:  # back-reference
            code = s - 256
            if code < 4:
                length = code + 1
            else:
                extra = (code - 2) >> 1
                length = ((2 + (code & 1)) << extra) + (
                    (wl[p >> 5] >> (p & 31)) & ((1 << extra) - 1)
                ) + 1
                p += extra
            ln, dsym = dlut[(wl[p >> 5] >> (p & 31)) & dmask]
            p += ln
            if dsym < 4:
                dcode = dsym + 1
            else:
                extra = (dsym - 2) >> 1
                dcode = ((2 + (dsym & 1)) << extra) + (
                    (wl[p >> 5] >> (p & 31)) & ((1 << extra) - 1)
                ) + 1
                p += extra
            if p > nbits:
                raise ValueError("VP8L bitstream truncated")
            if dcode > 120:
                dist = dcode - 120
            else:
                dx, dy = _DIST_MAP[dcode - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            if dist > i:
                raise ValueError("VP8L back-reference before image start")
            if i + length > npx:
                raise ValueError("VP8L back-reference overruns the image")
            if cache_size:
                for k in range(i - dist, i - dist + length):
                    px = out[k]
                    out[i] = px
                    i += 1
                    cache[
                        (0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)
                    ] = px
            elif dist >= length:
                out[i : i + length] = out[i - dist : i - dist + length]
                i += length
            else:
                for k in range(i - dist, i - dist + length):
                    out[i] = out[k]
                    i += 1
        else:  # color cache hit
            if p > nbits:
                raise ValueError("VP8L bitstream truncated")
            idx = s - 256 - _GREEN_EXTRA
            if idx >= cache_size:
                raise ValueError("VP8L cache symbol without a color cache")
            out[i] = cache[idx]
            i += 1
    if p > nbits:
        raise ValueError("VP8L bitstream truncated")
    br.seek(p)
    return np.asarray(out, dtype=np.uint32)


# --- transforms (inverse, applied in reverse order) ---------------------------


def _avg2(a, b):
    return (a.astype(np.uint16) + b.astype(np.uint16)) // 2


def _inv_predictor(arr, modes, bits):
    """Inverse PREDICTOR transform (RFC 9649 §4.2.1 semantics, mode
    table §4.2): residual + prediction mod 256 per channel, scanline
    order. ``arr`` is (h, w, 4) uint8 [A, R, G, B]; ``modes`` the
    block-resolution mode plane."""
    h, w, _ = arr.shape
    out = arr.astype(np.int32)
    for y in range(h):
        row_modes = modes[y >> bits]
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([255, 0, 0, 0], dtype=np.int32)
            elif y == 0:
                pred = out[0, x - 1]
            elif x == 0:
                pred = out[y - 1, 0]
            else:
                m = int(row_modes[x >> bits])
                L = out[y, x - 1]
                T = out[y - 1, x]
                TL = out[y - 1, x - 1]
                # TR on the rightmost column: the raster successor of
                # the above-row's last pixel, i.e. the CURRENT row's
                # leftmost (already decoded) pixel — RFC 9649 §4.2:
                # "the top-right pixel of the rightmost column is the
                # leftmost pixel on the same row as the current pixel"
                TR = out[y - 1, x + 1] if x + 1 < w else out[y, 0]
                if m == 0:
                    pred = np.array([255, 0, 0, 0], dtype=np.int32)
                elif m == 1:
                    pred = L
                elif m == 2:
                    pred = T
                elif m == 3:
                    pred = TR
                elif m == 4:
                    pred = TL
                elif m == 5:
                    pred = (((L + TR) // 2) + T) // 2
                elif m == 6:
                    pred = (L + TL) // 2
                elif m == 7:
                    pred = (L + T) // 2
                elif m == 8:
                    pred = (TL + T) // 2
                elif m == 9:
                    pred = (T + TR) // 2
                elif m == 10:
                    pred = ((L + TL) // 2 + (T + TR) // 2) // 2
                elif m == 11:
                    p = L + T - TL
                    pl = np.abs(p - L).sum()
                    pt = np.abs(p - T).sum()
                    pred = L if pl < pt else T
                elif m == 12:
                    pred = np.clip(L + T - TL, 0, 255)
                elif m == 13:
                    # C-truncating division: (a - TL) / 2 rounds toward
                    # zero in the reference recipe, numpy // floors —
                    # the two differ for odd negative differences
                    a = (L + T) // 2
                    d = a - TL
                    half = np.sign(d) * (np.abs(d) // 2)
                    pred = np.clip(a + half, 0, 255)
                else:
                    raise ValueError(f"invalid VP8L predictor mode {m}")
            out[y, x] = (out[y, x] + pred) & 0xFF
    return out.astype(np.uint8)


def _inv_color_transform(arr, elems, bits):
    """Inverse COLOR transform (RFC 9649 §4.2.2... spec §4.2 'color
    transform'): per-block signed 3.5 fixed-point deltas added back;
    element channels: green_to_red in RED? — transcribed from the
    spec's ColorTransformElement packing: green_to_red lives in the
    BLUE channel byte, green_to_blue in GREEN, red_to_blue in RED."""
    h, w, _ = arr.shape
    out = arr.astype(np.int32)
    for y in range(h):
        erow = elems[y >> bits]
        for x in range(w):
            e = erow[x >> bits]
            g2r = _i8(e & 0xFF)
            g2b = _i8((e >> 8) & 0xFF)
            r2b = _i8((e >> 16) & 0xFF)
            g = _i8(out[y, x, 2])
            r = (out[y, x, 1] + ((g2r * g) >> 5)) & 0xFF
            out[y, x, 1] = r
            b = (out[y, x, 3] + ((g2b * g) >> 5) + ((r2b * _i8(r)) >> 5)) & 0xFF
            out[y, x, 3] = b
    return out.astype(np.uint8)


def _i8(v) -> int:
    v = int(v) & 0xFF
    return v - 256 if v >= 128 else v


def _riff_chunks(payload: bytes):
    """Validated RIFF/WEBP container walk: [(fourcc, body), ...] with
    odd-size pad bytes consumed between chunks. Loud on signature,
    size-bookkeeping, and truncation violations."""
    if payload[:4] != b"RIFF":
        raise ValueError("not a WebP (RIFF signature missing)")
    if len(payload) < 12 or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP (WEBP form type missing)")
    (riff_size,) = struct.unpack("<I", payload[4:8])
    if riff_size + 8 != len(payload):
        raise ValueError(
            f"WebP RIFF size {riff_size} does not match payload"
        )
    chunks = []
    pos = 12
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise ValueError("WebP chunk header truncated")
        ckid = payload[pos : pos + 4]
        (cksize,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + cksize]
        if len(body) < cksize:
            raise ValueError(f"WebP chunk {ckid!r} truncated")
        chunks.append((ckid, body))
        pos += 8 + cksize + (cksize & 1)
    if not chunks:
        raise ValueError("WebP container has no chunks")
    return chunks


def _parse_vp8x(body: bytes):
    """VP8X extended-container header: (canvas_w, canvas_h, animated).
    Flags byte: ICC 0x20, Alpha 0x10, EXIF 0x08, XMP 0x04, Anim 0x02
    (alpha/ICC/EXIF/XMP are informative for this decoder — the chunks
    themselves are skipped by id)."""
    if len(body) != 10:
        raise ValueError(f"VP8X chunk holds {len(body)} bytes, expected 10")
    cw = 1 + int.from_bytes(body[4:7], "little")
    ch = 1 + int.from_bytes(body[7:10], "little")
    return cw, ch, bool(body[0] & 0x02)


def decode_webp(payload: bytes):
    """Decode a lossless WebP. Returns (width, height, uint8 (h, w, 4)
    RGBA ndarray). Handles the simple VP8L form, the extended VP8X
    container wrapping a VP8L still (metadata chunks skipped), and —
    round 15 — ANIMATED VP8X files, for which the FIRST composited
    canvas is returned (decode_webp_frames exposes every frame). Loud
    ValueError on the lossy 'VP8 '/'ALPH' forms, malformed containers,
    and every bitstream violation."""
    chunks = _riff_chunks(payload)
    ckid, body = chunks[0]
    if ckid == b"VP8 ":
        raise ValueError(
            "lossy VP8 WebP is not supported (lossless VP8L only);"
            " no fake fallback"
        )
    if ckid == b"VP8L":
        return _decode_vp8l_body(body)
    if ckid != b"VP8X":
        raise ValueError(f"unsupported WebP chunk {ckid!r}")
    cw, ch, animated = _parse_vp8x(body)
    if animated:
        cw2, ch2, canvases, _durations = decode_webp_frames(payload)
        return cw2, ch2, canvases[0]
    for cid, cbody in chunks[1:]:
        if cid == b"VP8L":
            w, h, arr = _decode_vp8l_body(cbody)
            if (w, h) != (cw, ch):
                raise ValueError(
                    f"VP8X canvas {cw}x{ch} disagrees with the VP8L"
                    f" stream's {w}x{h}"
                )
            return w, h, arr
        if cid == b"VP8 ":
            raise ValueError(
                "lossy VP8 WebP is not supported (lossless VP8L only);"
                " no fake fallback"
            )
        if cid == b"ALPH":
            raise ValueError(
                "ALPH (lossy-alpha) WebP is not supported; no fake"
                " fallback"
            )
        if cid in (b"ICCP", b"EXIF", b"XMP "):
            continue
        raise ValueError(f"unsupported WebP chunk {cid!r}")
    raise ValueError("VP8X WebP carries no image chunk")


def _decode_vp8l_body(body: bytes):
    """Decode one VP8L chunk body (the 0x2F-signature bitstream).
    Returns (width, height, uint8 (h, w, 4) RGBA ndarray)."""
    if not body or body[0] != 0x2F:
        raise ValueError("VP8L signature byte missing")
    br = _BitReader(body[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint (informative)
    if br.read(3) != 0:
        raise ValueError("unsupported VP8L version")
    # transforms, in bitstream order; inverted in reverse below
    transforms = []
    seen = set()
    xsize = w
    while br.read(1):
        t = br.read(2)
        if t in seen:
            raise ValueError(f"VP8L transform {t} repeated")
        seen.add(t)
        if t == 0:  # predictor
            bits = br.read(3) + 2
            bw = -(-xsize // (1 << bits))
            bh = -(-h // (1 << bits))
            data = _decode_pixels(br, bw, bh, False)
            modes = ((data >> 8) & 0xFF).reshape(bh, bw)
            transforms.append(("pred", bits, modes))
        elif t == 1:  # color
            bits = br.read(3) + 2
            bw = -(-xsize // (1 << bits))
            bh = -(-h // (1 << bits))
            data = _decode_pixels(br, bw, bh, False)
            elems = (data & 0xFFFFFF).reshape(bh, bw)
            transforms.append(("color", bits, elems))
        elif t == 2:  # subtract green
            transforms.append(("subg",))
        else:  # color indexing
            tsize = br.read(8) + 1
            pal_px = _decode_pixels(br, tsize, 1, False)
            # palette entries are delta-coded component-wise
            pal = np.zeros(tsize, dtype=np.uint32)
            prev = 0
            for k in range(tsize):
                a = ((prev >> 24) + (int(pal_px[k]) >> 24)) & 0xFF
                r = (((prev >> 16) & 0xFF) + ((int(pal_px[k]) >> 16) & 0xFF)) & 0xFF
                g = (((prev >> 8) & 0xFF) + ((int(pal_px[k]) >> 8) & 0xFF)) & 0xFF
                b = ((prev & 0xFF) + (int(pal_px[k]) & 0xFF)) & 0xFF
                prev = (a << 24) | (r << 16) | (g << 8) | b
                pal[k] = prev
            if tsize <= 2:
                wbits = 3
            elif tsize <= 4:
                wbits = 2
            elif tsize <= 16:
                wbits = 1
            else:
                wbits = 0
            transforms.append(("cidx", wbits, pal))
            xsize = -(-xsize // (1 << wbits))
    argb = _decode_pixels(br, xsize, h, True)
    arr = np.zeros((h, xsize, 4), dtype=np.uint8)
    arr[:, :, 0] = ((argb >> 24) & 0xFF).reshape(h, xsize)
    arr[:, :, 1] = ((argb >> 16) & 0xFF).reshape(h, xsize)
    arr[:, :, 2] = ((argb >> 8) & 0xFF).reshape(h, xsize)
    arr[:, :, 3] = (argb & 0xFF).reshape(h, xsize)
    for t in reversed(transforms):
        if t[0] == "cidx":
            wbits, pal = t[1], t[2]
            if wbits:
                per = 1 << wbits  # pixels per packed pixel
                field = 8 >> wbits  # bits per index
                idx_packed = arr[:, :, 2].astype(np.uint32)  # green
                cols = []
                for k in range(per):
                    cols.append(
                        (idx_packed >> (k * field)) & ((1 << field) - 1)
                    )
                idx = np.stack(cols, axis=-1).reshape(h, -1)[:, :w]
            else:
                idx = arr[:, :, 2].astype(np.uint32)[:, :w]
            if int(idx.max(initial=0)) >= len(pal):
                raise ValueError("VP8L palette index out of range")
            px = pal[idx]
            arr = np.zeros((h, idx.shape[1], 4), dtype=np.uint8)
            arr[:, :, 0] = (px >> 24) & 0xFF
            arr[:, :, 1] = (px >> 16) & 0xFF
            arr[:, :, 2] = (px >> 8) & 0xFF
            arr[:, :, 3] = px & 0xFF
        elif t[0] == "subg":
            g = arr[:, :, 2].astype(np.uint16)
            arr[:, :, 1] = ((arr[:, :, 1] + g) & 0xFF).astype(np.uint8)
            arr[:, :, 3] = ((arr[:, :, 3] + g) & 0xFF).astype(np.uint8)
        elif t[0] == "pred":
            arr = _inv_predictor(arr, t[2], t[1])
        else:
            arr = _inv_color_transform(arr, t[2], t[1])
    if arr.shape[1] != w:
        raise ValueError("VP8L color-indexing width bookkeeping broke")
    # ARGB storage order -> RGBA output
    out = np.empty((h, w, 4), dtype=np.uint8)
    out[:, :, 0] = arr[:, :, 1]
    out[:, :, 1] = arr[:, :, 2]
    out[:, :, 2] = arr[:, :, 3]
    out[:, :, 3] = arr[:, :, 0]
    return w, h, out


def _blend_rgba(src, dst):
    """Alpha-blend ``src`` over ``dst`` (both (h, w, 4) uint8 RGBA)
    with the container spec's formula in EXACT integer arithmetic,
    floor-rounded: blend.a = src.a + dst.a*(255-src.a)/255 and
    blend.rgb = (src.rgb*src.a + dst.rgb*dst.a*(1-src.a))/blend.a —
    both divisions floored (a deterministic reading of the spec's
    real-arithmetic formula; pinned by unit tests, noted as this
    decoder's convention since renderers round differently)."""
    s = src.astype(np.int64)
    d = dst.astype(np.int64)
    sa, da = s[..., 3], d[..., 3]
    a255 = sa * 255 + da * (255 - sa)  # 255 * exact blended alpha
    n = (
        s[..., :3] * (sa * 255)[..., None]
        + d[..., :3] * (da * (255 - sa))[..., None]
    )
    denom = np.where(a255 == 0, 1, a255)
    rgb = n // denom[..., None]
    rgb = np.where(a255[..., None] == 0, 0, rgb)
    out = np.empty_like(src)
    out[..., :3] = rgb.astype(np.uint8)
    out[..., 3] = (a255 // 255).astype(np.uint8)
    return out


def decode_webp_frames(payload: bytes):
    """Decode EVERY frame of an animated (VP8X/ANIM/ANMF) WebP whose
    frames are VP8L bitstreams, composited onto the canvas per the
    container spec (round 15 — the animation protocol the GIF twin
    already runs). Returns (canvas_w, canvas_h, [canvas_0, ...],
    [duration_ms_0, ...]) where each canvas is the (ch, cw, 4) uint8
    RGBA state AFTER that frame renders.

    Compositing semantics (RFC 9649 container section):
    - the canvas initializes to transparent black;
    - an ANMF frame renders its rectangle at its (even, stored /2)
      offsets — blending method 1 overwrites, 0 alpha-blends via
      _blend_rgba's documented integer formula;
    - disposal method 1 fills the frame's rectangle with the ANIM
      background color (stored BGRA on the wire) before the next
      frame; 0 leaves the canvas as rendered.

    Loud ValueError on frames escaping the canvas, ANMF before ANIM,
    geometry disagreeing with the embedded VP8L stream, lossy
    VP8/ALPH frame payloads, and every container-framing violation."""
    chunks = _riff_chunks(payload)
    if chunks[0][0] != b"VP8X":
        raise ValueError("animated WebP needs a leading VP8X chunk")
    cw, ch, animated = _parse_vp8x(chunks[0][1])
    if not animated:
        raise ValueError("VP8X animation flag is not set")
    # allocation bomb guard (the PNG bounded-inflate principle): VP8X
    # canvas fields are 24-bit each, so a crafted header could demand a
    # petabyte canvas; cap the area at the VP8L frame-dimension
    # ceiling's square (16384^2 = 2^28 pixels — no larger canvas can
    # ever be fully painted by expressible frames) BEFORE allocating
    if cw * ch > 1 << 28:
        raise ValueError(
            f"animated WebP canvas {cw}x{ch} exceeds the supported"
            " area (2^28 pixels)"
        )
    bg = None
    canvases: "list[np.ndarray]" = []
    durations: "list[int]" = []
    canvas = np.zeros((ch, cw, 4), dtype=np.uint8)
    for cid, body in chunks[1:]:
        if cid == b"ANIM":
            if len(body) != 6:
                raise ValueError(
                    f"ANIM chunk holds {len(body)} bytes, expected 6"
                )
            # background color is BGRA on the wire
            bg = np.array(
                [body[2], body[1], body[0], body[3]], dtype=np.uint8
            )
        elif cid == b"ANMF":
            if bg is None:
                raise ValueError("ANMF frame before the ANIM chunk")
            if len(body) < 16:
                raise ValueError("ANMF header truncated")
            fx = 2 * int.from_bytes(body[0:3], "little")
            fy = 2 * int.from_bytes(body[3:6], "little")
            fw = 1 + int.from_bytes(body[6:9], "little")
            fh = 1 + int.from_bytes(body[9:12], "little")
            dur = int.from_bytes(body[12:15], "little")
            flags = body[15]
            if fx + fw > cw or fy + fh > ch:
                raise ValueError(
                    f"ANMF frame {fw}x{fh}@({fx},{fy}) escapes the"
                    f" {cw}x{ch} canvas"
                )
            sub = body[16:]
            spos = 0
            frame = None
            while spos < len(sub):
                if spos + 8 > len(sub):
                    raise ValueError("ANMF subchunk header truncated")
                sid = sub[spos : spos + 4]
                (ssize,) = struct.unpack(
                    "<I", sub[spos + 4 : spos + 8]
                )
                sbody = sub[spos + 8 : spos + 8 + ssize]
                if len(sbody) < ssize:
                    raise ValueError(f"ANMF subchunk {sid!r} truncated")
                if sid == b"VP8L":
                    fw2, fh2, frame = _decode_vp8l_body(sbody)
                    if (fw2, fh2) != (fw, fh):
                        raise ValueError(
                            f"ANMF geometry {fw}x{fh} disagrees with"
                            f" the VP8L stream's {fw2}x{fh2}"
                        )
                elif sid == b"VP8 ":
                    raise ValueError(
                        "lossy VP8 animation frames are not supported;"
                        " no fake fallback"
                    )
                elif sid == b"ALPH":
                    raise ValueError(
                        "ALPH animation frames are not supported;"
                        " no fake fallback"
                    )
                else:
                    raise ValueError(
                        f"unsupported ANMF subchunk {sid!r}"
                    )
                spos += 8 + ssize + (ssize & 1)
            if frame is None:
                raise ValueError("ANMF carries no VP8L frame")
            region = canvas[fy : fy + fh, fx : fx + fw]
            if flags & 0x02:  # blending method 1: do not blend
                region[:] = frame
            else:
                region[:] = _blend_rgba(frame, region)
            canvases.append(canvas.copy())
            durations.append(dur)
            if flags & 0x01:  # disposal 1: restore to background
                canvas[fy : fy + fh, fx : fx + fw] = bg
        elif cid in (b"ICCP", b"EXIF", b"XMP "):
            continue
        else:
            raise ValueError(f"unsupported WebP chunk {cid!r}")
    if not canvases:
        raise ValueError("animated WebP has no ANMF frames")
    return cw, ch, canvases, durations


# --- encoder (test/registry input construction) -------------------------------


def _fwd_predictor(px, mode: int):
    """Forward PREDICTOR transform (single mode everywhere): residual =
    (pixel - prediction) mod 256, prediction computed from the ORIGINAL
    neighbors (identical to the reconstructed ones — lossless). ``px``
    is (h, w, 4) int32 in RGBA channel order, so the mode-0 constant is
    [0, 0, 0, 255] here (the decoder works in ARGB order)."""
    h, w, _ = px.shape
    out = px.copy()
    black = np.array([0, 0, 0, 255], dtype=np.int32)
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = black
            elif y == 0:
                pred = px[0, x - 1]
            elif x == 0:
                pred = px[y - 1, 0]
            else:
                L = px[y, x - 1]
                T = px[y - 1, x]
                TL = px[y - 1, x - 1]
                TR = px[y - 1, x + 1] if x + 1 < w else px[y, 0]
                if mode == 0:
                    pred = black
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = (((L + TR) // 2) + T) // 2
                elif mode == 6:
                    pred = (L + TL) // 2
                elif mode == 7:
                    pred = (L + T) // 2
                elif mode == 8:
                    pred = (TL + T) // 2
                elif mode == 9:
                    pred = (T + TR) // 2
                elif mode == 10:
                    pred = ((L + TL) // 2 + (T + TR) // 2) // 2
                elif mode == 11:
                    p = L + T - TL
                    pred = L if np.abs(p - L).sum() < np.abs(p - T).sum() else T
                elif mode == 12:
                    pred = np.clip(L + T - TL, 0, 255)
                else:
                    a = (L + T) // 2
                    d = a - TL
                    pred = np.clip(a + np.sign(d) * (np.abs(d) // 2), 0, 255)
            out[y, x] = (px[y, x] - pred) & 0xFF
    return out


class _BitWriter:
    """LSB-first bit writer; prefix codes go MSB-of-code-first."""

    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, n: int):
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def put_code(self, code: int, length: int):
        for i in range(length - 1, -1, -1):
            self.put((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _canon_codes(lengths):
    """symbol -> (code, length), DEFLATE canonical order."""
    nz = sorted((ln, sym) for sym, ln in enumerate(lengths) if ln)
    codes = {}
    code = 0
    prev = nz[0][0] if nz else 0
    for ln, sym in nz:
        code <<= ln - prev
        prev = ln
        codes[sym] = (code, ln)
        code += 1
    return codes


_REV_CODES_CACHE: dict = {}


def _canon_codes_rev(lengths):
    """symbol -> (bit-reversed code, length): MSB-of-code-first in an
    LSB-first stream means one put() of the reversed code — the
    encoder's per-bit put_code loop measured as the face's dominant
    cost. Cached by lengths (the fixed tables repeat per item)."""
    key = tuple(lengths)
    hit = _REV_CODES_CACHE.get(key)
    if hit is not None:
        return hit
    out = {}
    for sym, (code, ln) in _canon_codes(lengths).items():
        rev = 0
        c = code
        for _ in range(ln):
            rev = (rev << 1) | (c & 1)
            c >>= 1
        out[sym] = (rev, ln)
    if len(_REV_CODES_CACHE) < 64:
        _REV_CODES_CACHE[key] = out
    return out


_FIXED_LEN_CACHE: dict = {}


def _fixed_lengths(alphabet: int) -> list:
    """A COMPLETE (Kraft == 1) near-uniform length table: {L, L+1} for
    general sizes, {L-1, L, L+1} when the alphabet is an exact power
    of two (an all-equal table would leave the code-length code with a
    single symbol — a corner this encoder deliberately avoids)."""
    if alphabet < 4:
        raise ValueError("fixed-length table needs alphabet >= 4")
    hit = _FIXED_LEN_CACHE.get(alphabet)
    if hit is not None:
        return hit
    L = (alphabet - 1).bit_length() - 1  # 2^L < alphabet <= 2^(L+1)
    if alphabet == 1 << (L + 1):  # exact power of two
        L += 1
        lengths = [L] * alphabet
        lengths[0] = L - 1
        lengths[-1] = L + 1
        lengths[-2] = L + 1
        if len(_FIXED_LEN_CACHE) < 16:
            _FIXED_LEN_CACHE[alphabet] = lengths
        return lengths
    # n_L/2^L + n_{L+1}/2^{L+1} = 1 with n_L + n_{L+1} = alphabet
    n_L = (1 << (L + 1)) - alphabet
    lengths = [L] * n_L + [L + 1] * (alphabet - n_L)
    if len(_FIXED_LEN_CACHE) < 16:
        _FIXED_LEN_CACHE[alphabet] = lengths
    return lengths


def _write_code_lengths(bw: _BitWriter, lengths):
    """Transmit a normal prefix code: code-length-code lengths in the
    spec order, then one code-length symbol per alphabet entry (no
    RLE — the fixed tables are near-uniform anyway)."""
    used = sorted(set(lengths))
    clc_lens = [0] * 19
    if len(used) == 1:
        raise ValueError("single-length tables are not emitted")
    if len(used) == 2:
        clc_lens[used[0]] = 1
        clc_lens[used[1]] = 1
    elif len(used) == 3:
        # complete {1,2,2}: the most frequent value gets the 1-bit code
        freq = sorted(used, key=lambda v: -lengths.count(v))
        clc_lens[freq[0]] = 1
        clc_lens[freq[1]] = 2
        clc_lens[freq[2]] = 2
    else:
        raise ValueError("fixed tables use at most 3 distinct lengths")
    num = max(i for i, s in enumerate(_CLC_ORDER) if clc_lens[s]) + 1
    num = max(num, 4)
    bw.put(0, 1)  # not simple
    bw.put(num - 4, 4)
    for i in range(num):
        bw.put(clc_lens[_CLC_ORDER[i]], 3)
    bw.put(0, 1)  # no max_symbol short-circuit
    clc_codes = _canon_codes_rev(clc_lens)
    for ln in lengths:
        c, n = clc_codes[ln]
        bw.put(c, n)


def _write_pixels(
    bw: _BitWriter, argb, w: int, h: int, is_main: bool,
    cache_bits: int = 0, lz77: bool = False, meta_bits: int = 0,
):
    """One entropy-coded image from a flat uint32 ARGB sequence using
    the fixed complete code tables; optional color cache, a
    run-length LZ77 that alternates plain (>120) and neighbor-map
    distance-1 codes, and (main image only) an optional meta-prefix
    image with TWO groups in a checkerboard — group 1's tables are the
    REVERSED length assignment, so a decoder picking the wrong group
    misparses (the groups are not interchangeable)."""
    cache_size = (1 << cache_bits) if cache_bits else 0
    if cache_bits:
        bw.put(1, 1)
        bw.put(cache_bits, 4)
    else:
        bw.put(0, 1)
    n_groups = 1
    mw = 0
    if is_main:
        if meta_bits:
            if not 2 <= meta_bits <= 9:
                raise ValueError("meta_bits must be in 2..9")
            bw.put(1, 1)
            bw.put(meta_bits - 2, 3)
            mw = -(-w // (1 << meta_bits))
            mh = -(-h // (1 << meta_bits))
            meta_px = np.fromiter(
                (
                    ((bx + by) & 1) << 8
                    for by in range(mh)
                    for bx in range(mw)
                ),
                dtype=np.uint32,
                count=mw * mh,
            )
            _write_pixels(bw, meta_px, mw, mh, False)
            # the decoder reads max(meta)+1 group table sets: a
            # single-block meta image has only group 0
            n_groups = 2 if mw * mh > 1 else 1
        else:
            bw.put(0, 1)  # no meta-prefix image
    g_lens = _fixed_lengths(256 + _GREEN_EXTRA + cache_size)
    c_lens = _fixed_lengths(256)
    d_lens = _fixed_lengths(40)
    g_codes_g, c_codes_g, d_codes_g = [], [], []
    for gi in range(n_groups):
        gl = g_lens if gi == 0 else list(reversed(g_lens))
        cl = c_lens if gi == 0 else list(reversed(c_lens))
        dl = d_lens if gi == 0 else list(reversed(d_lens))
        for lens in (gl, cl, cl, cl, dl):
            _write_code_lengths(bw, lens)
        g_codes_g.append(_canon_codes_rev(gl))
        c_codes_g.append(_canon_codes_rev(cl))
        d_codes_g.append(_canon_codes_rev(dl))
    g_codes, c_codes, d_codes = g_codes_g[0], c_codes_g[0], d_codes_g[0]
    cache = [0] * cache_size
    n = len(argb)
    i = 0
    backref_toggle = 0
    while i < n:
        if n_groups > 1:
            gi = (((i % w) >> meta_bits) + ((i // w) >> meta_bits)) & 1
            g_codes, c_codes, d_codes = (
                g_codes_g[gi], c_codes_g[gi], d_codes_g[gi],
            )
        px = int(argb[i])
        if lz77 and i > 0 and px == int(argb[i - 1]):
            run = 1
            while i + run < n and int(argb[i + run]) == px:
                run += 1
            if run >= 3:
                sym, extra, n_extra = _prefix_encode(run)
                c, ln = g_codes[256 + sym]
                bw.put(c, ln)
                if n_extra:
                    bw.put(extra, n_extra)
                # distance 1 both ways: neighbor (1, 0) = code 2, or
                # the plain form 120 + 1
                dcode = 2 if backref_toggle else 121
                backref_toggle ^= 1
                dsym, dextra, dn = _prefix_encode(dcode)
                c, ln = d_codes[dsym]
                bw.put(c, ln)
                if dn:
                    bw.put(dextra, dn)
                if cache_size:
                    for k in range(run):
                        v = int(argb[i + k])
                        cache[
                            (0x1E35A7BD * v & 0xFFFFFFFF)
                            >> (32 - cache_bits)
                        ] = v
                i += run
                continue
        if cache_size:
            idx = (0x1E35A7BD * px & 0xFFFFFFFF) >> (32 - cache_bits)
            if cache[idx] == px:
                c, ln = g_codes[256 + _GREEN_EXTRA + idx]
                bw.put(c, ln)
                i += 1
                continue
            cache[idx] = px
        g = (px >> 8) & 0xFF
        c, ln = g_codes[g]
        bw.put(c, ln)
        for ch in ((px >> 16) & 0xFF, px & 0xFF, (px >> 24) & 0xFF):
            c, ln = c_codes[ch]
            bw.put(c, ln)
        i += 1


def encode_webp_lossless(
    arr,
    cache_bits: int = 0,
    lz77: bool = False,
    subtract_green: bool = False,
    palette=None,
    predictor_mode: "int | None" = None,
    color_elems: "tuple | None" = None,
    meta_bits: int = 0,
) -> bytes:
    """VP8L writer twin. ``arr`` is (h, w, 3) RGB or (h, w, 4) RGBA
    uint8 — or, with ``palette`` (an (n, 4) RGBA uint8 array, n <=
    256), an (h, w) index array written through the COLOR_INDEXING
    transform with real sub-byte bundling when n <= 16.
    ``predictor_mode`` signals the PREDICTOR transform with every
    block at that mode (0..13); ``color_elems`` = (green_to_red,
    green_to_blue, red_to_blue) signed ints signals the COLOR
    transform with one element everywhere; ``meta_bits`` emits a
    two-group checkerboard meta-prefix image. Transforms are signaled
    predictor -> color -> subtract-green and forward-applied in that
    order (the decoder inverts in reverse); palette composes with
    none of them (matching its standalone real-world use)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if palette is not None:
        palette = np.asarray(palette, dtype=np.uint8)
        if palette.ndim != 2 or palette.shape[1] != 4 or not (
            1 <= palette.shape[0] <= 256
        ):
            raise ValueError("palette must be (n<=256, 4) RGBA uint8")
        if arr.ndim != 2:
            raise ValueError("palette mode takes an (h, w) index array")
        if int(arr.max(initial=0)) >= palette.shape[0]:
            raise ValueError("palette index out of range")
        h, w = arr.shape
    else:
        if arr.ndim != 3 or arr.shape[2] not in (3, 4):
            raise ValueError(
                f"encode_webp_lossless needs (h, w, 3|4), got {arr.shape}"
            )
        h, w = arr.shape[:2]
        if arr.shape[2] == 3:
            arr = np.concatenate(
                [arr, np.full((h, w, 1), 255, dtype=np.uint8)], axis=2
            )
    if w > 1 << 14 or h > 1 << 14:
        raise ValueError("VP8L dimensions exceed 14 bits")
    bw = _BitWriter()
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(1 if (palette is not None or arr.shape[-1] == 4) else 0, 1)
    bw.put(0, 3)  # version
    if palette is not None and (
        subtract_green or predictor_mode is not None
        or color_elems is not None
    ):
        raise ValueError("palette mode does not compose with transforms")
    if predictor_mode is not None:
        if not 0 <= predictor_mode <= 13:
            raise ValueError(f"invalid predictor mode {predictor_mode}")
        bw.put(1, 1)
        bw.put(0, 2)
        pbits = 2  # 4x4 blocks
        bw.put(pbits - 2, 3)
        bww = -(-w // (1 << pbits))
        bwh = -(-h // (1 << pbits))
        modes_px = np.full(
            bww * bwh, 0xFF000000 | (predictor_mode << 8), dtype=np.uint32
        )
        _write_pixels(bw, modes_px, bww, bwh, False)
    if color_elems is not None:
        g2r, g2b, r2b = (int(v) & 0xFF for v in color_elems)
        bw.put(1, 1)
        bw.put(1, 2)
        cbits = 2
        bw.put(cbits - 2, 3)
        bww = -(-w // (1 << cbits))
        bwh = -(-h // (1 << cbits))
        elem = 0xFF000000 | (r2b << 16) | (g2b << 8) | g2r
        _write_pixels(
            bw, np.full(bww * bwh, elem, dtype=np.uint32), bww, bwh, False
        )
    if subtract_green and palette is None:
        bw.put(1, 1)
        bw.put(2, 2)
    if palette is not None:
        bw.put(1, 1)
        bw.put(3, 2)
        tsize = palette.shape[0]
        bw.put(tsize - 1, 8)
        # palette entries delta-coded componentwise, as a 1-row image
        pal_argb = (
            palette[:, 3].astype(np.uint32) << 24
            | palette[:, 0].astype(np.uint32) << 16
            | palette[:, 1].astype(np.uint32) << 8
            | palette[:, 2].astype(np.uint32)
        )
        deltas = np.zeros(tsize, dtype=np.uint32)
        prev = 0
        for k in range(tsize):
            cur = int(pal_argb[k])
            d = 0
            for shift in (24, 16, 8, 0):
                d |= (((cur >> shift) - (prev >> shift)) & 0xFF) << shift
            deltas[k] = d
            prev = cur
        _write_pixels(bw, deltas, tsize, 1, False)
        if tsize <= 2:
            wbits = 3
        elif tsize <= 4:
            wbits = 2
        elif tsize <= 16:
            wbits = 1
        else:
            wbits = 0
        per = 1 << wbits
        field = 8 >> wbits
        pw = -(-w // per)
        packed = np.zeros((h, pw), dtype=np.uint32)
        for k in range(per):
            cols = arr[:, k::per]
            packed[:, : cols.shape[1]] |= cols.astype(np.uint32) << (
                k * field
            )
        argb = (packed << 8).reshape(-1)  # index rides the green channel
        bw.put(0, 1)  # end of transforms
        _write_pixels(bw, argb, pw, h, True, cache_bits, lz77, meta_bits)
    else:
        px = arr.astype(np.int32).copy()
        if predictor_mode is not None:
            px = _fwd_predictor(px, predictor_mode)
        if color_elems is not None:
            g2r, g2b, r2b = (int(v) & 0xFF for v in color_elems)
            g = px[:, :, 1]
            r0 = px[:, :, 0].copy()
            dg = np.where(g >= 128, g - 256, g)
            dr = np.where(r0 >= 128, r0 - 256, r0)
            px[:, :, 0] = (r0 - ((_i8(g2r) * dg) >> 5)) & 0xFF
            px[:, :, 2] = (
                px[:, :, 2]
                - ((_i8(g2b) * dg) >> 5)
                - ((_i8(r2b) * dr) >> 5)
            ) & 0xFF
        if subtract_green:
            g = px[:, :, 1]
            px[:, :, 0] = (px[:, :, 0] - g) & 0xFF
            px[:, :, 2] = (px[:, :, 2] - g) & 0xFF
        px = px.astype(np.uint32)
        argb = (
            px[:, :, 3] << 24 | px[:, :, 0] << 16
            | px[:, :, 1] << 8 | px[:, :, 2]
        ).reshape(-1)
        bw.put(0, 1)  # end of transforms
        _write_pixels(bw, argb, w, h, True, cache_bits, lz77, meta_bits)
    body = b"\x2f" + bw.bytes()
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def _riff_chunk(fourcc: bytes, body: bytes) -> bytes:
    return (
        fourcc
        + struct.pack("<I", len(body))
        + body
        + (b"\x00" if len(body) & 1 else b"")
    )


def encode_webp_anim(
    frames,
    canvas: "tuple | None" = None,
    bg=(0, 0, 0, 0),
    loop: int = 0,
    **lossless_kw,
) -> bytes:
    """Animated-WebP writer twin (round 15): a VP8X/ANIM container
    whose ANMF frames carry REAL VP8L bitstreams (encode_webp_lossless
    per frame; ``lossless_kw`` forwards cache_bits/lz77/... to every
    frame). Each frame is a dict: ``px`` (h, w, 3|4) uint8 (RGB gets
    alpha 255), ``pos`` (x, y — EVEN, the wire stores them /2),
    ``duration`` ms (default 100), ``dispose`` 0 none / 1 background,
    ``blend`` False = overwrite (ANMF blending method 1, the
    deterministic default) / True = alpha-blend. ``canvas`` defaults
    to the frames' bounding extent; ``bg`` is RGBA (written BGRA on
    the wire per spec)."""
    if not frames:
        raise ValueError("encode_webp_anim needs at least one frame")
    norm = []
    for f in frames:
        px = np.asarray(f["px"], dtype=np.uint8)
        if px.ndim != 3 or px.shape[2] not in (3, 4):
            raise ValueError(
                f"animation frame needs (h, w, 3|4), got {px.shape}"
            )
        if px.shape[2] == 3:
            px = np.dstack(
                [px, np.full(px.shape[:2], 255, dtype=np.uint8)]
            )
        x, y = f.get("pos", (0, 0))
        if x < 0 or y < 0 or x % 2 or y % 2:
            raise ValueError(
                f"ANMF offsets must be even and non-negative, got"
                f" ({x}, {y})"
            )
        dur = int(f.get("duration", 100))
        if not 0 <= dur < 1 << 24:
            raise ValueError(f"ANMF duration {dur} out of 24-bit range")
        norm.append(
            (px, x, y, dur, int(f.get("dispose", 0)),
             bool(f.get("blend", False)))
        )
    if canvas is None:
        cw = max(x + px.shape[1] for px, x, _y, *_ in norm)
        ch = max(y + px.shape[0] for px, _x, y, *_ in norm)
    else:
        cw, ch = int(canvas[0]), int(canvas[1])
    if not (0 < cw <= 1 << 24 and 0 < ch <= 1 << 24):
        raise ValueError(f"canvas {cw}x{ch} out of VP8X range")
    for px, x, y, *_ in norm:
        if x + px.shape[1] > cw or y + px.shape[0] > ch:
            raise ValueError("animation frame escapes the canvas")
    flags = 0x02  # animation
    if any((px[:, :, 3] != 255).any() for px, *_ in norm):
        flags |= 0x10  # alpha hint (informative)
    vp8x = (
        bytes([flags, 0, 0, 0])
        + (cw - 1).to_bytes(3, "little")
        + (ch - 1).to_bytes(3, "little")
    )
    anim = (
        bytes([bg[2] & 0xFF, bg[1] & 0xFF, bg[0] & 0xFF, bg[3] & 0xFF])
        + struct.pack("<H", loop)
    )
    body = _riff_chunk(b"VP8X", vp8x) + _riff_chunk(b"ANIM", anim)
    for px, x, y, dur, dispose, blend in norm:
        vp8l_chunk = encode_webp_lossless(px, **lossless_kw)[12:]
        hdr = (
            (x // 2).to_bytes(3, "little")
            + (y // 2).to_bytes(3, "little")
            + (px.shape[1] - 1).to_bytes(3, "little")
            + (px.shape[0] - 1).to_bytes(3, "little")
            + dur.to_bytes(3, "little")
            + bytes([(0 if blend else 0x02) | (0x01 if dispose else 0)])
        )
        body += _riff_chunk(b"ANMF", hdr + vp8l_chunk)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body
