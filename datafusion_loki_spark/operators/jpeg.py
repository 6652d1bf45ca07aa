"""Baseline JPEG codec — pure stdlib + numpy, no codec library.

Round 12 closes the decode family's last honest gap ("every production
image is PNG/JPEG; JPEG sits behind the PIL gate"): a REAL byte->pixels
path for baseline sequential (SOF0) AND progressive (SOF2) DCT JPEG per
the public spec (ITU-T T.81 / ISO 10918-1): marker walk, DQT/DHT/SOF/
SOS parsing, byte-unstuffed Huffman entropy decode (round 14: combined
symbol+magnitude LUTs at adaptive peek width over a precomputed
64-bit-window list — see the entropy core section), differential DC
with EXTEND, run/size AC with
EOBRUN, correction bits), dequantize + dezigzag, float64 separable
IDCT, chroma upsampling, JFIF YCbCr->RGB, restart markers in every
scan class. The encoder twin exists to CONSTRUCT valid inputs for
tests and the registry operator (forward DCT + quantize +
canonical-Huffman entropy coding; fixed single-length code tables,
gray or 4:4:4 / 4:2:2 / 4:2:0 color, optional DRI — since round 13
also under the progressive script).

Exactness stance: the spec does not mandate a bit-exact IDCT, so the
decoded pixels of a general JPEG are decoder-defined. Two layers keep
the correctness story honest anyway:

- the registry operator (multimodal.mm_decode_jpeg) constructs DC-ONLY
  grayscale JPEGs with the DC quant step = 8: a constant 8x8 block of
  value v codes to exactly v - 128, and the IDCT of a DC-only block is
  mathematically constant F00/8 — integer-exact through float64 — so
  DuckDB replays the expected sums from raw payload bytes, full-hash;
- unit tests drive the GENERAL path (AC coefficients, color,
  subsampling, restarts) against an independent O(n^4) reference IDCT
  and round-trip bounds set by the quantization error.

Still loud, never a fake fallback: lossless (SOF3) and other
non-baseline/non-progressive frame types, arithmetic coding, 12-bit
precision, 16-bit quant tables, unsupported sampling grids.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag order: ZIGZAG[k] = (row, col) of the k-th coefficient in a
# block — generated, not transcribed, so it cannot be mistyped
def _zigzag_order():
    order = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (
            rc[0] + rc[1],
            rc[1] if (rc[0] + rc[1]) % 2 == 0 else rc[0],
        ),
    )
    return order


_ZZ = _zigzag_order()
# flat index per zigzag position (for vectorized dezigzag)
_ZZ_FLAT = np.array([r * 8 + c for r, c in _ZZ])

# IDCT basis: A[u, x] = C(u)/2 * cos((2x+1) u pi / 16); orthogonal, so
# spatial = A.T @ F @ A and forward F = A @ f @ A.T
_A = np.zeros((8, 8))
for _u in range(8):
    _cu = (1.0 / np.sqrt(2.0)) if _u == 0 else 1.0
    for _x in range(8):
        _A[_u, _x] = _cu / 2.0 * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _idct2(coef):
    return _A.T @ coef @ _A


def _fdct2(block):
    return _A @ block @ _A.T


# entropy-code tables for the ENCODER: fixed-length canonical codes —
# 12 DC categories at 4 bits; the 162 sequential AC run/size symbols
# plus the 14 progressive EOBn symbols (r<<4 for r=1..14, the
# end-of-band run lengths) at 8 bits (176 < 254, so no all-ones code
# exists at either length; any conforming decoder, ours included,
# reads them from the DHT segments)
_DC_VALS = list(range(12))
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_AC_VALS = (
    [0x00, 0xF0]
    + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    + [r << 4 for r in range(1, 15)]
)
_AC_BITS = [0] * 16
_AC_BITS[7] = len(_AC_VALS)  # all at length 8


def _canonical_codes(bits, vals):
    """(value -> (code, length)) per the spec's Annex C generation."""
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return out


def _category(v):
    """Smallest t with |v| < 2^t (the DC/AC size category)."""
    t = 0
    a = abs(v)
    while a:
        a >>= 1
        t += 1
    return t


# --- entropy decode core (round 14) -----------------------------------
# The round-13 per-symbol bit reader (a method call plus an accumulator
# fill per Huffman read) measured ~0.9 us per read — at noise-image
# symbol densities that priced JPEG at ~1 s/megapixel. Round 14 replaces
# it with (a) a precomputed sliding-window LIST: one 32-bit MSB-first
# window per byte position, built vectorized by numpy and indexed at C
# speed — any 16-bit peek or <=16-bit receive at bit position p is two
# shifts off wl[p >> 3] — and (b) libjpeg-style COMBINED lookup tables:
# one peek-16 resolves the Huffman symbol AND its magnitude bits
# whenever code + magnitude fit in 16 bits, so the common AC coefficient
# costs one list index + tuple unpack instead of a Huffman walk plus a
# separate receive. Blocks whose worst-case bit budget fits the
# remaining segment skip per-symbol truncation checks entirely
# (_BLOCK_BITS_BOUND); segment tails run checked twins that reproduce
# the round-13 error contract exactly (peeks pad with 1-bits — the
# encoder's own byte padding — but a code or magnitude extending past
# the REAL remaining bits fails loud as truncated).

# worst case bits one baseline block can consume: DC 16+11, 63 AC
# coefficients at 16+10 each, <=4 ZRLs, one EOB — ~1.8k; rounded up
_BLOCK_BITS_BOUND = 2200


def _bit_windows(seg: bytes):
    """(windows, nbits): windows[i] holds bytes 4i..4i+8 of ``seg`` as
    one MSB-first 64-bit int (1-padding past the end, matching the
    classic peek-pads-with-ones convention), so any 16-bit peek or
    <=16-bit receive at bit position p reads wl[p >> 5]. 4-byte stride
    keeps the list a quarter the byte count (the .tolist() was 13% of a
    whole baseline decode at 1-byte stride); nbits is the REAL bit
    count — truncation checks compare against it, never the padding."""
    n = len(seg)
    m = (n + 3) // 4
    if n < 64:
        padded = seg + b"\xff" * (4 * m - n + 4)
        return (
            [
                int.from_bytes(padded[4 * i : 4 * i + 8], "big")
                for i in range(m)
            ]
            or [0xFFFFFFFFFFFFFFFF]
        ), 8 * n
    padded = seg + b"\xff" * (4 * m - n + 4)
    a = np.frombuffer(padded, dtype=">u4")
    w = (a[:-1].astype(np.uint64) << np.uint64(32)) | a[1:]
    return w.tolist(), 8 * n


# Combined-table entry kinds (the ``rc`` slot of each (adv, rc, v)
# tuple): 0..15 = decoded coefficient with zero-run rc and value v
# (adv covers code + magnitude bits); 16 = ZRL; 17 = end-of-band, v =
# the remaining-block EOBRUN (0 for plain EOB); 18 = fallback — code
# resolved (adv = code length) but the magnitude did not fit the peek
# window, v = the raw symbol byte (DC: the category); 29/30/31 = loud
# errors (invalid DC category / EOBn-in-baseline / unassigned prefix of
# an incomplete table).
#
# Adaptive peek width (round 14, measured): a 65536-entry table costs
# ~130 ns per random lookup (L2/L3 misses over the ~5 MB tuple heap)
# where a 4096-entry table costs ~50 — so the tables are built at
# W = min(16, max code length + _MAG_SLACK) bits. _MAG_SLACK = 5 keeps
# magnitudes within ~5 size categories of the shortest possible code
# combined (for q=8 noise, |coef| is half-normal with sigma ~9, so
# s <= 5 covers ~99.9% of symbols); everything wider takes the fallback
# receive, bit-exact either way. Each builder returns (shift, mask,
# lut): key = (wl[p >> 5] >> (shift - (p & 31))) & mask.
_MAG_SLACK = 5
_COMB_CACHE: dict = {}


def _max_code_len(bits) -> int:
    ml = 0
    for ln in range(1, 17):
        if bits[ln - 1]:
            ml = ln
    return ml if ml else 1


def _combined_dc_table(bits, vals):
    """Combined DC table at adaptive peek width: (adv, 0, diff) when
    code + category bits fit the window, else fallback/error kinds."""
    key = ("dc", bits, vals)
    hit = _COMB_CACHE.get(key)
    if hit is not None:
        return hit
    w = min(16, _max_code_len(bits) + _MAG_SLACK)
    lut = [(0, 31, 0)] * (1 << w)
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            base = code << (w - ln)
            span = 1 << (w - ln)
            t = vals[k]
            if t > 11:
                lut[base : base + span] = [(ln, 29, 0)] * span
            elif t == 0:
                lut[base : base + span] = [(ln, 0, 0)] * span
            elif ln + t <= w:
                rep = 1 << (w - ln - t)
                half = 1 << (t - 1)
                ext = [
                    (ln + t, 0, v if v >= half else v - 2 * half + 1)
                    for v in range(1 << t)
                ]
                lut[base : base + span] = (
                    ext if rep == 1 else [e for e in ext for _ in range(rep)]
                )
            else:
                lut[base : base + span] = [(ln, 18, t)] * span
            code += 1
            k += 1
        code <<= 1
    out = (64 - w, (1 << w) - 1, lut)
    if len(_COMB_CACHE) < 24:
        _COMB_CACHE[key] = out
    return out


def _combined_ac_table(bits, vals, progressive: bool, al: int):
    """Combined AC table at adaptive peek width. Values carry the
    scan's point transform (<< al) already applied; EOBn is combined
    too when code + run bits fit (progressive only — in baseline EOBn
    is the loud 'AC run past block end', kind 30, exactly as the
    per-symbol decoder treated s == 0 with 0 < r < 15)."""
    key = ("ac", bits, vals, progressive, al)
    hit = _COMB_CACHE.get(key)
    if hit is not None:
        return hit
    w = min(16, _max_code_len(bits) + _MAG_SLACK)
    lut = [(0, 31, 0)] * (1 << w)
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            base = code << (w - ln)
            span = 1 << (w - ln)
            rs = vals[k]
            r, s = rs >> 4, rs & 0x0F
            if s:
                if ln + s <= w:
                    rep = 1 << (w - ln - s)
                    half = 1 << (s - 1)
                    ext = [
                        (
                            ln + s,
                            r,
                            (v if v >= half else v - 2 * half + 1) << al,
                        )
                        for v in range(1 << s)
                    ]
                    lut[base : base + span] = (
                        ext
                        if rep == 1
                        else [e for e in ext for _ in range(rep)]
                    )
                else:
                    lut[base : base + span] = [(ln, 18, rs)] * span
            elif r == 15:
                lut[base : base + span] = [(ln, 16, 0)] * span
            elif r == 0:
                lut[base : base + span] = [(ln, 17, 0)] * span
            elif not progressive:
                lut[base : base + span] = [(ln, 30, 0)] * span
            elif ln + r <= w:
                rep = 1 << (w - ln - r)
                eobs = [
                    (ln + r, 17, (1 << r) - 1 + v) for v in range(1 << r)
                ]
                lut[base : base + span] = (
                    eobs if rep == 1 else [e for e in eobs for _ in range(rep)]
                )
            else:
                lut[base : base + span] = [(ln, 18, rs)] * span
            code += 1
            k += 1
        code <<= 1
    out = (64 - w, (1 << w) - 1, lut)
    if len(_COMB_CACHE) < 24:
        _COMB_CACHE[key] = out
    return out


def _code_lut(bits, vals):
    """Code-only resolver at the table's own max code length W0: every
    assigned W0-bit prefix maps to its (code length, symbol); unassigned
    prefixes stay (0, -1) and fail loud at lookup. Tiny (2^W0 entries —
    256 for the encoder's fixed tables) and therefore cache-resident;
    the refinement scans use it, since their magnitude bits depend on
    block state and can't be combined. Returns (shift, mask, lut)."""
    key = ("code", bits, vals)
    hit = _COMB_CACHE.get(key)
    if hit is not None:
        return hit
    w = _max_code_len(bits)
    lut = [(0, -1)] * (1 << w)
    code = 0
    k = 0
    for ln in range(1, 17):
        n = bits[ln - 1]
        if code + n > (1 << ln):
            raise ValueError(
                "JPEG DHT over-subscribed: "
                f"{n} codes at length {ln} exceed canonical capacity"
            )
        for _ in range(n):
            base = code << (w - ln)
            span = 1 << (w - ln)
            lut[base : base + span] = [(ln, vals[k])] * span
            code += 1
            k += 1
        code <<= 1
    out = (64 - w, (1 << w) - 1, lut)
    if len(_COMB_CACHE) < 24:
        _COMB_CACHE[key] = out
    return out


def _split_entropy(payload: bytes, pos: int):
    """Unstuffed entropy segments from ``pos`` to the scan-terminating
    marker: 0xFF00 -> literal 0xFF, RSTn splits segments (predictors
    reset per segment), anything else ends the scan. Returns
    (segments, end_pos_at_marker).

    Round 14: the per-byte copy loop measured ~45% of a whole baseline
    decode (cProfile); entropy data is almost entirely non-0xFF bytes,
    so find the 0xFF positions vectorized and stitch the in-between
    slices — Python work scales with the MARKER count, not the byte
    count."""
    n = len(payload)
    ffs = np.flatnonzero(
        np.frombuffer(payload, dtype=np.uint8)[pos:] == 0xFF
    )
    segs = []
    parts = []
    start = pos
    for fp in (ffs + pos).tolist():
        if fp < start:  # consumed as the second byte of a prior token
            continue
        if fp + 1 >= n:
            raise ValueError("JPEG scan ends without a terminating marker")
        m = payload[fp + 1]
        if m == 0x00:  # stuffed: keep the literal 0xFF, drop the 0x00
            parts.append(payload[start : fp + 1])
            start = fp + 2
        elif 0xD0 <= m <= 0xD7:  # RSTn
            parts.append(payload[start:fp])
            segs.append(b"".join(parts))
            parts = []
            start = fp + 2
        else:
            parts.append(payload[start:fp])
            segs.append(b"".join(parts))
            return segs, fp
    raise ValueError("JPEG scan ends without a terminating marker")


def decode_jpeg(payload: bytes):
    """Decode a baseline sequential OR progressive JPEG. Returns
    (width, height, uint8 ndarray): (h, w, 1) for grayscale, (h, w, 3)
    RGB for YCbCr. Progressive (SOF2, round 12) runs every scan —
    spectral selection bands, successive-approximation first and
    refinement passes for both DC and AC, EOBRUN — into one persistent
    per-component coefficient store (T.81 G.2), then reconstructs once;
    baseline rides the same store with a single full-spectrum scan.
    Loud ValueError on anything outside the supported profile
    (arithmetic coding, hierarchical, 12-bit)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (SOI missing)")
    pos = 2
    qt = {}
    dc_tabs = {}
    ac_tabs = {}
    frame = None
    state = None
    ri = 0
    n = len(payload)
    while True:
        if pos + 1 >= n:
            raise ValueError("JPEG marker stream truncated")
        if payload[pos] != 0xFF:
            raise ValueError(
                f"expected a JPEG marker at byte {pos}, got"
                f" 0x{payload[pos]:02x}"
            )
        while pos < n and payload[pos] == 0xFF:
            pos += 1  # fill bytes are legal between markers
        if pos >= n:
            raise ValueError("JPEG marker stream truncated")
        m = payload[pos]
        pos += 1
        if m == 0xD9:  # EOI
            if state is None or not state["scanned"]:
                raise ValueError("JPEG has no scan (EOI before SOS)")
            return _reconstruct(frame, state, qt)
        if pos + 2 > n:
            raise ValueError("JPEG segment length truncated")
        (ln,) = struct.unpack(">H", payload[pos : pos + 2])
        seg = payload[pos + 2 : pos + ln]
        if len(seg) != ln - 2:
            raise ValueError("JPEG segment data truncated")
        pos += ln
        if m == 0xDB:  # DQT
            q = 0
            while q < len(seg):
                pq, tq = seg[q] >> 4, seg[q] & 0x0F
                if pq != 0:
                    raise ValueError(
                        "16-bit quantization tables are not supported"
                    )
                tab = np.frombuffer(
                    seg[q + 1 : q + 65], dtype=np.uint8
                ).astype(np.int64)
                if tab.size != 64:
                    raise ValueError("DQT table truncated")
                qt[tq] = tab
                q += 65
        elif m in (0xC0, 0xC1, 0xC2):  # baseline / ext. seq. / progressive
            if len(seg) < 6:
                raise ValueError("JPEG SOF segment truncated")
            prec, fh, fw, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError(f"{prec}-bit JPEG precision unsupported")
            if fw == 0 or fh == 0:
                raise ValueError("malformed JPEG dimensions")
            if len(seg) < 6 + 3 * nc:
                raise ValueError("JPEG SOF component list truncated")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq}
                )
            frame = {
                "w": fw,
                "h": fh,
                "comps": comps,
                "progressive": m == 0xC2,
            }
            state = _init_state(frame)
        elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline sequential and progressive JPEG are"
                f" supported (SOF marker 0xff{m:02x})"
            )
        elif m == 0xC4:  # DHT
            q = 0
            while q < len(seg):
                tc, th = seg[q] >> 4, seg[q] & 0x0F
                bits = list(seg[q + 1 : q + 17])
                cnt = sum(bits)
                vals = list(seg[q + 17 : q + 17 + cnt])
                if len(bits) != 16 or len(vals) != cnt:
                    raise ValueError("DHT table truncated")
                # validate canonically (loud on over-subscription;
                # _code_lut is cached so this is free on repeats) and
                # keep the raw (bits, vals) — the scan dispatcher builds
                # the combined/code-only tables it needs from them
                bits_t, vals_t = tuple(bits), tuple(vals)
                _code_lut(bits_t, vals_t)
                (dc_tabs if tc == 0 else ac_tabs)[th] = (bits_t, vals_t)
                q += 17 + cnt
        elif m == 0xDD:  # DRI
            if len(seg) < 2:
                raise ValueError("JPEG DRI segment truncated")
            (ri,) = struct.unpack(">H", seg[:2])
        elif m == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            if not seg:
                raise ValueError("JPEG SOS segment truncated")
            ns = seg[0]
            if len(seg) < 1 + 2 * ns + 3:
                raise ValueError("JPEG SOS segment truncated")
            scan = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c : 3 + 2 * c]
                comp = next(
                    (x for x in frame["comps"] if x["id"] == cs), None
                )
                if comp is None:
                    raise ValueError(f"SOS names unknown component {cs}")
                scan.append((comp, tt >> 4, tt & 0x0F))
            ss, se, a = seg[1 + 2 * ns : 4 + 2 * ns]
            ah, al = a >> 4, a & 0x0F
            if frame["progressive"]:
                if ss == 0 and se != 0:
                    raise ValueError("progressive DC scan must have Se=0")
                if ss > 0 and (ns != 1 or se < ss or se > 63):
                    raise ValueError("malformed progressive AC scan band")
                if ah != 0 and ah != al + 1:
                    raise ValueError(
                        "successive approximation must refine one bit"
                    )
            elif (ss, se, a) != (0, 63, 0):
                raise ValueError(
                    "only full-spectrum sequential scans are supported"
                )
            segs, pos = _split_entropy(payload, pos)
            _run_scan(
                frame, state, scan, dc_tabs, ac_tabs, ri, segs,
                ss, se, ah, al,
            )
        # APPn / COM / others: skipped


def _init_state(frame):
    """Per-component zigzag-order coefficient stores (the full padded
    MCU grid) plus the shared geometry every scan needs."""
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    if hmax < 1 or vmax < 1 or hmax > 2 or vmax > 2:
        raise ValueError(f"unsupported sampling grid {hmax}x{vmax}")
    for c in frame["comps"]:
        # PER-COMPONENT bounds first: a crafted SOF can zero one
        # component's factor while another keeps hmax/vmax legal — the
        # modulo below would ZeroDivisionError instead of the loud
        # contract (round-14 fuzz catch; latent since round 12)
        if not (1 <= c["h"] <= 2 and 1 <= c["v"] <= 2):
            raise ValueError(
                f"unsupported component sampling factors"
                f" {c['h']}x{c['v']}"
            )
        if hmax % c["h"] or vmax % c["v"]:
            raise ValueError("non-dividing component sampling factors")
    mcx = -(-w // (8 * hmax))
    mcy = -(-h // (8 * vmax))
    coefs = {}
    nonint = {}
    for c in frame["comps"]:
        coefs[c["id"]] = [
            [0] * 64 for _ in range(mcx * c["h"] * mcy * c["v"])
        ]
        # non-interleaved scans cover only ceil(component dims / 8)
        # blocks — a subset of the padded interleaved grid
        cw = -(-w * c["h"] // hmax)
        chh = -(-h * c["v"] // vmax)
        nonint[c["id"]] = (-(-chh // 8), -(-cw // 8))
    return {
        "hmax": hmax,
        "vmax": vmax,
        "mcx": mcx,
        "mcy": mcy,
        "coefs": coefs,
        "nonint": nonint,
        "scanned": False,
    }


def _run_scan(frame, state, scan, dc_tabs, ac_tabs, ri, segs, ss, se, ah, al):
    """Execute one entropy-coded scan into the coefficient stores —
    baseline full-spectrum, or any progressive scan class (T.81 G.2):
    DC first / DC refinement (interleaved or not), AC first /
    AC refinement (single component, one band, with EOBRUN).

    Dispatches to a specialized loop per scan class; the shared work
    here is resolving the scan's block sequence (the per-unit MCU or
    non-interleaved addressing) ONCE into a flat list of block refs, so
    the hot loops index lists instead of recomputing geometry."""
    mcx = state["mcx"]
    progressive = frame["progressive"]
    interleaved = len(scan) > 1
    for c, td, ta in scan:
        if ss == 0 and not (progressive and ah != 0) and td not in dc_tabs:
            raise ValueError("SOS references an undefined DC table")
        if se > 0 and ta not in ac_tabs:
            raise ValueError("SOS references an undefined AC table")
    blks: list = []
    slots: list = []
    if interleaved:
        n_units = mcx * state["mcy"]
        geo = []
        for slot, (c, td, ta) in enumerate(scan):
            geo.append(
                (
                    slot,
                    c["h"],
                    c["v"],
                    state["coefs"][c["id"]],
                    mcx * c["h"],
                )
            )
        for unit in range(n_units):
            my, mx = divmod(unit, mcx)
            for slot, ch, cv, store, row_w in geo:
                for by in range(cv):
                    row = (my * cv + by) * row_w + mx * ch
                    for bx in range(ch):
                        blks.append(store[row + bx])
                        slots.append(slot)
        bpu = sum(c["h"] * c["v"] for c, _, _ in scan)
    else:
        c, td, ta = scan[0]
        nby, nbx = state["nonint"][c["id"]]
        n_units = nby * nbx
        store = state["coefs"][c["id"]]
        row_w = mcx * c["h"]
        blks = [
            store[(u // nbx) * row_w + (u % nbx)] for u in range(n_units)
        ]
        slots = [0] * n_units
        bpu = 1
    per_seg = ri if ri else n_units
    nslots = len(scan)
    if not progressive:
        dc_combs = [
            _combined_dc_table(dc_tabs[td][0], dc_tabs[td][1])
            for _, td, _ in scan
        ]
        ac_combs = [
            _combined_ac_table(ac_tabs[ta][0], ac_tabs[ta][1], False, 0)
            for _, _, ta in scan
        ]
        _scan_baseline(
            segs, per_seg, n_units, blks, slots, bpu, nslots,
            dc_combs, ac_combs,
        )
    elif ss == 0 and ah == 0:
        dc_combs = [
            _combined_dc_table(dc_tabs[td][0], dc_tabs[td][1])
            for _, td, _ in scan
        ]
        _scan_dc_first(
            segs, per_seg, n_units, blks, slots, bpu, nslots, dc_combs, al
        )
    elif ss == 0:
        _scan_dc_refine(segs, per_seg, n_units, blks, bpu, al)
    elif ah == 0:
        ta = scan[0][2]
        ac = _combined_ac_table(ac_tabs[ta][0], ac_tabs[ta][1], True, al)
        _scan_ac_first(segs, per_seg, n_units, blks, ac, ss, se, al)
    else:
        ta = scan[0][2]
        _scan_ac_refine(
            segs, per_seg, n_units, blks, _code_lut(*ac_tabs[ta]),
            ss, se, al,
        )
    state["scanned"] = True


def _seg_ranges(segs, per_seg, n_units):
    """(segment, lo_unit, hi_unit) per restart segment, loud on
    underflow — trailing unused segments stay ignored (the round-13
    contract). Each scan class builds the read structures it needs
    (windows, unpacked bits) from the raw segment."""
    seg_i = 0
    for u0 in range(0, n_units, per_seg):
        if seg_i >= len(segs):
            raise ValueError("JPEG restart interval underflow")
        seg = segs[seg_i]
        seg_i += 1
        yield seg, u0, min(u0 + per_seg, n_units)


def _dc_slow(wl, nbits, p, pred, rc, v):
    """Checked DC tail: fallback receive (code + category didn't fit the
    16-bit window) and the loud error kinds."""
    if rc == 18:
        t = v
        if p + t > nbits:
            raise ValueError("JPEG entropy data truncated")
        b = (wl[p >> 5] >> (64 - (p & 31) - t)) & ((1 << t) - 1)
        p += t
        return p, pred + (b if b >= (1 << (t - 1)) else b - (1 << t) + 1)
    if rc == 29:
        raise ValueError("invalid DC category")
    raise ValueError("invalid JPEG Huffman code")


def _ac_slow_baseline(wl, nbits, p, blk, k, rc, v):
    """Checked baseline-AC tail: fallback receive + the error kinds."""
    if rc == 18:
        k += v >> 4
        s = v & 0x0F
        if k > 63:
            raise ValueError("AC run past block end")
        if p + s > nbits:
            raise ValueError("JPEG entropy data truncated")
        b = (wl[p >> 5] >> (64 - (p & 31) - s)) & ((1 << s) - 1)
        p += s
        blk[k] = b if b >= (1 << (s - 1)) else b - (1 << s) + 1
        return p, k + 1
    if rc == 30:
        raise ValueError("AC run past block end")
    raise ValueError("invalid JPEG Huffman code")


def _blk_baseline_checked(wl, nbits, p, blk, dc, ac, pred):
    """Fully-checked baseline block decode (segment tails where the
    worst-case block budget no longer fits). Must stay semantically
    identical to the fast twins in _scan_baseline_single/_multi."""
    dsh, dmsk, dlut = dc
    ash, amsk, alut = ac
    if p >= nbits:
        raise ValueError("JPEG entropy data truncated")
    adv, rc, v = dlut[(wl[p >> 5] >> (dsh - (p & 31))) & dmsk]
    p += adv
    if p > nbits:
        raise ValueError("JPEG entropy data truncated")
    if rc:
        p, pred = _dc_slow(wl, nbits, p, pred, rc, v)
    else:
        pred += v
    blk[0] = pred
    k = 1
    while k < 64:
        if p >= nbits:
            raise ValueError("JPEG entropy data truncated")
        adv, rc, v = alut[(wl[p >> 5] >> (ash - (p & 31))) & amsk]
        p += adv
        if p > nbits:
            raise ValueError("JPEG entropy data truncated")
        if rc < 16:
            k += rc
            if k > 63:
                raise ValueError("AC run past block end")
            blk[k] = v
            k += 1
            continue
        if rc == 16:
            k += 16
            continue
        if rc == 17:
            break
        p, k = _ac_slow_baseline(wl, nbits, p, blk, k, rc, v)
    return p, pred


def _scan_baseline(
    segs, per_seg, n_units, blks, slots, bpu, nslots, dc_combs, ac_combs
):
    """Baseline full-spectrum scan. Per block: one combined-DC lookup,
    then one combined-AC lookup per coefficient; truncation checks
    hoisted to a per-block budget test. Single-component scans (every
    grayscale image, and each scan of a scan-per-component color file)
    run a specialization with the tables and predictor in locals."""
    if nslots == 1:
        _scan_baseline_single(
            segs, per_seg, n_units, blks, dc_combs[0], ac_combs[0]
        )
    else:
        _scan_baseline_multi(
            segs, per_seg, n_units, blks, slots, bpu, nslots,
            dc_combs, ac_combs,
        )


def _scan_baseline_single(segs, per_seg, n_units, blks, dc, ac):
    bound = _BLOCK_BITS_BOUND
    dsh, dmsk, dlut = dc
    ash, amsk, alut = ac
    for seg, u0, u1 in _seg_ranges(segs, per_seg, n_units):
        wl, nbits = _bit_windows(seg)
        p = 0
        pred = 0
        try:
            for bi in range(u0, u1):
                blk = blks[bi]
                if p + bound > nbits:
                    p, pred = _blk_baseline_checked(
                        wl, nbits, p, blk, dc, ac, pred
                    )
                    continue
                # fast twin of _blk_baseline_checked: no truncation
                # checks (budget proven above); the k <= 63 run check is
                # the list bounds check itself (blk has exactly 64
                # slots, so an overlong run IndexErrors -> rewrapped
                # below) — otherwise IDENTICAL semantics
                adv, rc, v = dlut[(wl[p >> 5] >> (dsh - (p & 31))) & dmsk]
                p += adv
                if rc:
                    p, pred = _dc_slow(wl, nbits, p, pred, rc, v)
                else:
                    pred += v
                blk[0] = pred
                k = 1
                while k < 64:
                    adv, rc, v = alut[
                        (wl[p >> 5] >> (ash - (p & 31))) & amsk
                    ]
                    p += adv
                    if rc < 16:
                        k += rc
                        blk[k] = v
                        k += 1
                        continue
                    if rc == 16:
                        k += 16
                        continue
                    if rc == 17:
                        break
                    p, k = _ac_slow_baseline(wl, nbits, p, blk, k, rc, v)
        except IndexError:
            # only blk[k] can index out of range here (window reads are
            # budget-guarded, LUT keys are masked): an overlong AC run
            raise ValueError("AC run past block end") from None


def _scan_baseline_multi(
    segs, per_seg, n_units, blks, slots, bpu, nslots, dc_combs, ac_combs
):
    bound = _BLOCK_BITS_BOUND
    for seg, u0, u1 in _seg_ranges(segs, per_seg, n_units):
        wl, nbits = _bit_windows(seg)
        p = 0
        preds = [0] * nslots
        for bi in range(u0 * bpu, u1 * bpu):
            blk = blks[bi]
            slot = slots[bi]
            if p + bound > nbits:
                p, preds[slot] = _blk_baseline_checked(
                    wl, nbits, p, blk, dc_combs[slot], ac_combs[slot],
                    preds[slot],
                )
                continue
            # fast twin of _blk_baseline_checked (no truncation checks)
            dsh, dmsk, dlut = dc_combs[slot]
            adv, rc, v = dlut[(wl[p >> 5] >> (dsh - (p & 31))) & dmsk]
            p += adv
            if rc:
                p, pred = _dc_slow(wl, nbits, p, preds[slot], rc, v)
            else:
                pred = preds[slot] + v
            preds[slot] = pred
            blk[0] = pred
            ash, amsk, alut = ac_combs[slot]
            k = 1
            while k < 64:
                adv, rc, v = alut[(wl[p >> 5] >> (ash - (p & 31))) & amsk]
                p += adv
                if rc < 16:
                    k += rc
                    if k > 63:
                        raise ValueError("AC run past block end")
                    blk[k] = v
                    k += 1
                    continue
                if rc == 16:
                    k += 16
                    continue
                if rc == 17:
                    break
                p, k = _ac_slow_baseline(wl, nbits, p, blk, k, rc, v)


def _scan_dc_first(
    segs, per_seg, n_units, blks, slots, bpu, nslots, dc_combs, al
):
    """Progressive DC first pass: diff-coded, point-transformed."""
    for seg, u0, u1 in _seg_ranges(segs, per_seg, n_units):
        wl, nbits = _bit_windows(seg)
        p = 0
        preds = [0] * nslots
        for bi in range(u0 * bpu, u1 * bpu):
            slot = slots[bi]
            if p >= nbits:
                raise ValueError("JPEG entropy data truncated")
            dsh, dmsk, dlut = dc_combs[slot]
            adv, rc, v = dlut[(wl[p >> 5] >> (dsh - (p & 31))) & dmsk]
            p += adv
            if p > nbits:
                raise ValueError("JPEG entropy data truncated")
            if rc:
                p, pred = _dc_slow(wl, nbits, p, preds[slot], rc, v)
            else:
                pred = preds[slot] + v
            preds[slot] = pred
            blks[bi][0] = pred << al


def _scan_dc_refine(segs, per_seg, n_units, blks, bpu, al):
    """Progressive DC refinement: one raw bit per block, read from the
    unpacked-bit bytes (indexing past the segment end IndexErrors — the
    bounds check is free and rewraps as the truncation error)."""
    bit = 1 << al
    for seg, u0, u1 in _seg_ranges(segs, per_seg, n_units):
        bb = np.unpackbits(np.frombuffer(seg, dtype=np.uint8)).tobytes()
        p = 0
        try:
            for bi in range(u0 * bpu, u1 * bpu):
                if bb[p]:
                    blks[bi][0] |= bit
                p += 1
        except IndexError:
            raise ValueError("JPEG entropy data truncated") from None


def _blk_ac_first_checked(wl, nbits, p, blk, ac, ss, se, al):
    """Fully-checked AC-first block decode (segment tails). Must stay
    semantically identical to the fast twin in _scan_ac_first."""
    ash, amsk, alut = ac
    eob = 0
    k = ss
    while k <= se:
        if p >= nbits:
            raise ValueError("JPEG entropy data truncated")
        adv, rc, v = alut[(wl[p >> 5] >> (ash - (p & 31))) & amsk]
        p += adv
        if p > nbits:
            raise ValueError("JPEG entropy data truncated")
        if rc < 16:
            k += rc
            if k > se:
                raise ValueError("AC run past the scan band")
            blk[k] = v
            k += 1
            continue
        if rc == 16:
            k += 16
            continue
        if rc == 17:
            eob = v
            break
        p, k, eob, done = _ac_first_slow(
            wl, nbits, p, blk, k, se, rc, v, al
        )
        if done:
            break
    return p, eob


def _ac_first_slow(wl, nbits, p, blk, k, se, rc, v, al):
    """Checked AC-first tail: fallback coefficient receive OR fallback
    EOBn receive (code + run bits didn't fit the 16-bit window), plus
    the error kinds. Combined-table values carry << al baked in; the
    fallback reads raw magnitude bits, so it applies the scan's point
    transform here. Returns (p, k, eobrun, band_done)."""
    if rc == 18:
        r, s = v >> 4, v & 0x0F
        if s:
            k += r
            if k > se:
                raise ValueError("AC run past the scan band")
            if p + s > nbits:
                raise ValueError("JPEG entropy data truncated")
            b = (wl[p >> 5] >> (64 - (p & 31) - s)) & ((1 << s) - 1)
            p += s
            ext = b if b >= (1 << (s - 1)) else b - (1 << s) + 1
            blk[k] = ext << al
            return p, k + 1, 0, False
        # s == 0, r in 1..14: EOBn whose run bits didn't fit the window
        if p + r > nbits:
            raise ValueError("JPEG entropy data truncated")
        b = (wl[p >> 5] >> (64 - (p & 31) - r)) & ((1 << r) - 1)
        p += r
        return p, k, (1 << r) - 1 + b, True
    raise ValueError("invalid JPEG Huffman code")


def _scan_ac_first(segs, per_seg, n_units, blks, ac, ss, se, al):
    """Progressive AC first pass (single component, one band, EOBRUN
    across blocks — reset per restart segment)."""
    bound = _BLOCK_BITS_BOUND
    ash, amsk, alut = ac
    for seg, u0, u1 in _seg_ranges(segs, per_seg, n_units):
        wl, nbits = _bit_windows(seg)
        p = 0
        eob = 0
        for bi in range(u0, u1):
            if eob > 0:
                eob -= 1
                continue
            blk = blks[bi]
            if p + bound > nbits:
                p, eob = _blk_ac_first_checked(
                    wl, nbits, p, blk, ac, ss, se, al
                )
                continue
            # fast twin of _blk_ac_first_checked (no truncation checks)
            k = ss
            while k <= se:
                adv, rc, v = alut[(wl[p >> 5] >> (ash - (p & 31))) & amsk]
                p += adv
                if rc < 16:
                    k += rc
                    if k > se:
                        raise ValueError("AC run past the scan band")
                    blk[k] = v
                    k += 1
                    continue
                if rc == 16:
                    k += 16
                    continue
                if rc == 17:
                    eob = v
                    break
                p, k, eob, done = _ac_first_slow(
                    wl, nbits, p, blk, k, se, rc, v, al
                )
                if done:
                    break


def _scan_ac_refine(segs, per_seg, n_units, blks, lut, ss, se, al):
    """Progressive AC refinement (T.81 G.2.2 / the libjpeg
    decode_mcu_AC_refine structure): run codes count ZERO-HISTORY
    positions only; every already-nonzero position passed over reads one
    correction bit. Code-only LUT (values are read bit-by-bit against
    block state, so symbol+magnitude combining doesn't apply here —
    refinement is ~1 bit per coefficient, the cheap scan class)."""
    p1 = 1 << al
    m1 = -p1
    lsh, lmsk, clut = lut
    for seg, u0, u1 in _seg_ranges(segs, per_seg, n_units):
        wl, nbits = _bit_windows(seg)
        # correction/sign bits come one at a time against block state:
        # read them from the unpacked-bit bytes (bb[p] bounds-checks for
        # free — past-the-end rewraps as the truncation error below)
        bb = np.unpackbits(np.frombuffer(seg, dtype=np.uint8)).tobytes()
        p = 0
        eob = 0
        try:
            for bi in range(u0, u1):
                blk = blks[bi]
                k = ss
                if eob == 0:
                    while k <= se:
                        if p >= nbits:
                            raise ValueError("JPEG entropy data truncated")
                        ln, rs = clut[
                            (wl[p >> 5] >> (lsh - (p & 31))) & lmsk
                        ]
                        if ln == 0:
                            raise ValueError("invalid JPEG Huffman code")
                        p += ln
                        if p > nbits:
                            raise ValueError("JPEG entropy data truncated")
                        r, s = rs >> 4, rs & 0x0F
                        newval = 0
                        if s == 0:
                            if r != 15:
                                if p + r > nbits:
                                    raise ValueError(
                                        "JPEG entropy data truncated"
                                    )
                                eob = 1 << r
                                if r:
                                    eob += (
                                        wl[p >> 5] >> (64 - (p & 31) - r)
                                    ) & ((1 << r) - 1)
                                    p += r
                                break
                            # ZRL: skip 16 zero-history positions
                        else:
                            if s != 1:
                                raise ValueError(
                                    "AC refinement magnitude must be 1 bit"
                                )
                            newval = p1 if bb[p] else m1
                            p += 1
                        while k <= se:
                            cur = blk[k]
                            if cur != 0:
                                b = bb[p]
                                p += 1
                                if b and (cur & p1) == 0:
                                    blk[k] = cur + (p1 if cur >= 0 else m1)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if newval and k <= se:
                            blk[k] = newval
                        k += 1
                if eob > 0:
                    # end-of-band: correction bits for the rest of the band
                    while k <= se:
                        cur = blk[k]
                        if cur != 0:
                            b = bb[p]
                            p += 1
                            if b and (cur & p1) == 0:
                                blk[k] = cur + (p1 if cur >= 0 else m1)
                        k += 1
                    eob -= 1
        except IndexError:
            raise ValueError("JPEG entropy data truncated") from None


def _reconstruct(frame, state, qt):
    """Dequantize + batched IDCT every component's coefficient store,
    upsample, crop, color-convert — runs once, after every scan."""
    w, h = frame["w"], frame["h"]
    hmax, vmax, mcx, mcy = (
        state["hmax"], state["vmax"], state["mcx"], state["mcy"],
    )
    full = []
    for c in frame["comps"]:
        if c["tq"] not in qt:
            raise ValueError("component references an undefined DQT")
        q = qt[c["tq"]]
        rows = state["coefs"][c["id"]]
        nbx = mcx * c["h"]
        nby = mcy * c["v"]
        zzm = np.asarray(rows, dtype=np.int64) * q  # (n, 64) dequantized
        coefs = np.zeros((len(rows), 64), dtype=np.float64)
        coefs[:, _ZZ_FLAT] = zzm
        # A.T @ F @ A over the whole block batch — two broadcast
        # matmuls, no einsum path planning per call
        blocks = (
            np.matmul(_A.T, np.matmul(coefs.reshape(-1, 8, 8), _A))
            + 128.0
        )
        plane = (
            blocks.reshape(nby, nbx, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(nby * 8, nbx * 8)
        )
        plane = np.repeat(plane, vmax // c["v"], axis=0)
        plane = np.repeat(plane, hmax // c["h"], axis=1)
        full.append(plane[:h, :w])
    if len(full) == 1:
        gray = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return w, h, gray.reshape(h, w, 1)
    if len(full) != 3:
        raise ValueError(f"unsupported component count {len(full)}")
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=-1)
    return w, h, np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# --- encoder (test/registry input construction) -------------------------------


# the encoder's fixed tables never change: build the code maps once
_ENC_DC_CODES = _canonical_codes(_DC_BITS, _DC_VALS)
_ENC_AC_CODES = _canonical_codes(_AC_BITS, _AC_VALS)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int):
        # O(bytes): append whole codes to the accumulator, drain full
        # bytes (the per-bit loop was the encoder's hot spot)
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.n) - 1

    def flush(self):
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # 1-fill pad


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dht_body(tc, th, bits, vals) -> bytes:
    return bytes([tc << 4 | th]) + bytes(bits) + bytes(vals)


def _encode_block(wtr, zz, pred, dc_codes, ac_codes):
    # zz is a plain python list of ints (see the batched fDCT caller)
    diff = zz[0] - pred
    t = _category(diff)
    code, ln = dc_codes[t]
    wtr.put(code, ln)
    if t:
        wtr.put(diff if diff >= 0 else diff + (1 << t) - 1, t)
    run = 0
    last = 63
    while last > 0 and zz[last] == 0:
        last -= 1
    for k in range(1, last + 1):
        v = zz[k]
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]
            wtr.put(code, ln)
            run -= 16
        s = _category(v)
        code, ln = ac_codes[(run << 4) | s]
        wtr.put(code, ln)
        wtr.put(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, ln = ac_codes[0x00]
        wtr.put(code, ln)
    return zz[0]


def _sos(comp_ids, ss, se, ah, al) -> bytes:
    return _seg(
        0xDA,
        bytes([len(comp_ids)])
        + b"".join(bytes([cid, 0x00]) for cid in comp_ids)
        + bytes([ss, se, (ah << 4) | al]),
    )


def _join_restart_segments(parts) -> bytes:
    """Entropy segments of one scan joined by RSTm markers (m cycles
    0..7 in emission order, per T.81 E.1.2 — matching the baseline
    writer's (count-1) % 8 convention and the decoder's per-segment
    predictor/EOBRUN reset)."""
    out = bytearray()
    for i, seg in enumerate(parts):
        if i:
            out += bytes([0xFF, 0xD0 + ((i - 1) % 8)])
        out += seg
    return bytes(out)


def _emit_progressive_scans(
    zzq, hv, nc, w, h, hmax, vmax, mcx, mcy, dc_codes, ac_codes, ri=0
) -> bytes:
    """The four-phase progressive scan script over the already-
    quantized coefficients: DC first (interleaved, Al=1) -> AC first
    per component (band 1..63, Al=1, EOBRUN-coded) -> DC refinement
    (one bit per block) -> AC refinement per component (the T.81
    G.1.2.3 correction-bit protocol). The refinement emitters mirror
    the decoder's zero-history-run semantics exactly — the round-trip
    property test (progressive decode == baseline decode, bit for bit)
    is what keeps the two sides honest.

    ``ri`` (round 13): DRI restart interval — every scan chunks its
    units (MCUs when interleaved, blocks when single-component, per
    T.81 E.1.2) into ri-sized segments joined by RSTm markers; DC
    predictors, EOBRUN, and pending correction bits all reset at the
    segment boundary because each segment gets a fresh emitter."""
    out = bytearray()
    AL = 1  # first-pass point transform; one refinement to Al=0

    def chunks(n_units):
        per = ri if ri else n_units
        return [
            (s, min(s + per, n_units)) for s in range(0, n_units, per)
        ]

    def nonint_dims(ci):
        ch, cv = hv[ci]
        comp_h = -(-(h * cv) // vmax)
        comp_w = -(-(w * ch) // hmax)
        return (-(-comp_h // 8), -(-comp_w // 8))

    def comp_blocks(ci):
        nby, nbx = nonint_dims(ci)
        return [zzq[ci][r][c] for r in range(nby) for c in range(nbx)]

    # --- scan 1: DC first, all components interleaved, Al=AL ---
    out += _sos([ci + 1 for ci in range(nc)], 0, 0, 0, AL)
    parts = []
    for s0, s1 in chunks(mcx * mcy):
        wtr = _BitWriter()
        preds = [0] * nc
        for mcu in range(s0, s1):
            my, mx = divmod(mcu, mcx)
            for ci in range(nc):
                ch, cv = hv[ci]
                for by in range(cv):
                    for bx in range(ch):
                        dc = zzq[ci][my * cv + by][mx * ch + bx][0] >> AL
                        diff = dc - preds[ci]
                        preds[ci] = dc
                        t = _category(diff)
                        code, ln = dc_codes[t]
                        wtr.put(code, ln)
                        if t:
                            wtr.put(
                                diff if diff >= 0
                                else diff + (1 << t) - 1,
                                t,
                            )
        wtr.flush()
        parts.append(bytes(wtr.out))
    out += _join_restart_segments(parts)
    # --- scan 2: AC first per component, band 1..63, Al=AL ---
    for ci in range(nc):
        out += _sos([ci + 1], 1, 63, 0, AL)
        blocks = comp_blocks(ci)
        out += _join_restart_segments(
            [
                _emit_ac_first(blocks[s0:s1], 1, 63, AL, ac_codes)
                for s0, s1 in chunks(len(blocks))
            ]
        )
    # --- scan 3: DC refinement (no Huffman: one raw bit per block) ---
    out += _sos([ci + 1 for ci in range(nc)], 0, 0, AL, AL - 1)
    parts = []
    for s0, s1 in chunks(mcx * mcy):
        wtr = _BitWriter()
        for mcu in range(s0, s1):
            my, mx = divmod(mcu, mcx)
            for ci in range(nc):
                ch, cv = hv[ci]
                for by in range(cv):
                    for bx in range(ch):
                        dc = zzq[ci][my * cv + by][mx * ch + bx][0]
                        wtr.put((dc >> (AL - 1)) & 1, 1)
        wtr.flush()
        parts.append(bytes(wtr.out))
    out += _join_restart_segments(parts)
    # --- scan 4: AC refinement per component ---
    for ci in range(nc):
        out += _sos([ci + 1], 1, 63, AL, AL - 1)
        blocks = comp_blocks(ci)
        out += _join_restart_segments(
            [
                _emit_ac_refine(blocks[s0:s1], 1, 63, AL - 1, ac_codes)
                for s0, s1 in chunks(len(blocks))
            ]
        )
    return bytes(out)


def _emit_ac_first(blocks, ss, se, al, ac_codes) -> bytes:
    """Progressive AC first pass: run/size over the point-transformed
    band, end-of-band runs accumulated across blocks (EOBn)."""
    wtr = _BitWriter()
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            nb = eobrun.bit_length() - 1
            code, ln = ac_codes[nb << 4]
            wtr.put(code, ln)
            if nb:
                wtr.put(eobrun - (1 << nb), nb)
            eobrun = 0

    for blk in blocks:
        band = [
            ((abs(blk[k]) >> al) if blk[k] >= 0 else -(abs(blk[k]) >> al))
            for k in range(ss, se + 1)
        ]
        last = len(band) - 1
        while last >= 0 and band[last] == 0:
            last -= 1
        if last < 0:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
            continue
        flush_eob()
        r = 0
        for v in band[: last + 1]:
            if v == 0:
                r += 1
                continue
            while r > 15:
                code, ln = ac_codes[0xF0]
                wtr.put(code, ln)
                r -= 16
            s = _category(v)
            code, ln = ac_codes[(r << 4) | s]
            wtr.put(code, ln)
            wtr.put(v if v >= 0 else v + (1 << s) - 1, s)
            r = 0
        if last < len(band) - 1:
            eobrun += 1
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()
    wtr.flush()
    return bytes(wtr.out)


def _emit_ac_refine(blocks, ss, se, al, ac_codes) -> bytes:
    """Progressive AC refinement (T.81 G.1.2.3, the libjpeg
    encode_mcu_AC_refine structure): run codes count ZERO-HISTORY
    positions only; correction bits for already-nonzero positions ride
    after the next emitted symbol (or with the EOBRUN flush)."""
    wtr = _BitWriter()
    eobrun = 0
    # TWO correction-bit pools, exactly the libjpeg BE/BR split: bits
    # accumulated during EOB-run blocks ride the EOBRUN symbol; bits
    # accumulated in the CURRENT block since its last symbol ride the
    # NEXT symbol of this block (the decoder reads them while advancing
    # over already-nonzero positions after each run code)
    eob_pend: list = []

    def flush_eob():
        nonlocal eobrun
        if eobrun:
            nb = eobrun.bit_length() - 1
            code, ln = ac_codes[nb << 4]
            wtr.put(code, ln)
            if nb:
                wtr.put(eobrun - (1 << nb), nb)
            eobrun = 0
            for b in eob_pend:
                wtr.put(b, 1)
            eob_pend.clear()

    for blk in blocks:
        absv = [abs(blk[k]) >> al for k in range(ss, se + 1)]
        eob_i = -1  # index (in band) of the last NEWLY-significant coef
        for i, t in enumerate(absv):
            if t == 1:
                eob_i = i
        r = 0
        cur: list = []  # this block's corrections since its last symbol
        for i, t in enumerate(absv):
            if t == 0:
                r += 1
                continue
            while r > 15 and i <= eob_i:
                flush_eob()
                code, ln = ac_codes[0xF0]
                wtr.put(code, ln)
                r -= 16
                for b in cur:
                    wtr.put(b, 1)
                cur = []
            if t > 1:
                # already significant at coarser precision: buffer the
                # correction bit; runs pass over it without counting it
                cur.append(t & 1)
                continue
            flush_eob()
            code, ln = ac_codes[(r << 4) | 1]
            wtr.put(code, ln)
            wtr.put(1 if blk[ss + i] >= 0 else 0, 1)
            for b in cur:
                wtr.put(b, 1)
            cur = []
            r = 0
        if r > 0 or cur:
            eobrun += 1
            eob_pend.extend(cur)
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()
    wtr.flush()
    return bytes(wtr.out)


def encode_jpeg(
    arr,
    quant=None,
    subsample: bool = False,
    restart_interval: int = 0,
    progressive: bool = False,
) -> bytes:
    """JPEG writer for (h, w) / (h, w, 1) grayscale or (h, w, 3) RGB
    uint8 — 4:4:4 by default, 4:2:0 with ``subsample`` (chroma
    box-averaged). ``quant`` is a flat 64-entry zigzag-order table
    applied to every component (default all-8s: DC of a constant block
    codes exactly to value-128 — the integer-exact construction
    mm_decode_jpeg's oracle replays). Fixed-length canonical Huffman
    tables, written as standard DHT segments.

    ``progressive`` emits SOF2 with the four-phase scan script (DC
    first at Al=1, per-component AC 1..63 first at Al=1, DC
    refinement, per-component AC refinement) — the same quantized
    coefficients delivered across successive-approximation passes, so
    the decode is bit-identical to the baseline encoding's.
    Progressive + restart_interval (round 13) chunks every scan into
    DRI-sized restart segments (MCUs interleaved, blocks otherwise,
    per T.81 E.1.2) — constructing inputs for the decoder's
    progressive-restart path, which it always handled."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in (1, 3):
        raise ValueError(
            f"encode_jpeg needs (h, w[, 1|3]), got shape {arr.shape}"
        )
    h, w, nc = arr.shape
    if quant is None:
        quant = np.full(64, 8, dtype=np.int64)
    quant = np.asarray(quant, dtype=np.int64).reshape(64)
    if quant.min() < 1 or quant.max() > 255:
        raise ValueError("quant entries must be in [1, 255]")
    if subsample and nc == 1:
        raise ValueError("subsample applies to color images only")
    if subsample not in (False, True, "420", "422"):
        raise ValueError(f"unknown subsample mode {subsample!r}")

    if nc == 3:
        f = arr.astype(np.float64)
        y = (
            0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
        )
        cb = 128.0 - 0.168736 * f[:, :, 0] - 0.331264 * f[:, :, 1] + 0.5 * f[:, :, 2]
        cr = 128.0 + 0.5 * f[:, :, 0] - 0.418688 * f[:, :, 1] - 0.081312 * f[:, :, 2]
        chans = [y, cb, cr]
    else:
        chans = [arr[:, :, 0].astype(np.float64)]

    # subsample: True/"420" halves chroma on both axes, "422" only
    # horizontally (luma (2,1) — the broadcast-TV sampling)
    if not subsample:
        hv = [(1, 1)] * nc
    elif subsample == "422":
        hv = [(2, 1), (1, 1), (1, 1)]
    else:
        hv = [(2, 2), (1, 1), (1, 1)]
    hmax = max(x for x, _ in hv[:nc])
    vmax = max(x for _, x in hv[:nc])
    mcx = -(-w // (8 * hmax))
    mcy = -(-h // (8 * vmax))

    planes = []
    for ci in range(nc):
        ch, cv = hv[ci]
        pw, ph = mcx * ch * 8, mcy * cv * 8
        src = chans[ci]
        if (hmax // ch, vmax // cv) != (1, 1):
            # box-average subsampling, edge-replicated to even dims
            sy, sx = vmax // cv, hmax // ch
            ey = -(-src.shape[0] // sy) * sy
            ex = -(-src.shape[1] // sx) * sx
            pad = np.pad(
                src,
                ((0, ey - src.shape[0]), (0, ex - src.shape[1])),
                mode="edge",
            )
            src = pad.reshape(ey // sy, sy, ex // sx, sx).mean(axis=(1, 3))
        p = np.pad(
            src,
            ((0, ph - src.shape[0]), (0, pw - src.shape[1])),
            mode="edge",
        )
        planes.append(p - 128.0)

    dc_codes = _ENC_DC_CODES
    ac_codes = _ENC_AC_CODES

    # forward DCT + quantize BATCHED per component (one einsum over the
    # (nby, nbx, 8, 8) block view — the per-block numpy overhead was
    # the encoder's dominant cost, mirroring the decode-side fix)
    zzq = []
    for ci in range(nc):
        p = planes[ci]
        nby, nbx = p.shape[0] // 8, p.shape[1] // 8
        blocks = np.ascontiguousarray(
            p.reshape(nby, 8, nbx, 8).transpose(0, 2, 1, 3)
        )
        coefs = np.matmul(_A, np.matmul(blocks, _A.T))
        zzq.append(
            np.round(coefs.reshape(nby, nbx, 64)[:, :, _ZZ_FLAT] / quant)
            .astype(np.int64)
            .tolist()  # python ints: the entropy loop reads 64 scalars
            # per block, and numpy-scalar indexing dominated it
        )

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xDB, bytes([0x00]) + bytes(int(x) for x in quant))
    comps = b"".join(
        bytes([ci + 1, hv[ci][0] << 4 | hv[ci][1], 0]) for ci in range(nc)
    )
    out += _seg(
        0xC2 if progressive else 0xC0,
        struct.pack(">BHHB", 8, h, w, nc) + comps,
    )
    out += _seg(0xC4, _dht_body(0, 0, _DC_BITS, _DC_VALS))
    out += _seg(0xC4, _dht_body(1, 0, _AC_BITS, _AC_VALS))
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    if progressive:
        out += _emit_progressive_scans(
            zzq, hv, nc, w, h, hmax, vmax, mcx, mcy, dc_codes, ac_codes,
            ri=restart_interval,
        )
        out += b"\xff\xd9"  # EOI
        return bytes(out)
    out += _seg(
        0xDA,
        bytes([nc])
        + b"".join(bytes([ci + 1, 0x00]) for ci in range(nc))
        + bytes([0, 63, 0]),
    )

    wtr = _BitWriter()
    preds = [0] * nc
    n_mcu = mcx * mcy
    for mcu in range(n_mcu):
        if restart_interval and mcu and mcu % restart_interval == 0:
            wtr.flush()
            out += wtr.out
            out += bytes(
                [0xFF, 0xD0 + ((mcu // restart_interval - 1) % 8)]
            )
            wtr = _BitWriter()
            preds = [0] * nc
        my, mx = divmod(mcu, mcx)
        for ci in range(nc):
            ch, cv = hv[ci]
            for by in range(cv):
                for bx in range(ch):
                    preds[ci] = _encode_block(
                        wtr,
                        zzq[ci][my * cv + by][mx * ch + bx],
                        preds[ci],
                        dc_codes,
                        ac_codes,
                    )
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
