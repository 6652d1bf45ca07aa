"""WAV (RIFF/WAVE) PCM codec — pure stdlib + numpy, no codec library.

Round 13: the multimodal family's AUDIO modality gets a real
byte->samples path (the image formats got theirs in rounds 9-13; audio
previously had only the deterministic fake-feature face). Per the
public RIFF/WAVE layout (Microsoft/IBM multimedia programming
interface spec; the de-facto canonical PCM container): RIFF header,
chunk walk with word-aligned (odd-size padded) sub-chunks, 'fmt '
validation (PCM format tag, block-align and byte-rate consistency),
'data' frame extraction. Supported sample layouts: 8-bit unsigned and
16/24/32-bit signed little-endian integer PCM (format tag 1 — 24-bit
sign-extended to int32, the studio-audio layout), 32/64-bit IEEE-float
PCM (format tag 3), IMA/DVI ADPCM (format tag 0x11 — round 14: the
IMA Recommended Practices 4-bit shift-add quantizer, per-channel block
headers carrying the initial sample and step-table index,
low-nibble-first packing, 4-byte-per-channel interleave, `fact`-chunk
sample trimming), G.711 telephony companding (tags 6/7 — A-law and
mu-law per the ITU-T reference segment+mantissa expansion, late
round 14), and WAVE_FORMAT_EXTENSIBLE (tag 0xFFFE — round 14:
the mandatory container for >16-bit or >2-channel PCM per Microsoft's
multichannel spec; the SubFormat GUID resolves back to PCM or float,
full-container valid bits only), any channel count. Everything else —
Microsoft ADPCM (tag 2), non-PCM extensible subformats,
sub-container valid bits, misaligned data sizes, trailing garbage
that is not a well-formed chunk — fails with a loud ValueError, never
a fake fallback (the decode_image family contract).

The encoder twin constructs valid inputs for tests and the registry
face (multimodal.mm_decode_wav), including extra skippable chunks and
odd-size padding, so the decoder's chunk walk is exercised for real.
"""

from __future__ import annotations

import struct

import numpy as np

# IMA ADPCM quantizer tables (IMA Recommended Practices for Enhancing
# Digital Audio Compatibility in Multimedia Systems, rev 3.00 — the
# public DVI/IMA spec; identical tables in every conforming codec)
_IMA_STEPS = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767,
)
_IMA_INDEX = (-1, -1, -1, -1, 2, 4, 6, 8)

# MS-ADPCM (format tag 2 — late round 14): the classic Microsoft
# 4-bit predictive codec per the public WAVEFORMAT_ADPCM layout —
# per-block per-channel headers (predictor-coefficient index, initial
# iDelta, the two seed samples, sample2 EARLIER than sample1), signed
# nibbles HIGH-first (the opposite packing of IMA), the 16-entry
# adaptation table, and the 7 standard coefficient pairs (a file may
# declare more; the indices its blocks use must exist).
_MS_ADAPT = (
    230, 230, 230, 230, 307, 409, 512, 614,
    768, 614, 512, 409, 307, 230, 230, 230,
)
_MS_COEFS = (
    (256, 0), (512, -256), (0, 0), (192, 64),
    (240, 0), (460, -208), (392, -232),
)


def _ms_step(s1: int, s2: int, delta: int, c1: int, c2: int, n: int):
    """One MS-ADPCM decode step for SIGNED nibble ``n`` (-8..7):
    returns (sample, new_delta). The coefficient predictor divides by
    256 TRUNCATING TOWARD ZERO, matching the reference recipe's C
    integer division ((s1*c1 + s2*c2)/256) — a floor shift differs by
    one for negative sums (e.g. coefficient pairs with negative c2)
    and the error compounds through the prediction feedback (round-15
    ADVICE fix; the registry face's (256, 0) pair never exercises a
    negative product, which is why roundtrips stayed green). Output
    clamps to int16; delta floors at 16."""
    t = s1 * c1 + s2 * c2
    pred = (t >> 8) if t >= 0 else -((-t) >> 8)
    sample = pred + delta * n
    if sample > 32767:
        sample = 32767
    elif sample < -32768:
        sample = -32768
    new_delta = (_MS_ADAPT[n & 0x0F] * delta) >> 8
    if new_delta < 16:
        new_delta = 16
    return sample, new_delta


# G.711 companded telephony layouts (format tags 6 = A-law, 7 =
# mu-law — late round 14): 256-entry decode tables built from the
# ITU-T G.711 reference recipes (the classic alaw2linear/ulaw2linear
# segment+mantissa expansion; mu-law BIAS 0x84, A-law XOR 0x55).
# Values are the reference's 13/14-bit linear scale carried as int16
# WITHOUT further shifting — documented, and pinned by the known
# anchor points (both mu-law zeros, A-law +/-8 at the XOR fixpoint).


def _g711_tables():
    ulaw = np.empty(256, dtype=np.int16)
    for b in range(256):
        u = ~b & 0xFF
        t = ((u & 0x0F) << 3) + 0x84
        t <<= (u & 0x70) >> 4
        ulaw[b] = (0x84 - t) if (u & 0x80) else (t - 0x84)
    alaw = np.empty(256, dtype=np.int16)
    for b in range(256):
        a = b ^ 0x55
        t = (a & 0x0F) << 4
        seg = (a & 0x70) >> 4
        if seg == 0:
            t += 8
        elif seg == 1:
            t += 0x108
        else:
            t += 0x108
            t <<= seg - 1
        alaw[b] = t if (a & 0x80) else -t
    return ulaw, alaw


_ULAW_TABLE, _ALAW_TABLE = _g711_tables()

# WAVE_FORMAT_EXTENSIBLE SubFormat GUID tail: every KSDATAFORMAT
# subtype is <16-bit format tag> 00 00 + this fixed 14-byte suffix
# (Microsoft's ksmedia.h base GUID 00000000-0000-0010-8000-00AA00389B71)
_EXT_GUID_TAIL = bytes(
    (0x00, 0x00, 0x10, 0x00, 0x80, 0x00, 0x00, 0xAA,
     0x00, 0x38, 0x9B, 0x71)
)


def _ima_step(pred: int, idx: int, n: int):
    """One IMA ADPCM decode step: nibble ``n`` against (predictor,
    step index) state. The shift-add diff form is the spec's exact
    integer recipe (NOT the (2m+1)*step/8 approximation some codecs
    use) — encoder and decoder must share it bit-for-bit."""
    step = _IMA_STEPS[idx]
    diff = step >> 3
    if n & 1:
        diff += step >> 2
    if n & 2:
        diff += step >> 1
    if n & 4:
        diff += step
    if n & 8:
        pred -= diff
    else:
        pred += diff
    if pred > 32767:
        pred = 32767
    elif pred < -32768:
        pred = -32768
    idx += _IMA_INDEX[n & 7]
    if idx < 0:
        idx = 0
    elif idx > 88:
        idx = 88
    return pred, idx


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
    fact = None
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
        elif ckid == b"fact":
            fact = body
        # other chunks (LIST, cue , ...) are skipped by framing
        pos += 8 + cksize + (cksize & 1)  # word-aligned: odd sizes pad
    if fmt is None or data is None:
        raise ValueError("WAV missing its fmt or data chunk")
    if len(fmt) < 16:
        raise ValueError("WAV fmt chunk shorter than the PCM layout")
    tag, ch, rate, byte_rate, block_align, bits = struct.unpack(
        "<HHIIHH", fmt[:16]
    )
    if tag == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE: resolve the SubFormat
        if len(fmt) < 40:
            raise ValueError(
                "extensible WAV fmt chunk shorter than the 40-byte layout"
            )
        (valid_bits,) = struct.unpack("<H", fmt[18:20])
        sub_tag = struct.unpack("<H", fmt[24:26])[0]
        if fmt[26:28] != b"\x00\x00" or fmt[28:40] != _EXT_GUID_TAIL:
            raise ValueError(
                "extensible WAV SubFormat GUID is not a KSDATAFORMAT"
                " subtype"
            )
        if sub_tag not in (1, 3):
            raise ValueError(
                f"unsupported extensible WAV subformat {sub_tag}"
                " (PCM or IEEE-float only); no fake fallback"
            )
        if valid_bits != bits:
            raise ValueError(
                f"extensible WAV valid bits {valid_bits} !="
                f" container bits {bits} (full-container only)"
            )
        tag = sub_tag
    if tag not in (1, 2, 3, 6, 7, 0x11):
        raise ValueError(
            f"unsupported WAV format tag {tag} (integer PCM, IEEE-float"
            " PCM, G.711 a-law/mu-law, MS-ADPCM, or IMA ADPCM only);"
            " no fake fallback"
        )
    if ch == 0 or rate == 0:
        raise ValueError("malformed WAV fmt (zero channels or rate)")
    if tag == 0x11:
        return _decode_ima(fmt, data, fact, ch, rate, block_align, bits)
    if tag == 2:
        return _decode_ms_adpcm(fmt, data, fact, ch, rate, block_align,
                                bits)
    if tag in (6, 7):  # G.711: one companded byte per sample
        if bits != 8:
            raise ValueError(
                f"G.711 WAV bit depth must be 8, got {bits}"
            )
        if block_align != ch:
            raise ValueError(
                f"G.711 WAV block align {block_align} inconsistent"
                f" with {ch} channel(s)"
            )
        if len(data) % ch:
            raise ValueError(
                f"G.711 WAV data size {len(data)} not a multiple of"
                f" the {ch}-byte frame"
            )
        table = _ALAW_TABLE if tag == 6 else _ULAW_TABLE
        samples = table[np.frombuffer(data, dtype=np.uint8)].reshape(
            -1, ch
        )
        return ch, rate, 8, samples.copy()
    if tag == 3 and bits not in (32, 64):
        raise ValueError(
            f"unsupported float WAV bit depth {bits} (32/64-bit only)"
        )
    if tag == 1 and bits not in (8, 16, 24, 32):
        raise ValueError(
            f"unsupported WAV bit depth {bits} (8/16/24/32 PCM)"
        )
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
        dt = "<f4" if bits == 32 else "<f8"
        samples = np.frombuffer(data, dtype=dt).reshape(n_frames, ch)
        return ch, rate, bits, samples.astype(
            np.float32 if bits == 32 else np.float64
        )
    if bits == 24:
        # 3-byte LE frames sign-extended to int32: numpy has no 3-byte
        # dtype, so widen via a uint8 view (b0 | b1<<8 | b2<<16, then
        # shift-extend the sign through bit 23)
        b = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        v = (
            b[:, 0].astype(np.int32)
            | (b[:, 1].astype(np.int32) << 8)
            | (b[:, 2].astype(np.int32) << 16)
        )
        v = (v << 8) >> 8
        return ch, rate, bits, v.reshape(n_frames, ch)
    dt = {8: np.dtype(np.uint8), 16: np.dtype("<i2"),
          32: np.dtype("<i4")}[bits]
    samples = np.frombuffer(data, dtype=dt).reshape(n_frames, ch)
    if bits == 16:
        samples = samples.astype(np.int16)
    elif bits == 32:
        samples = samples.astype(np.int32)
    return ch, rate, bits, samples


def _decode_ima(fmt, data, fact, ch, rate, block_align, bits):
    """IMA ADPCM block decode (format tag 0x11). Block layout per the
    public IMA-in-RIFF mapping: per channel a 4-byte header (int16
    initial output sample, uint8 step-table index, reserved byte),
    then 4-byte-per-channel interleaved nibble words, low nibble
    first. Returns (ch, rate, 4, int16 (n_frames, ch) samples) —
    trimmed to the `fact` chunk's per-channel sample count when
    present (required by RIFF for compressed formats; tolerated
    absent). Loud on every inconsistency — never a partial decode."""
    if bits != 4:
        raise ValueError(
            f"IMA ADPCM bit depth must be 4, got {bits}"
        )
    if len(fmt) < 20:
        raise ValueError("IMA ADPCM fmt chunk missing wSamplesPerBlock")
    (cb,) = struct.unpack("<H", fmt[16:18])
    if cb < 2:
        raise ValueError("IMA ADPCM fmt cbSize must cover wSamplesPerBlock")
    (spb,) = struct.unpack("<H", fmt[18:20])
    if block_align <= 4 * ch or (block_align - 4 * ch) % (4 * ch):
        raise ValueError(
            f"IMA ADPCM block align {block_align} not a header plus"
            f" whole 4-byte words for {ch} channel(s)"
        )
    words = (block_align - 4 * ch) // (4 * ch)  # 4-byte words per channel
    expect_spb = 1 + 8 * words
    if spb != expect_spb:
        raise ValueError(
            f"IMA ADPCM wSamplesPerBlock {spb} inconsistent with block"
            f" align {block_align} ({expect_spb} expected)"
        )
    if len(data) % block_align:
        raise ValueError(
            f"IMA ADPCM data size {len(data)} not a multiple of the"
            f" {block_align}-byte block"
        )
    n_blocks = len(data) // block_align
    total = n_blocks * spb
    if fact is not None:
        if len(fact) < 4:
            raise ValueError("WAV fact chunk truncated")
        (fact_len,) = struct.unpack("<I", fact[:4])
        if not (total - spb < fact_len <= total):
            raise ValueError(
                f"WAV fact sample count {fact_len} inconsistent with"
                f" {n_blocks} block(s) of {spb}"
            )
    else:
        fact_len = total
    out = np.empty((total, ch), dtype=np.int16)
    for b in range(n_blocks):
        base = b * block_align
        row = b * spb
        for c in range(ch):
            hoff = base + 4 * c
            pred, idx, _rsv = struct.unpack(
                "<hBB", data[hoff : hoff + 4]
            )
            if idx > 88:
                raise ValueError(
                    f"IMA ADPCM step index {idx} out of range (0..88)"
                )
            out[row, c] = pred
            k = row + 1
            dbase = base + 4 * ch
            for wd in range(words):
                woff = dbase + 4 * (wd * ch + c)
                for byte in data[woff : woff + 4]:
                    pred, idx = _ima_step(pred, idx, byte & 0x0F)
                    out[k, c] = pred
                    pred, idx = _ima_step(pred, idx, byte >> 4)
                    out[k + 1, c] = pred
                    k += 2
    return ch, rate, 4, out[:fact_len]


def encode_wav_adpcm(samples, rate: int, block_words: int = 2) -> bytes:
    """IMA ADPCM WAV writer twin: (n_frames, n_channels) int16 samples
    -> format-tag-0x11 RIFF with ``block_words`` 4-byte nibble words
    per channel per block (8 samples each, plus the header sample).
    The final partial block is padded by holding the last sample; the
    true per-channel count is recorded in the `fact` chunk, which the
    decoder trims by. The quantizer runs the same _ima_step state
    update as the decoder — the IMA feedback loop requires it."""
    samples = np.asarray(samples, dtype=np.int16)
    if samples.ndim != 2 or samples.shape[0] == 0:
        raise ValueError(
            "encode_wav_adpcm needs non-empty (n_frames, n_channels),"
            f" got {samples.shape}"
        )
    n, ch = samples.shape
    spb = 1 + 8 * block_words
    block_align = 4 * ch + 4 * ch * block_words
    n_blocks = -(-n // spb)
    padded = np.vstack(
        [samples, np.repeat(samples[-1:], n_blocks * spb - n, axis=0)]
    )
    body = bytearray()
    # the step index CARRIES across blocks (written into each block
    # header) — resetting it to 0 per block would force the quantizer
    # to re-adapt from step 7 every block, a measured ~4x error blowup
    carry_idx = [0] * ch
    for b in range(n_blocks):
        blk = padded[b * spb : (b + 1) * spb]
        nibbles = [[] for _ in range(ch)]
        heads = []
        for c in range(ch):
            pred = int(blk[0, c])
            idx = carry_idx[c]
            heads.append(struct.pack("<hBB", pred, idx, 0))
            for s in blk[1:, c]:
                s = int(s)
                step = _IMA_STEPS[idx]
                delta = s - pred
                nib = 0
                if delta < 0:
                    nib = 8
                    delta = -delta
                if delta >= step:
                    nib |= 4
                    delta -= step
                if delta >= step >> 1:
                    nib |= 2
                    delta -= step >> 1
                if delta >= step >> 2:
                    nib |= 1
                nibbles[c].append(nib)
                pred, idx = _ima_step(pred, idx, nib)
            carry_idx[c] = idx
        body += b"".join(heads)
        for wd in range(block_words):
            for c in range(ch):
                for pair in range(4):
                    lo = nibbles[c][8 * wd + 2 * pair]
                    hi = nibbles[c][8 * wd + 2 * pair + 1]
                    body.append(lo | (hi << 4))
    byte_rate = (rate * block_align + spb - 1) // spb
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, ch, rate, byte_rate, block_align, 4, 2, spb
    )
    chunks = bytearray()
    chunks += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"fact" + struct.pack("<II", 4, n)
    chunks += b"data" + struct.pack("<I", len(body)) + bytes(body)
    if len(body) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + bytes(
        chunks
    )


def _decode_ms_adpcm(fmt, data, fact, ch, rate, block_align, bits):
    """MS-ADPCM block decode (format tag 2). Block layout per channel-
    interleaved: 1 predictor-index byte per channel, int16 iDelta per
    channel, int16 sample1 per channel, int16 sample2 per channel
    (sample2 is the EARLIER seed — output order sample2, sample1),
    then channel-interleaved signed nibbles HIGH-first. Returns
    (ch, rate, 4, int16 (n_frames, ch)) trimmed by `fact`."""
    if bits != 4:
        raise ValueError(f"MS-ADPCM bit depth must be 4, got {bits}")
    if len(fmt) < 22:
        raise ValueError("MS-ADPCM fmt chunk missing its coefficients")
    (cb,) = struct.unpack("<H", fmt[16:18])
    spb, ncoef = struct.unpack("<HH", fmt[18:22])
    if cb < 4 + 4 * ncoef or len(fmt) < 22 + 4 * ncoef:
        raise ValueError("MS-ADPCM coefficient table truncated")
    if ncoef < 1:
        raise ValueError("MS-ADPCM declares no coefficient pairs")
    coefs = [
        struct.unpack("<hh", fmt[22 + 4 * k : 26 + 4 * k])
        for k in range(ncoef)
    ]
    header = 7 * ch
    if block_align <= header:
        raise ValueError(
            f"MS-ADPCM block align {block_align} cannot hold the"
            f" {header}-byte header for {ch} channel(s)"
        )
    data_bytes = block_align - header
    expect_spb = 2 + 2 * data_bytes // ch
    if (2 * data_bytes) % ch or spb != expect_spb:
        raise ValueError(
            f"MS-ADPCM wSamplesPerBlock {spb} inconsistent with block"
            f" align {block_align} ({expect_spb} expected)"
        )
    if len(data) % block_align:
        raise ValueError(
            f"MS-ADPCM data size {len(data)} not a multiple of the"
            f" {block_align}-byte block"
        )
    n_blocks = len(data) // block_align
    total = n_blocks * spb
    if fact is not None:
        if len(fact) < 4:
            raise ValueError("WAV fact chunk truncated")
        (fact_len,) = struct.unpack("<I", fact[:4])
        if not (total - spb < fact_len <= total):
            raise ValueError(
                f"WAV fact sample count {fact_len} inconsistent with"
                f" {n_blocks} block(s) of {spb}"
            )
    else:
        fact_len = total
    out = np.empty((total, ch), dtype=np.int16)
    for b in range(n_blocks):
        base = b * block_align
        row = b * spb
        s1 = [0] * ch
        s2 = [0] * ch
        dl = [0] * ch
        cc = [None] * ch
        for c in range(ch):
            pi = data[base + c]
            if pi >= ncoef:
                raise ValueError(
                    f"MS-ADPCM predictor index {pi} outside the"
                    f" {ncoef}-pair table"
                )
            cc[c] = coefs[pi]
        off = base + ch
        for c in range(ch):
            (dl[c],) = struct.unpack("<h", data[off : off + 2])
            off += 2
        for c in range(ch):
            (s1[c],) = struct.unpack("<h", data[off : off + 2])
            off += 2
        for c in range(ch):
            (s2[c],) = struct.unpack("<h", data[off : off + 2])
            off += 2
            out[row, c] = s2[c]
            out[row + 1, c] = s1[c]
        k = 2 * ch  # flat sample cursor past the seeds
        for byte in data[off : base + block_align]:
            for nib in (byte >> 4, byte & 0x0F):
                if k >= spb * ch:
                    break  # trailing pad nibbles in the final byte
                c = k % ch
                n = nib - 16 if nib >= 8 else nib
                c1, c2 = cc[c]
                sample, dl[c] = _ms_step(s1[c], s2[c], dl[c], c1, c2, n)
                s2[c] = s1[c]
                s1[c] = sample
                out[row + k // ch, c] = sample
                k += 1
    return ch, rate, 4, out[:fact_len]


def encode_wav_ms_adpcm(
    samples, rate: int, block_words: int = 8, predictor: int = 0
) -> bytes:
    """MS-ADPCM writer twin: (n_frames, n_channels) int16 -> format
    tag 2 with ``block_words`` data bytes per channel per block (2
    nibbles each), one fixed ``predictor`` coefficient index for every
    block, the 7 standard pairs declared, `fact`-trimmed tail padding.
    The quantizer runs the decoder's own _ms_step feedback."""
    samples = np.asarray(samples, dtype=np.int16)
    if samples.ndim != 2 or samples.shape[0] < 1:
        raise ValueError(
            "encode_wav_ms_adpcm needs non-empty (n_frames,"
            f" n_channels), got {samples.shape}"
        )
    if not 0 <= predictor < len(_MS_COEFS):
        raise ValueError(f"predictor index {predictor} outside 0..6")
    n, ch = samples.shape
    spb = 2 + 2 * block_words
    block_align = 7 * ch + block_words * ch
    n_blocks = max(1, -(-n // spb))
    padded = np.vstack(
        [samples]
        + [np.repeat(samples[-1:], n_blocks * spb - n, axis=0)]
    ) if n_blocks * spb > n else samples
    c1, c2 = _MS_COEFS[predictor]
    body = bytearray()
    for b in range(n_blocks):
        blk = padded[b * spb : (b + 1) * spb]
        nibbles = [[] for _ in range(ch)]
        deltas = []
        for c in range(ch):
            s2, s1 = int(blk[0, c]), int(blk[1, c])
            delta = 16
            # a cheap but real initial-delta estimate: mean absolute
            # step over the block's first samples
            est = int(np.abs(np.diff(blk[: min(8, spb), c].astype(
                np.int32))).mean() or 0) // 4
            delta = max(16, est)
            deltas.append(delta)
            for s in blk[2:, c]:
                s = int(s)
                t = s1 * c1 + s2 * c2
                pred = (t >> 8) if t >= 0 else -((-t) >> 8)
                n_q = (s - pred) // delta if delta else 0
                n_q = max(-8, min(7, n_q))
                nibbles[c].append(n_q & 0x0F)
                sample, delta = _ms_step(s1, s2, delta, c1, c2, n_q)
                s2, s1 = s1, sample
        body += bytes([predictor] * ch)
        for c in range(ch):
            body += struct.pack("<h", deltas[c])
        for c in range(ch):
            body += struct.pack("<h", int(blk[1, c]))
        for c in range(ch):
            body += struct.pack("<h", int(blk[0, c]))
        # channel-interleaved nibbles, high-first
        flat = []
        for k in range(2 * ch, spb * ch):
            c = k % ch
            flat.append(nibbles[c][k // ch - 2])
        if len(flat) & 1:
            flat.append(0)
        for i in range(0, len(flat), 2):
            body.append((flat[i] << 4) | flat[i + 1])
    fmt = struct.pack(
        "<HHIIHHHHH",
        2, ch, rate, (rate * block_align + spb - 1) // spb,
        block_align, 4, 4 + 4 * len(_MS_COEFS), spb, len(_MS_COEFS),
    ) + b"".join(struct.pack("<hh", a, bb) for a, bb in _MS_COEFS)
    chunks = bytearray()
    chunks += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"fact" + struct.pack("<II", 4, n)
    chunks += b"data" + struct.pack("<I", len(body)) + bytes(body)
    if len(body) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + bytes(
        chunks
    )


def encode_wav_g711(companded: bytes, rate: int, law: str = "ulaw",
                    channels: int = 1) -> bytes:
    """G.711 WAV writer twin: raw COMPANDED bytes (one per sample,
    channel-interleaved) under format tag 7 (mu-law) or 6 (a-law) —
    the caller controls the byte construction, so registry faces can
    derive them from payload bytes directly."""
    if law not in ("ulaw", "alaw"):
        raise ValueError(f"law must be 'ulaw' or 'alaw', got {law!r}")
    if channels < 1 or len(companded) % channels:
        raise ValueError(
            f"{len(companded)} companded bytes do not tile"
            f" {channels} channel(s)"
        )
    tag = 7 if law == "ulaw" else 6
    fmt = struct.pack(
        "<HHIIHHH", tag, channels, rate, rate * channels, channels, 8, 0
    )
    chunks = bytearray()
    chunks += b"fmt " + struct.pack("<I", len(fmt)) + fmt
    chunks += b"fact" + struct.pack(
        "<II", 4, len(companded) // channels
    )
    chunks += b"data" + struct.pack("<I", len(companded)) + companded
    if len(companded) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + bytes(
        chunks
    )


def encode_wav(
    samples,
    rate: int,
    bits: int = 16,
    extra_chunk=None,
    extensible: bool = False,
    int32: bool = False,
) -> bytes:
    """WAV writer for (n_frames, n_channels) samples (uint8 for 8-bit,
    int16 for 16-bit, int32 for 24-bit — low 3 bytes written — and for
    32-bit when ``int32`` is set, float32/float64 for 32/64-bit
    otherwise, written as format tag 3 IEEE float). ``extensible``
    wraps the format as WAVE_FORMAT_EXTENSIBLE (tag 0xFFFE + SubFormat
    GUID, full-container valid bits — round 14). ``extra_chunk``
    optionally injects a (ckid, body) pair before the data chunk — the
    decoder must skip it (and its odd-size pad byte) by framing."""
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
    elif bits == 24:
        v = samples.astype("<i4").reshape(-1)
        b4 = v.view(np.uint8).reshape(-1, 4)
        body = np.ascontiguousarray(b4[:, :3]).tobytes()
    elif bits == 32 and int32:
        body = samples.astype("<i4").tobytes()
    elif bits == 32:
        tag = 3
        body = samples.astype("<f4").tobytes()
    elif bits == 64:
        tag = 3
        body = samples.astype("<f8").tobytes()
    else:
        raise ValueError(
            f"encode_wav bits must be 8, 16, 24, 32, or 64, got {bits}"
        )
    block_align = ch * bits // 8
    if extensible:
        fmt = struct.pack(
            "<HHIIHHHHI", 0xFFFE, ch, rate, rate * block_align,
            block_align, bits, 22, bits, 0,
        ) + struct.pack("<H", tag) + b"\x00\x00" + _EXT_GUID_TAIL
    else:
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


# --- Sun AU / NeXT .snd (round 15) -------------------------------------
#
# The classic G.711 carrier: a '.snd' magic plus five 32-bit BIG-endian
# header words (data offset >= 24 — annotation bytes may sit between
# header and data; data size, with 0xFFFFFFFF meaning "rest of file";
# encoding; sample rate; channels), then raw interleaved frames. The
# format that shipped telephony audio before WAV — supporting it means
# the ITU tables verified by tests/test_spec_vectors.py serve two wire
# containers.
_AU_MAGIC = b".snd"
_AU_UNKNOWN_SIZE = 0xFFFFFFFF
# encoding ids per the public Sun/NeXT header: 1 mu-law, 2 linear PCM
# 8-bit SIGNED (unlike WAV's unsigned 8-bit), 3 linear PCM 16-bit
# big-endian, 27 A-law
_AU_ENCODINGS = {1: 1, 2: 1, 3: 2, 27: 1}  # id -> bytes per sample


def decode_au(payload: bytes):
    """Decode a Sun AU (.au/.snd) file. Returns (channels, rate,
    encoding, (n_frames, channels) int16 array). G.711 encodings
    expand through the same ITU tables as the WAV tags 6/7; linear
    8-bit is SIGNED per the AU spec and is widened to int16 WITHOUT
    scaling (documented — the values are the stored ones); 16-bit is
    big-endian on the wire. Loud ValueError on malformed headers,
    unsupported encodings, truncation, and frame misalignment."""
    if payload[:4] != _AU_MAGIC:
        raise ValueError("not an AU file (.snd magic missing)")
    if len(payload) < 24:
        raise ValueError("AU header truncated")
    off, size, enc, rate, ch = struct.unpack(">IIIII", payload[4:24])
    if off < 24:
        raise ValueError(f"AU data offset {off} overlaps the header")
    if off > len(payload):
        raise ValueError(f"AU data offset {off} past end of file")
    if enc not in _AU_ENCODINGS:
        raise ValueError(
            f"unsupported AU encoding {enc}"
            " (mu-law 1, linear 8/16-bit 2/3, A-law 27 only);"
            " no fake fallback"
        )
    if ch == 0 or rate == 0:
        raise ValueError("malformed AU channel count or sample rate")
    if size == _AU_UNKNOWN_SIZE:
        size = len(payload) - off
    if off + size > len(payload):
        raise ValueError(
            f"AU declares {size} data bytes at {off},"
            f" file holds {len(payload)}"
        )
    bps = _AU_ENCODINGS[enc]
    if size % (bps * ch):
        raise ValueError(
            f"AU data size {size} is not whole {ch}-channel frames"
        )
    data = payload[off : off + size]
    if enc == 1:
        out = _ULAW_TABLE[np.frombuffer(data, dtype=np.uint8)]
    elif enc == 27:
        out = _ALAW_TABLE[np.frombuffer(data, dtype=np.uint8)]
    elif enc == 2:
        out = np.frombuffer(data, dtype=np.int8).astype(np.int16)
    else:  # enc == 3
        out = np.frombuffer(data, dtype=">i2").astype(np.int16)
    return ch, rate, enc, out.reshape(-1, ch)


def encode_au(
    data, rate: int, encoding: int, channels: int = 1,
    annotation: bytes = b"",
    unknown_size: bool = False,
) -> bytes:
    """AU writer twin. ``data`` is raw companded bytes for encodings
    1/27, int8 samples for 2, int16 for 3 (interleaved frames).
    ``annotation`` lands between header and data (the offset-skip
    path); ``unknown_size`` writes the 0xFFFFFFFF marker."""
    if encoding in (1, 27):
        body = bytes(data)
    elif encoding == 2:
        body = np.asarray(data, dtype=np.int8).tobytes()
    elif encoding == 3:
        body = np.asarray(data, dtype=">i2").tobytes()
    else:
        raise ValueError(f"unsupported AU encoding {encoding}")
    off = 24 + len(annotation)
    size = _AU_UNKNOWN_SIZE if unknown_size else len(body)
    return (
        _AU_MAGIC
        + struct.pack(">IIIII", off, size, encoding, rate, channels)
        + bytes(annotation)
        + body
    )
