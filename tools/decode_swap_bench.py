"""Measured decode swap-in numbers (round-12 verdict Next #4).

Quantifies the documented production swap point for the pure-Python
decode kernels: per-item wall cost, per-megapixel cost, and — the
number that actually argues the swap — the STAGE SPLIT of the JPEG
path (pure-Python entropy decode vs numpy IDCT vs everything else).
PIL/libjpeg is not installed in this container (the loud gate in
decode_image documents it), so the native side of the comparison is
the one C codec the stdlib ships: zlib inflate, which IS the PNG
path's entropy stage. The PNG row therefore shows what a native
entropy stage costs per megapixel in the SAME harness, and the JPEG
rows show how much of their budget sits in the replaceable
pure-Python entropy loop.

Run: python tools/decode_swap_bench.py  (prints a markdown table)
"""

from __future__ import annotations

import sys
import time
import zlib

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from datafusion_loki_spark.operators.gif import (  # noqa: E402
    decode_gif,
    encode_gif,
)
from datafusion_loki_spark.operators.jpeg import (  # noqa: E402
    decode_jpeg,
    encode_jpeg,
)
from datafusion_loki_spark.operators.multimodal import (  # noqa: E402
    decode_png,
    encode_png,
)
from datafusion_loki_spark.operators.webp import (  # noqa: E402
    decode_webp,
    encode_webp_lossless,
)


def _time(fn, reps):
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        best = min(best, (time.perf_counter() - t0) / reps)
    return best


def main() -> None:
    rng = np.random.RandomState(7)
    rows = []

    for label, w, h in (("64x40", 64, 40), ("256x256", 256, 256)):
        px = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        gray = rng.randint(0, 256, (h, w), dtype=np.uint8)

        png = encode_png(px)
        rows.append(("PNG RGB (C inflate + numpy unfilter)", label,
                     _time(lambda: decode_png(png), 20)))
        # the inflate stage alone — the native-codec share of PNG
        comp = zlib.compress(px.tobytes(), 6)
        rows.append(("  - zlib inflate stage alone", label,
                     _time(lambda: zlib.decompress(comp), 50)))

        jb = encode_jpeg(gray)
        rows.append(("JPEG gray baseline (Python Huffman + numpy IDCT)",
                     label, _time(lambda: decode_jpeg(jb), 5)))
        jp = encode_jpeg(gray, progressive=True)
        rows.append(("JPEG gray progressive (multi-scan)", label,
                     _time(lambda: decode_jpeg(jp), 5)))

        pal = rng.randint(0, 256, (16, 3), dtype=np.uint8)
        gif = encode_gif(gray % 16, pal, interlace=True)
        rows.append(("GIF (Python LZW + palette lookup)", label,
                     _time(lambda: decode_gif(gif), 10)))

        px4 = rng.randint(0, 256, (h, w, 4), dtype=np.uint8)
        wb = encode_webp_lossless(
            px4, cache_bits=6, lz77=True, subtract_green=True
        )
        rows.append(("WebP VP8L RGBA (Python prefix LUT + cache + LZ77)",
                     label, _time(lambda: decode_webp(wb), 5)))

    print("| decoder / stage | size | ms/item | ms/megapixel |")
    print("|---|---|---|---|")
    for name, label, sec in rows:
        w, h = (int(v) for v in label.split("x"))
        mp = w * h / 1e6
        print(f"| {name} | {label} | {sec * 1e3:.2f} | {sec * 1e3 / mp:.1f} |")

    # JPEG stage split via targeted profiling: time the IDCT block math
    # alone on the same coefficient volume the 256x256 decode handles
    n_blocks = (256 // 8) * (256 // 8)
    coefs = rng.randint(-64, 64, (n_blocks, 8, 8)).astype(np.float64)
    from datafusion_loki_spark.operators import jpeg as J

    basis = J._A
    t_idct = _time(lambda: basis.T @ coefs @ basis, 20)
    print()
    print(f"IDCT-only for {n_blocks} blocks (vectorized batch): "
          f"{t_idct * 1e3:.2f} ms -> the remainder of the JPEG budget is "
          "the pure-Python entropy loop + per-block bookkeeping.")


if __name__ == "__main__":
    main()
