"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Query inventory lives in ``datafusion_loki_spark/plans/`` and
``datafusion_loki_spark/operators/``; this module only aggregates.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Runs the Q3-shape join+agg+topk — the densest exercise of the engine
    surface (scan pushdown, broadcast join, shuffle agg, TakeOrdered).
    """
    from datafusion_loki_spark.plans.tpch import q3_shipping_priority

    return q3_shipping_priority(spark, "/root/testdata/sf0.001")


# The driver's correctness harness evaluates the FIRST 50 registry entries
# in insertion order. The registry holds more queries than fit, so coverage
# rotates by round. Rotation policy (restated round 8 to match the
# arithmetic: a full pass over N registered queries takes ceil(N/50)
# windows, so the guarantee is "every entry re-checked within
# ceil(N/50)+1 rounds" — the +1 absorbs new/changed entries displacing
# stale slots):
#
#   1. entries NEW or CHANGED this round lead (hand-pinned in
#      _R13_PINNED — their plans and output must re-earn a driver row);
#   2. the rest of the window is DERIVED from the committed
#      CORRECTNESS_r*.json files: never-green entries first (never
#      checked, or checked red), then ascending latest-green round,
#      tie-broken by registration order.
#
# Rounds 1-7 hand-listed the window each round; the bookkeeping drifted
# (round-7 VERDICT: comment said 46 stale, parsing the files gave 41),
# so round 8 computes it at import time. Everything outside the window
# stays covered by the local all-query DuckDB parity suite
# (tests/test_parity.py); the structural guards are
# test_unchecked_queries_lead_the_window (never-checked entries must sit
# in the prefix) and test_correctness_window_is_pinned (prefix ==
# _WINDOW_PRIORITY, staleness ordering holds).
_R13_PINNED: tuple[str, ...] = (
    # --- new/changed in round 13 (hand-pinned ahead of the derived
    # staleness tail; everything else is computed) ---
    # CHANGED in r13: the BPE oracle is decoupled from the merge budget
    # (round-12 Next #2). text_bpe_vocab + the OOV face now run/replay
    # the BPE_PREFIX_ITERS prefix (4 rounds at the new BATCH=256), and
    # text_tokenize_bpe trains the FULL 24x256=6144 budget with its
    # oracle verifying the APPLY phase against the staged vocab
    # artifact (corpus-fingerprint-keyed parquet under the scratch
    # root) — all three outputs changed with the batch width
    "text_bpe_vocab",
    "text_tokenize_bpe",
    "text_tokenize_bpe_oov",
    # NEW in r13: animated GIF — three frames with mixed disposal
    # methods (none / restore-previous), frame transparency, a local
    # color table, interlace, and a NETSCAPE loop block; one oracle row
    # per composited canvas frame (round-12 Next #5)
    "mm_decode_gif_frames",
    # CHANGED in r13: GIF LZW decode now fail-louds on pixel-count
    # overshoot and verifies the END terminator at the data boundary
    # (round-12 ADVICE) — same output, changed decode path: re-earn
    "mm_decode_gif",
    # CHANGED in r13: the decode admission gate is now CONSUMED —
    # mm_dedup_keep_list gained top-precedence 'undecodable' status
    # (round-12 Next #6), and the new funnel rolls it up
    "mm_dedup_keep_list",
    "mm_pipeline_funnel",
    # CHANGED in r13: build_ivf_index clears stale tombstones/ingest
    # generations when rebuilding over a maintained snapshot (round-12
    # ADVICE), and query_ivf_index wraps its resolve->scan in one
    # bounded retry on missing-path failures (round-12 Next #3) — every
    # lifecycle face routes through one or both: re-earn
    "sim_ivf_snapshot_reads",
    "sim_ivf_index_retrain",
    "sim_ivf_index_topk",
    "sim_ivf_index_append",
    "sim_ivf_index_delete",
    # CHANGED in r13: the PNG unfilter was rewritten (Sub rows are now
    # an exact vectorized prefix-sum; Average/Paeth run flat scalar
    # loops — 9x measured, tools/decode_swap_bench.py), decode_png
    # gained 16-bit gray+alpha/RGBA, and the JPEG Huffman walk became a
    # 16-bit-prefix LUT lookup (2.4x baseline / 4.2x progressive) —
    # every PNG/JPEG face re-earns
    "mm_decode_jpeg",
    "mm_decode_jpeg_progressive",
    "mm_decode_png",
    "mm_decode_png_palette",
    "mm_decode_png_adam7",
    "mm_decode_png16",
    "mm_decode_validate",
    # NEW in r13 (late): the audio modality's real decode path — RIFF
    # chunk walk, PCM fmt validation, signed-LE frame extraction — and
    # baseline TIFF (both byte orders, multi-strip, PackBits), which
    # leaves the PIL-gated list; the admission gate now constructs SIX
    # formats (doc_id % 6 adds tiff), so validate/keep-list/funnel
    # outputs changed in lockstep with their oracles
    "mm_decode_wav",
    "mm_decode_tiff",
    # NEW in r13 (late): the audio ANALYSIS stage over the decoded PCM
    # stream — integer-exact energy / zero-crossings / peak per channel
    "mm_audio_features",
    # NEW in r13 (late): real-pixel resize — decode + deterministic
    # nearest-neighbor gather, hex-replayable end-to-end
    "mm_resize_pixels",
    # NEW in r13 (late): 8-bit indexed BMP with BI_RLE8 (escape codes,
    # word-aligned literals, bottom-up) — shares the GIF twin's
    # construction, so a run/escape bug hash-mismatches the same oracle
    "mm_decode_bmp_rle",
    # NEW in r13 (late): multi-page TIFF — mixed RGB/gray pages through
    # one next-IFD chain, one oracle row per page
    "mm_decode_tiff_pages",
    # CHANGED in r13 (late): decode_ppm gained the 16-bit branch (the
    # 8-bit construction's decode path moved) — re-earn
    "mm_decode_ppm",
)

_WINDOW_SIZE = 50


def _latest_green_round() -> dict[str, int]:
    """name -> staleness key: the round of the entry's most recent
    committed driver row IF that row was fully green, else -1.

    Keying on the LATEST CHECK (not the latest green) matters for
    regressions: an entry green in r7 but red in r8 must sort as
    never-green (-1) and lead the next rotation — keying on the old
    green round would file a known-broken entry among the freshest and
    delay its re-check by a full rotation (round-8 review)."""
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    latest_check: dict[str, tuple[int, bool]] = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            green = bool(
                row.get("err") is None
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match", True)
            )
            if rnd >= latest_check.get(name, (-1, False))[0]:
                latest_check[name] = (rnd, green)
    return {
        name: (rnd if green else -1)
        for name, (rnd, green) in latest_check.items()
    }


def _window_priority(
    registered: list[str], latest: "dict[str, int] | None" = None
) -> tuple[str, ...]:
    """Pinned new/changed entries, then the stalest tail, derived.

    A pinned name missing from the registry is a hard error — the pin
    list is the ONLY hand-maintained piece of the rotation, and a typo
    silently dropping a new query's guaranteed lead slot is exactly the
    failure class the derivation exists to prevent."""
    if latest is None:
        latest = _latest_green_round()
    order = {n: i for i, n in enumerate(registered)}
    unknown = [n for n in _R13_PINNED if n not in order]
    if unknown:
        raise KeyError(
            f"_R13_PINNED names not in the registry (typo?): {unknown}"
        )
    pinned = list(_R13_PINNED)
    tail = sorted(
        (n for n in registered if n not in _R13_PINNED),
        key=lambda n: (latest.get(n, -1), order[n]),
    )
    return tuple((pinned + tail)[:_WINDOW_SIZE])


_REGISTRY_CACHE: "tuple[dict, dict] | None" = None


def _registry() -> tuple[dict[str, Callable], dict[str, str]]:
    # memoized: bench.py / scale_smoke / the parity suite call
    # queries()/oracle_sql() in loops, and the window derivation reads
    # every committed CORRECTNESS file — derive once per process (the
    # committed files don't change mid-run)
    global _REGISTRY_CACHE
    if _REGISTRY_CACHE is not None:
        return _REGISTRY_CACHE
    from datafusion_loki_spark.operators import (
        dedup,
        multimodal,
        sampling,
        similarity,
        text,
    )
    from datafusion_loki_spark.plans import logs, tpch

    merged: dict[str, Callable] = {}
    oracles: dict[str, str] = {}
    for mod in (logs, tpch, dedup, multimodal, sampling, similarity, text):
        merged.update(mod.QUERIES)
        oracles.update(mod.ORACLES)
    queries: dict[str, Callable] = {}
    for name in _window_priority(list(merged)):
        queries[name] = merged[name]
    for name, fn in merged.items():
        queries.setdefault(name, fn)
    _REGISTRY_CACHE = (queries, oracles)
    return _REGISTRY_CACHE


# kept as a module constant so tests (and humans) can inspect the pinned
# window without re-deriving it
_WINDOW_PRIORITY = None  # set lazily below


def _window() -> tuple[str, ...]:
    global _WINDOW_PRIORITY
    if _WINDOW_PRIORITY is None:
        _WINDOW_PRIORITY = tuple(list(_registry()[0])[:_WINDOW_SIZE])
    return _WINDOW_PRIORITY


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry()[0]


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each queries() entry (omitted → rows-only)."""
    return _registry()[1]
