"""Positional winnowing (dedup_winnow_spans) unit pins.

The driver row proves cross-engine parity on the synthetic corpus; these
tests pin the SEMANTICS on crafted inputs where the right answer is known
by construction: the rightmost-minimum tie-break (SIGMOD'03 robust
winnowing) and the planted-overlap -> exact-span localization.
"""

from __future__ import annotations

import random

from datafusion_loki_spark.operators.dedup import (
    WINNOW_K,
    WINNOW_MIN_SHARED,
    WINNOW_W,
    _remove_winnow_spans_frame,
    _winnow_selected_positions,
    _winnow_spans_frame,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_rightmost_min_tie_break_on_repeated_run(spark):
    # a pure single-char run ties EVERY gram hash in every window; the
    # paper's robust rule selects the RIGHTMOST tied minimum, so window
    # start t selects position t + W - 1 (a leftmost rule would select
    # a single position, 1). ng = W + 6 grams -> window starts 1..7 ->
    # selected positions exactly {W, ..., W+6}.
    n_grams = WINNOW_W + 6
    doc = "a" * (n_grams + WINNOW_K - 1)
    sel = _winnow_selected_positions(_docs(spark, [(1, doc)]))
    got = sorted(r.pos for r in sel.collect())
    assert got == list(range(WINNOW_W, WINNOW_W + 7)), got


def test_planted_overlap_localizes_to_one_exact_span(spark):
    # disjoint alphabets: fillers can never 8-gram-match the plant or
    # each other, so every cross-doc shared fingerprint comes from the
    # planted region — the span MUST land inside it, within the
    # guarantee slack (first/last selection at most W+K chars from the
    # match edges)
    rng = random.Random(42)
    filler_a = "".join(rng.choice("abcdef") for _ in range(150))
    filler_a2 = "".join(rng.choice("abcdef") for _ in range(120))
    filler_b = "".join(rng.choice("uvwxyz") for _ in range(100))
    filler_b2 = "".join(rng.choice("uvwxyz") for _ in range(140))
    plant = "".join(rng.choice("ghijklmnopqrst") for _ in range(200))

    doc_a = filler_a + plant + filler_a2     # plant at 151..350 (1-based)
    doc_b = filler_b + plant + filler_b2     # plant at 101..300
    spans = _winnow_spans_frame(
        _docs(spark, [(1, doc_a), (2, doc_b)])
    ).collect()

    assert len(spans) == 1, spans
    s = spans[0]
    assert (s.doc_a, s.doc_b) == (1, 2)
    assert s.n_fps >= WINNOW_MIN_SHARED
    slack = WINNOW_W + WINNOW_K
    a_lo, a_hi = 151, 350
    b_lo, b_hi = 101, 300
    assert a_lo <= s.span_a_start <= a_lo + slack, s
    assert a_hi - slack <= s.span_a_end <= a_hi, s
    assert b_lo <= s.span_b_start <= b_lo + slack, s
    assert b_hi - slack <= s.span_b_end <= b_hi, s
    # the two extents localize the SAME region: equal length windows
    assert (s.span_a_end - s.span_a_start) == (s.span_b_end - s.span_b_start)


def test_two_plants_split_into_two_spans(spark):
    # two separate verbatim regions with non-matching middle gap wider
    # than WINNOW_SPAN_GAP must emit two span rows, numbered in
    # position order
    rng = random.Random(7)
    plant1 = "".join(rng.choice("ghijklmnopqrst") for _ in range(120))
    plant2 = "".join(rng.choice("ghijklmnopqrst") for _ in range(120))
    gap_a = "".join(rng.choice("abcdef") for _ in range(80))
    gap_b = "".join(rng.choice("uvwxyz") for _ in range(90))
    doc_a = plant1 + gap_a + plant2
    doc_b = plant1 + gap_b + plant2
    spans = _winnow_spans_frame(
        _docs(spark, [(1, doc_a), (2, doc_b)])
    ).collect()
    assert len(spans) == 2, spans
    by_id = sorted(spans, key=lambda s: s.span_id)
    assert [s.span_id for s in by_id] == [1, 2]
    # span 1 inside plant1 (1..120 on both), span 2 inside plant2
    assert by_id[0].span_a_end <= 120
    assert by_id[1].span_a_start >= 201         # 120 + 80 + 1
    assert by_id[1].span_b_start >= 211         # 120 + 90 + 1


def test_repeated_copy_in_one_doc_emits_one_exact_span_per_copy(spark):
    # round 12 (diagonal segmentation): the plant appears ONCE in doc 1
    # and TWICE in doc 2. The round-11 bounding-box rule smeared the two
    # doc-2 copies into one wide extent; per-diagonal runs must emit two
    # spans, each with an exact b-extent inside its own copy, and equal
    # a/b lengths (the diagonal shift preserves length by construction).
    rng = random.Random(13)
    plant = "".join(rng.choice("ghijklmnopqrst") for _ in range(150))
    gap_b = "".join(rng.choice("uvwxyz") for _ in range(120))
    filler_b = "".join(rng.choice("uvwxyz") for _ in range(60))
    doc_a = plant                                  # plant at 1..150
    doc_b = filler_b + plant + gap_b + plant       # copies at 61..210, 331..480
    spans = _winnow_spans_frame(
        _docs(spark, [(1, doc_a), (2, doc_b)])
    ).collect()
    assert len(spans) == 2, spans
    by_id = sorted(spans, key=lambda s: s.span_id)
    slack = WINNOW_W + WINNOW_K
    for s, (b_lo, b_hi) in zip(by_id, [(61, 210), (331, 480)]):
        assert 1 <= s.span_a_start <= 1 + slack, s
        assert 150 - slack <= s.span_a_end <= 150, s
        assert b_lo <= s.span_b_start <= b_lo + slack, s
        assert b_hi - slack <= s.span_b_end <= b_hi, s
        # exact diagonal shift: lengths equal, never a bounding box
        assert (s.span_a_end - s.span_a_start) == (
            s.span_b_end - s.span_b_start
        ), s


def test_removal_excises_plant_from_larger_id_doc_only(spark):
    # the cleaned-corpus deliverable: doc 2 (the larger id) loses the
    # planted region (within guarantee slack), doc 1 keeps everything
    # (no row — only AFFECTED docs emit), and the cleaned text is
    # exactly norm minus the merged extent
    rng = random.Random(42)
    filler_a = "".join(rng.choice("abcdef") for _ in range(150))
    filler_a2 = "".join(rng.choice("abcdef") for _ in range(120))
    filler_b = "".join(rng.choice("uvwxyz") for _ in range(100))
    filler_b2 = "".join(rng.choice("uvwxyz") for _ in range(140))
    plant = "".join(rng.choice("ghijklmnopqrst") for _ in range(200))

    doc_a = filler_a + plant + filler_a2
    doc_b = filler_b + plant + filler_b2
    docs = _docs(spark, [(1, doc_a), (2, doc_b)])
    out = _remove_winnow_spans_frame(docs, _winnow_spans_frame(docs)).collect()

    assert len(out) == 1, out
    r = out[0]
    assert r.doc_id == 2
    assert r.n_intervals == 1
    slack = WINNOW_W + WINNOW_K
    # removed extent sits inside the plant (101..300 on doc 2), covers
    # most of it, and the cleaned text is the original minus that slice
    assert 200 - 2 * slack <= r.n_chars_removed <= 200
    assert r.cleaned_text.startswith(filler_b[: 100 - 1])
    assert r.cleaned_text.endswith(filler_b2)
    assert len(r.cleaned_text) == len(doc_b) - r.n_chars_removed
    assert plant[: WINNOW_K] not in r.cleaned_text  # plant body gone


# --- property net for the interval merge + rebuild core -----------------------
# (this logic took two review findings in round 11 — tie-order window
# divergence and the adjacency merge — so it gets a reference-model fuzz)

from hypothesis import given, settings, strategies as st

from datafusion_loki_spark.operators.dedup import WINNOW_SPAN_GAP  # noqa: E402


def _ref_merge_and_rebuild(norm: str, raw_ivs):
    """Pure-python reference: merge overlapping/adjacent intervals, then
    rebuild the text from uncovered segments."""
    ivs = sorted(set(raw_ivs))
    merged = []
    for s, e in ivs:
        if merged and s <= merged[-1][1] + 1:
            merged[-1][1] = max(merged[-1][1], e)
        else:
            merged.append([s, e])
    out, p = [], 1
    for s, e in merged:
        out.append(norm[p - 1 : s - 1])
        p = e + 1
    out.append(norm[p - 1 :])
    return (
        len(merged),
        sum(e - s + 1 for s, e in merged),
        "".join(out),
    )


@settings(max_examples=25, deadline=None)
@given(data=st.data())
def test_merge_rebuild_matches_reference_model(spark, data):
    # random interval sets (duplicates, containment, adjacency, overlap
    # all arise naturally) over random docs: the operator's windowed
    # merge + fold rebuild must equal the sequential reference exactly
    import random as _random

    from datafusion_loki_spark.operators.dedup import (
        _remove_winnow_spans_frame,
    )

    n_docs = data.draw(st.integers(1, 3))
    rows, span_rows, want = [], [], {}
    for doc_id in range(1, n_docs + 1):
        seed = data.draw(st.integers(0, 2**31 - 1))
        rng = _random.Random(seed)
        length = rng.randint(30, 120)
        text = "".join(rng.choice("abcdefgh") for _ in range(length))
        rows.append((doc_id, text))
        n_iv = data.draw(st.integers(1, 8))
        ivs = []
        for _ in range(n_iv):
            s = rng.randint(1, length)
            e = min(length, s + rng.randint(0, 25))
            ivs.append((s, e))
        # duplicates on purpose: repeat one interval
        ivs.append(ivs[0])
        for s, e in ivs:
            span_rows.append((0, doc_id, 1, 1, 1, s, e, 1))
        want[doc_id] = _ref_merge_and_rebuild(text, ivs)
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    spans = spark.createDataFrame(
        span_rows,
        "doc_a long, doc_b long, span_id long, span_a_start long,"
        " span_a_end long, span_b_start long, span_b_end long, n_fps long",
    )
    got = {
        r.doc_id: (r.n_intervals, r.n_chars_removed, r.cleaned_text)
        for r in _remove_winnow_spans_frame(docs, spans).collect()
    }
    assert got == want
