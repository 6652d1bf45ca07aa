"""Unit tests for the filter→LogQL translator — table-driven over every
branch of the reference's expr.rs:11-152 (which itself ships untested;
SURVEY.md §5 flags the gap this suite closes)."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
    Not,
    StringContains,
    StringEndsWith,
    StringStartsWith,
)

from datafusion_loki_spark.sources import logql


# --- label matchers (expr.rs:11-47) ---------------------------------------

@pytest.mark.parametrize(
    "op,expected",
    [("=", 'app="my-app"'), ("!=", 'app!="my-app"'),
     ("=~", 'app=~"my-app"'), ("!~", 'app!~"my-app"')],
)
def test_label_matcher_ops(op, expected):
    assert logql.label_matcher("app", op, "my-app") == expected


def test_label_matcher_null_literal_becomes_empty_string():
    # expr.rs:34-35 — ScalarValue::Utf8(None) → ""
    assert logql.label_matcher("app", "=", None) == 'app=""'


def test_label_matcher_escapes_quotes():
    assert logql.label_matcher("app", "=", 'a"b') == 'app="a\\"b"'


def test_label_matcher_rejects_unknown_op():
    with pytest.raises(ValueError):
        logql.label_matcher("app", "<", "x")


# --- line filters (expr.rs:49-112) -----------------------------------------

def test_line_contains():
    assert logql.line_contains("bbb") == "|= `bbb`"
    assert logql.line_contains("bbb", negate=True) == "!= `bbb`"


def test_line_contains_backtick_untranslatable():
    assert logql.line_contains("a`b") is None


def test_line_regex():
    assert logql.line_regex("a.*b") == "|~ `a.*b`"
    assert logql.line_regex("a.*b", negate=True) == "!~ `a.*b`"
    assert logql.line_regex("abc", case_insensitive=True) == "|~ `(?i)abc`"
    assert logql.line_regex("abc", negate=True, case_insensitive=True) == "!~ `(?i)abc`"


@pytest.mark.parametrize(
    "pattern,expected",
    [
        ("%bbb%", "bbb"),       # the only accepted shape (expr.rs:98)
        ("%b%b%", None),        # inner %
        ("%b_b%", None),        # _ wildcard
        ("bbb%", None),         # prefix only
        ("%bbb", None),         # suffix only
        ("bbb", None),          # no wildcards
        ("%%", ""),             # empty inner matches everything
    ],
)
def test_like_gate(pattern, expected):
    assert logql.like_pattern_to_contains(pattern) == expected


# --- query assembly + default label (table.rs:116-128) ----------------------

def test_build_logql_joins_matchers_and_filters():
    q = logql.build_logql(['app="x"', 'env!="prod"'], ["|= `a`", "!~ `b`"])
    assert q == '{app="x", env!="prod"} |= `a` !~ `b`'


def test_build_logql_default_label_fallback():
    assert logql.build_logql([], [], default_label="app") == '{app=~".+"}'


def test_build_logql_no_labels_no_default_errors():
    # ≙ table.rs:118-121 plan error
    with pytest.raises(ValueError):
        logql.build_logql([], [])


# --- filter translation (pushFilters surface) -------------------------------

TS = datetime(2024, 3, 1, 12, 0, 0)


def test_translate_contains_on_line():
    r = logql.translate_filters([StringContains(("line",), "login")])
    assert r.line_filters == ["|= `login`"]
    assert not r.unsupported


def test_translate_not_contains():
    r = logql.translate_filters([Not(StringContains(("line",), "x"))])
    assert r.line_filters == ["!= `x`"]


def test_translate_starts_ends_with_anchored_regex():
    r = logql.translate_filters(
        [StringStartsWith(("line",), "user"), StringEndsWith(("line",), "ok")]
    )
    assert r.line_filters == ["|~ `^user`", "|~ `ok$`"]
    assert not r.unsupported


def test_translate_anchor_quotes_regex_metachars():
    r = logql.translate_filters([StringStartsWith(("line",), "a.b*c")])
    assert r.line_filters == ["|~ `^a\\.b\\*c`"]


def test_translate_not_endswith():
    r = logql.translate_filters([Not(StringEndsWith(("line",), "fail"))])
    assert r.line_filters == ["!~ `fail$`"]


def test_line_anchor_backtick_untranslatable():
    assert logql.line_anchor("a`b") is None


def test_translate_contains_on_other_column_unsupported():
    r = logql.translate_filters([StringContains(("labels",), "x")])
    assert not r.line_filters
    assert len(r.unsupported) == 1


def test_translate_time_bounds():
    r = logql.translate_filters(
        [GreaterThan(("timestamp",), TS), LessThan(("timestamp",), TS)]
    )
    expected_ns = int(TS.replace(tzinfo=timezone.utc).timestamp()) * 1_000_000_000
    assert r.start_ns == expected_ns
    assert r.end_ns == expected_ns
    # time bounds only shrink the fetch window; Spark re-evaluates them
    # (unlike the reference's Exact marking — see translate_filters doc)
    assert len(r.unsupported) == 2
    assert not r.supported


def test_translate_gte_same_start_as_strict():
    # window start: inclusive T is a superset for both > T and >= T
    strict = logql.translate_filters([GreaterThan(("timestamp",), TS)])
    loose = logql.translate_filters([GreaterThanOrEqual(("timestamp",), TS)])
    assert strict.start_ns == loose.start_ns


def test_translate_lte_widens_end_for_boundary_row():
    # <= T must keep a row stamped exactly T visible even if the store's
    # end bound is exclusive → end = T + 1 µs; strict < T stays at T
    strict = logql.translate_filters([LessThan(("timestamp",), TS)])
    loose = logql.translate_filters([LessThanOrEqual(("timestamp",), TS)])
    assert loose.end_ns == strict.end_ns + 1_000


def test_translate_tightest_bounds_win():
    t2 = datetime(2024, 3, 2)
    r = logql.translate_filters(
        [GreaterThan(("timestamp",), TS), GreaterThan(("timestamp",), t2),
         LessThanOrEqual(("timestamp",), TS), LessThanOrEqual(("timestamp",), t2)]
    )
    ns1 = logql.datetime_to_ns(TS)
    ns2 = logql.datetime_to_ns(t2)
    assert r.start_ns == max(ns1, ns2)
    assert r.end_ns == min(ns1, ns2) + 1_000


def test_translate_equality_on_timestamp_unsupported():
    # = on timestamp is not translatable (expr.rs:114-152 has no Eq arm)
    r = logql.translate_filters([EqualTo(("timestamp",), TS)])
    assert len(r.unsupported) == 1
    assert r.start_ns is None and r.end_ns is None


def test_translate_startswith_on_other_column_unsupported():
    # anchors only apply to the line column; reference pushes only %x%
    # contains (expr.rs:98) — the anchored-regex translation is a widening
    r = logql.translate_filters([StringStartsWith(("labels",), "x")])
    assert len(r.unsupported) == 1 and not r.line_filters


def test_translate_isnotnull_unsupported():
    r = logql.translate_filters([IsNotNull(("line",))])
    assert len(r.unsupported) == 1


# --- label options (the §7.4.2(b) rewrite layer) ----------------------------

def test_parse_label_options_json():
    assert logql.parse_label_options('{"app": "x", "env": "prod"}') == [
        'app="x"', 'env="prod"',
    ]


def test_parse_label_options_raw_selector():
    assert logql.parse_label_options('app="x", env!~"dev.*"') == [
        'app="x"', 'env!~"dev.*"',
    ]


def test_parse_label_options_empty():
    assert logql.parse_label_options(None) == []
    assert logql.parse_label_options("") == []


# --- line filter options (explicit regex/contains pruning route) ------------

def test_parse_line_filter_options():
    assert logql.parse_line_filter_options("|= err; !~ (?i)debug.*") == [
        "|= `err`", "!~ `(?i)debug.*`",
    ]


def test_parse_line_filter_options_pre_backticked():
    assert logql.parse_line_filter_options("|~ `a;b`") == ["|~ `a;b`"]


def test_parse_line_filter_options_rejects_bad_op():
    with pytest.raises(ValueError):
        logql.parse_line_filter_options("=~ x")


def test_parse_line_filter_options_rejects_backtick_in_text():
    with pytest.raises(ValueError):
        logql.parse_line_filter_options("|= a`b")


def test_parse_line_filter_options_empty():
    assert logql.parse_line_filter_options(None) == []
    assert logql.parse_line_filter_options("") == []
