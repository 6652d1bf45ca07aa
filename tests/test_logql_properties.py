"""Property-based tests for the filter→LogQL translator (hypothesis).

The reference ships its translator untested (zero #[cfg(test)] in
datafusion-loki/src/ — SURVEY.md §5); tests/test_logql.py covers its
branches table-driven, and this file adds generative coverage of the
invariants the pushdown contract depends on: escaping is lossless,
translation is conservative (never emits a filter LogQL can't represent
exactly), and window math only widens.
"""

from __future__ import annotations

from datetime import datetime, timezone

from hypothesis import given, settings
from hypothesis import strategies as st

from datafusion_loki_spark.sources.logql import (
    _quote_label_value,
    build_logql,
    datetime_to_ns,
    label_matcher,
    like_pattern_to_contains,
    line_contains,
    line_regex,
)

_text = st.text(max_size=60)


@given(_text)
def test_quote_label_value_is_lossless(value):
    quoted = _quote_label_value(value)
    assert quoted.startswith('"') and quoted.endswith('"')
    inner = quoted[1:-1]
    # decode the two escapes in one left-to-right pass (the writer's order)
    out, i = [], 0
    while i < len(inner):
        if inner[i] == "\\" and i + 1 < len(inner) and inner[i + 1] in ('"', "\\"):
            out.append(inner[i + 1])
            i += 2
        else:
            assert inner[i] not in ('"',), "unescaped quote survived"
            out.append(inner[i])
            i += 1
    assert "".join(out) == value


@given(st.text(alphabet=st.characters(codec="ascii", exclude_characters='{}",\n'),
               min_size=1, max_size=20),
       st.sampled_from(["=", "!=", "=~", "!~"]), _text)
def test_label_matcher_shape(key, op, value):
    m = label_matcher(key, op, value)
    assert m.startswith(key + op)
    assert m.endswith('"')


@given(_text)
def test_line_contains_refuses_backticks_else_exact(text):
    lf = line_contains(text)
    if "`" in text:
        assert lf is None  # LogQL raw strings cannot contain a backtick
    else:
        assert lf == f"|= `{text}`"
        assert line_contains(text, negate=True) == f"!= `{text}`"


@given(_text)
def test_line_regex_prefixes(rx):
    lf = line_regex(rx, case_insensitive=True)
    if "`" in rx:
        assert lf is None
    else:
        assert lf == f"|~ `(?i){rx}`"


@given(_text)
def test_like_gate_only_accepts_contains_shapes(pattern):
    inner = like_pattern_to_contains(pattern)
    if inner is not None:
        # accepted ⇒ it was exactly %inner% with no further wildcards —
        # the reference's gate (expr.rs:83-98); anything looser would make
        # an Exact pushdown wrong
        assert pattern == f"%{inner}%"
        assert "%" not in inner and "_" not in inner


@given(st.lists(st.sampled_from(['app="x"', 'env!="prod"', 'job=~"a.+"']),
                max_size=3, unique=True),
       st.lists(st.sampled_from(["|= `a`", "!= `b`", "|~ `c.*`"]),
                max_size=3, unique=True))
def test_build_logql_assembly(matchers, line_filters):
    q = build_logql(matchers, line_filters, default_label="svc")
    head = q.split("}")[0] + "}"
    if matchers:
        assert head == "{" + ", ".join(matchers) + "}"
    else:
        assert head == '{svc=~".+"}'  # table.rs:116-122 fallback
    for lf in line_filters:
        assert lf in q


@given(st.datetimes(min_value=datetime(1971, 1, 1),
                    max_value=datetime(2200, 1, 1)))
def test_datetime_to_ns_is_whole_microseconds(dt):
    ns = datetime_to_ns(dt.replace(tzinfo=timezone.utc))
    assert ns % 1_000 == 0  # Spark timestamps are µs; ns is a widening
    back = datetime.fromtimestamp(ns / 1e9, tz=timezone.utc)
    assert abs((back - dt.replace(tzinfo=timezone.utc)).total_seconds()) < 1e-3


# deadline off: the first example pays the pyspark.sql.datasource import
@settings(max_examples=25, deadline=None)
@given(st.lists(st.tuples(st.sampled_from(["gt", "ge", "lt", "le"]),
                          st.datetimes(min_value=datetime(2000, 1, 1),
                                       max_value=datetime(2100, 1, 1))),
                max_size=4))
def test_time_bounds_always_superset(bounds):
    """The fetch window must contain every row any conjunction of the
    pushed time predicates can keep: start = max of lower bounds,
    end = min of upper bounds widened past inclusivity."""
    from pyspark.sql.datasource import (
        GreaterThan,
        GreaterThanOrEqual,
        LessThan,
        LessThanOrEqual,
    )

    from datafusion_loki_spark.sources.logql import translate_filters

    cls = {"gt": GreaterThan, "ge": GreaterThanOrEqual,
           "lt": LessThan, "le": LessThanOrEqual}
    filters = [cls[op](("timestamp",), dt) for op, dt in bounds]
    res = translate_filters(filters)
    # every time filter is re-checked by Spark — never consumed
    assert res.supported == []
    # the fetched window is the tightest superset of the CONJUNCTION:
    # start = max lower bound (rows at the bound stay fetchable since the
    # bound itself is sent inclusively), end = min upper bound with
    # inclusive (`<=`) ends widened by 1 µs
    # expectation uses the SAME naive-datetime conversion as the
    # implementation (host-local interpretation — see datetime_to_ns), so
    # the property holds on any host timezone
    lowers = [datetime_to_ns(dt) for op, dt in bounds if op in ("gt", "ge")]
    uppers = [datetime_to_ns(dt) + (1_000 if op == "le" else 0)
              for op, dt in bounds if op in ("lt", "le")]
    assert res.start_ns == (max(lowers) if lowers else None)
    assert res.end_ns == (min(uppers) if uppers else None)


@settings(max_examples=100, deadline=None)
@given(st.text(min_size=1, max_size=30).filter(lambda s: "`" not in s and "\n" not in s),
       st.text(max_size=10).filter(lambda s: "\n" not in s),
       st.booleans())
def test_line_anchor_regex_matches_exactly_prefix_suffix(text, pad, end):
    """The anchored segment's regex must match a line iff the line starts
    (resp. ends) with the literal text — the Exact-pushdown contract."""
    import re

    from datafusion_loki_spark.sources.logql import line_anchor

    seg = line_anchor(text, end=end)
    assert seg is not None and seg.startswith("|~ `") and seg.endswith("`")
    rx = re.compile(seg[len("|~ `"):-1])
    line_match = (pad + text) if end else (text + pad)
    assert rx.search(line_match) is not None
    # a line that lacks the prefix/suffix must NOT match
    probe = ("x" + text + "x")
    expected = probe.endswith(text) if end else probe.startswith(text)
    assert (rx.search(probe) is not None) == expected


@settings(max_examples=200, deadline=None)
@given(
    st.text(max_size=60),  # label values — newlines and unicode included
    st.sampled_from(
        # (no \p{L}: legit in Java+RE2, but Python re — the store-side
        # proxy here — lacks unicode property classes)
        ["web", "a.c", "x[0-9]+", "x[0-9]{2,3}", "^pre", "(ab|cd)", "a.?b"]
    ),
)
def test_regex_label_matcher_wrap_equals_spark_substring_search(value, rx):
    """The pushed (?s:.*)(?:rx)(?s:.*) selector must FULLMATCH a label value
    exactly when Spark's RLIKE substring search matches it — for every
    value, including multiline ones (the round-6 ADVICE data-loss case).
    Python re's dot/DOTALL semantics match RE2's here."""
    import re

    from datafusion_loki_spark.sources.logql import regex_label_matcher

    term = regex_label_matcher("app", rx)
    # term is app=~"<escaped>"; undo the LogQL string-literal escaping
    quoted = term[len('app=~"') : -1]
    pushed = quoted.replace("\\\\", "\x00").replace('\\"', '"').replace(
        "\x00", "\\"
    )
    spark_keeps = re.search(rx, value) is not None
    store_keeps = re.fullmatch(pushed, value) is not None
    assert store_keeps == spark_keeps


def test_regex_label_matcher_blocks_java_only_syntax():
    """Patterns whose Java-RLIKE meaning RE2 cannot reproduce must raise
    (the fail-loudly contract), and legitimate shared syntax must not."""
    import pytest

    from datafusion_loki_spark.sources.logql import regex_label_matcher

    for rx in (
        r"(a)\1",        # backreference
        "a(?=b)",         # lookahead
        "a(?<!b)c",       # lookbehind
        "(?<name>ab)",    # Java named group
        "(?>ab)",         # atomic group
        "a*+",            # possessive quantifier
        "x{2,3}+",        # possessive interval
        "[a-z&&[^bc]]",   # char-class intersection (RE2: literal &&)
        "[a&&b]",         # in-class && without nesting — still Java-only
        r"\Qa.b\E",     # quoting
        "suf$",           # Java $ matches before a trailing newline
        r"\p{Alpha}",    # Java-only POSIX class name
        r"\\*+",         # possessive quantifier on an ESCAPED-backslash
                          # literal — the raw-text lookbehind scan missed
                          # it (the pair's 2nd backslash shadowed it)
        r"\\$",          # trailing-newline-sensitive $ after escaped \\
    ):
        with pytest.raises(ValueError):
            regex_label_matcher("app", rx)
    for rx in ("a.?b", "x[0-9]{2,3}", "^pre", "(ab|cd)", r"\p{L}+",
               r"\p{Lu}\p{Ll}+", r"a\*+", "(?i)abc", "foo`bar",
               # outside a character class '&&' is two literal
               # ampersands in BOTH Java and RE2 — pushable
               "a&&b", "[ab]c&&d",
               # escaped backslash + literal letter, not Java \c/\u
               r"\\c", r"\\u1234", r"\\"):
        assert regex_label_matcher("app", rx).startswith('app=~"')


def test_dotall_is_scoped_to_the_padding_dots():
    """The wrap's DOTALL must apply ONLY to the padding .* — a global
    (?s) prefix would leak into the user's pattern and make ITS dots
    cross newlines, matching values Spark's RLIKE rejects (for a
    negated matcher: silently dropping streams Spark keeps)."""
    import re

    from datafusion_loki_spark.sources.logql import regex_label_matcher

    term = regex_label_matcher("app", "a.c")
    quoted = term[len('app=~"') : -1]
    pushed = quoted.replace("\\\\", "\x00").replace('\\"', '"').replace(
        "\x00", "\\"
    )
    # padding crosses newlines: 'a.c' found after a newline still matches
    assert re.fullmatch(pushed, "junk\nxxaxc\nmore")
    # but the user's own dot must NOT cross a newline, exactly as in
    # Spark: 'a\nc' is not a match for the pattern a.c
    assert re.search("a.c", "a\nc") is None
    assert re.fullmatch(pushed, "a\nc") is None


def test_parse_label_options_is_quote_aware():
    """Commas inside quoted values (equality values, regex quantifiers)
    must not split the selector into broken terms."""
    from datafusion_loki_spark.sources.logql import (
        label_matcher,
        parse_label_options,
        regex_label_matcher,
    )

    joined = ", ".join(
        [
            regex_label_matcher("app", "x[0-9]{2,3}"),
            label_matcher("env", "=", "a,b"),
            label_matcher("job", "!=", 'we"ird, still one'),
        ]
    )
    terms = parse_label_options(joined)
    assert terms == [
        'app=~"(?s:.*)(?:x[0-9]{2,3})(?s:.*)"',
        'env="a,b"',
        'job!="we\\"ird, still one"',
    ]


@settings(max_examples=500, deadline=None)
@given(st.integers(min_value=0, max_value=2_000_000_000_000_000))
def test_aware_datetime_to_ns_is_exact(us):
    """Exact integer µs→ns for every representable datetime — the float
    .timestamp() path truncates 1 µs on ~1% of values (round-7 review,
    measured ~2.5k/200k), corrupting written timestamps and cancelling
    the <= end-bound widening on reads."""
    from datetime import datetime, timedelta, timezone

    from datafusion_loki_spark.sources.logql import aware_datetime_to_ns

    dt = datetime(1970, 1, 1, tzinfo=timezone.utc) + timedelta(
        microseconds=us
    )
    assert aware_datetime_to_ns(dt) == us * 1_000
