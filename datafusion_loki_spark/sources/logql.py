"""Spark-filter → LogQL translation (pure functions, no Spark session needed).

This is the direct analogue of the reference's expression translator
(reference: datafusion-loki/src/expr.rs:11-152) re-targeted at the filter
objects Spark's Python Data Source API delivers to
``DataSourceReader.pushFilters`` (pyspark.sql.datasource.Filter subclasses).

Semantics mirrored from the reference:
- label matchers  ``k="v"`` / ``k!="v"`` / ``k=~"rx"`` / ``k!~"rx"``
  (expr.rs:11-47; null literal → empty string, expr.rs:34-35)
- line filters    ``|= `x``` / ``!= `x``` / ``|~ `rx``` / ``!~ `rx```
  with ``(?i)`` for case-insensitive (expr.rs:49-112; the reference only
  pushes ``LIKE '%x%'``-shaped patterns — the gate at expr.rs:98 — which is
  exactly Spark's ``StringContains``)
- time bounds     ``timestamp <op> literal`` → start/end ns query params
  (expr.rs:114-152) — but see translate_filters: unlike the reference we
  treat them as window hints and let Spark re-check, never as Exact
- query assembly  ``{m1, m2} f1 f2`` (table.rs:124-128) with the
  default-label fallback ``{label=~".+"}`` (table.rs:55-58,116-122)

Like the reference, translation is *conservative*: anything not exactly
expressible in LogQL is left for Spark to evaluate post-scan (the same
Exact/Unsupported split as table.rs:140-156 — filters we consume are not
re-evaluated by Spark, so we only consume what LogQL matches exactly).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timedelta, timezone

SECONDS_30_DAYS = 30 * 24 * 60 * 60


def current_timestamp_ns() -> int:
    """≙ utils.rs:3-8."""
    import time

    return time.time_ns()


def thirty_days_before_now_ns() -> int:
    """Default scan window start (≙ utils.rs:10-12, scan.rs:107-111)."""
    return current_timestamp_ns() - SECONDS_30_DAYS * 1_000_000_000


_EPOCH_UTC = datetime(1970, 1, 1, tzinfo=timezone.utc)


def aware_datetime_to_ns(dt: datetime) -> int:
    """tz-aware µs-precision datetime → ns epoch, EXACTLY. The float path
    (``int(dt.timestamp() * 1e6) * 1000``) truncates 1 µs on ~1% of
    values — float64 cannot represent most second×1e6 products, and
    int() rounds the short ones DOWN (measured 2440/200000 mismatches) —
    silently corrupting written timestamps and, on the read side,
    cancelling the +1 µs end-bound widening that keeps boundary rows.
    Integer timedelta arithmetic is exact at datetime's µs precision."""
    return ((dt - _EPOCH_UTC) // timedelta(microseconds=1)) * 1_000


def datetime_to_ns(dt: datetime) -> int:
    """µs-precision datetime → ns epoch (Spark timestamps are µs; Loki wants
    ns on the wire — SURVEY.md §7.4.1).

    Naive datetimes here come from Spark's TimestampType.fromInternal, which
    renders the instant as a HOST-LOCAL wall time (datetime.fromtimestamp) —
    independent of spark.sql.session.timeZone. ``.astimezone()`` attaches
    the host tz (DST-aware), inverting exactly that; aware datetimes
    convert via their own offset. (``replace(tzinfo=utc)`` — the old code —
    silently shifted epochs on non-UTC hosts, shrinking pushed fetch
    windows to the wrong interval.) The conversion itself is exact integer
    arithmetic — see aware_datetime_to_ns for why the float path is not."""
    if dt.tzinfo is None:
        dt = dt.astimezone()
    return aware_datetime_to_ns(dt)


def _quote_label_value(value: str) -> str:
    """Escape for a double-quoted LogQL string. The reference doesn't escape
    (expr.rs:37-43); we do, which only widens the safe translatable set."""
    return '"' + value.replace("\\", "\\\\").replace('"', '\\"') + '"'


def label_matcher(key: str, op: str, value: str | None) -> str:
    """One stream-selector term (≙ expr.rs:11-47). op ∈ {=, !=, =~, !~}.
    A None value becomes the empty string, as in expr.rs:34-35."""
    if op not in ("=", "!=", "=~", "!~"):
        raise ValueError(f"unsupported label op: {op}")
    return f"{key}{op}{_quote_label_value(value if value is not None else '')}"


# Java-regex (Spark RLIKE) constructs a pushed pattern must NOT contain,
# because RE2 (Loki's dialect) either rejects them (store error — the ref
# pushes unconditionally, expr.rs:63, and hits it; we degrade or raise
# depending on the route) or silently parses them as a DIFFERENT
# language (wrong store-side pruning). Classes, all verified divergent:
# - backreferences \1..\9 (RE2: rejected)
# - lookaround (?= (?! (?< and Java named groups (?<name> (RE2: rejected)
# - atomic groups (?> and possessive quantifiers a*+ a++ a?+ a{n,m}+
#   (RE2: rejected)
# - char-class intersection && (RE2: two literal '&'s — silently wrong)
# - \Q...\E quoting, \G, \Z (RE2: rejected or divergent — Java \Z
#   matches before a trailing newline, RE2 only has \z)
# - a bare $ : Java's $ (no MULTILINE) matches before a trailing
#   newline, RE2's only at absolute end of text — a pushed $-pattern
#   would DROP rows Spark keeps when the value ends in '\n'
#   (conservative: an escaped \$ or [$] is also blocked; only pruning
#   is lost on the SQL route)
# - Java-only escapes: \v (Java: vertical-whitespace CLASS; RE2:
#   vertical-tab CHAR — silently different), \h \H \V \R \e \cX
#   \uhhhh (RE2: parse errors)
# - inline flags x/u/d/U (free-spacing, unicode-case, unix-lines,
#   ungreedy-swap — absent or silently different in RE2); i/s/m are
#   shared and stay pushable
# - nested character classes [a[bc]] (Java: union; RE2: literal '[')
# - \p{...}/\P{...} names of 3+ letters (Java POSIX/Is* names vs RE2
#   script names differ; 1-2 letter unicode general categories \p{L}
#   \p{Lu} etc. are identical in both and stay pushable)
import re as _re_mod

RE2_UNSUPPORTED = _re_mod.compile(
    r"\\\d|\(\?=|\(\?!|\(\?<|\(\?>|(?<!\\)[*+?]\+|\{\d+(,\d*)?\}\+"
    r"|\\[QGZvhHVRecu]|\$|\\[pP]\{[A-Za-z]{3,}"
    r"|\(\?[a-zA-Z]*[xudU]|\[[^\]]*\["
)


def _amp_amp_in_class(scan: str) -> bool:
    """True iff ``&&`` occurs inside a character class. Outside a class
    Java and RE2 agree ('&&' is two literal ampersands); inside, Java
    means intersection and RE2 literals — silently divergent, so only
    the in-class case must block the push. ``scan`` must already have
    escaped-backslash pairs neutralized (see re2_unsupported), so a
    remaining backslash always escapes the NEXT char; nested classes
    never reach here (RE2_UNSUPPORTED blocks them first). Errs toward
    in-class on any parse doubt — over-blocking only costs pruning."""
    in_class = False
    i = 0
    while i < len(scan):
        c = scan[i]
        if c == "\\":
            i += 2
            continue
        if not in_class and c == "[":
            in_class = True
        elif in_class and c == "]":
            in_class = False
        elif in_class and scan.startswith("&&", i):
            return True
        i += 1
    return False


def re2_unsupported(rx: str) -> bool:
    """Whether ``rx`` (a Java/Spark-RLIKE pattern) uses constructs whose
    meaning Loki's RE2 cannot reproduce — the push gate. Escaped
    backslash PAIRS are neutralized before scanning: the raw text scan
    otherwise both misses real constructs (``\\\\*+`` — a possessive
    quantifier on an escaped-backslash literal, hidden from the
    ``(?<!\\\\)`` lookbehind by the pair's second backslash; RE2 rejects
    the pushed selector) and false-blocks pushable ones (``\\\\c`` —
    an escaped backslash then a literal 'c', not Java's \\cX)."""
    scan = _re_mod.sub(r"\\\\", "x", rx)
    if RE2_UNSUPPORTED.search(scan) is not None:
        return True
    return _amp_amp_in_class(scan)


def wrap_rlike(rx: str) -> str:
    """A Spark-RLIKE-semantics pattern as a Loki FULLMATCH pattern:
    Loki label matchers anchor, Spark's RLIKE substring-searches, so the
    pattern is padded with scoped-DOTALL dots — `(?s:.*)(?:rx)(?s:.*)`.
    The DOTALL must stay SCOPED to the padding (label values contain
    newlines the padding must cross; a global `(?s)` prefix would leak
    into rx and make ITS dots cross newlines too — superset-wrong for
    `=~` and data-LOSING for `!~`). The ONE implementation shared by the
    tuple-matcher API below and the loki_sql bridge — the wrap is subtle
    enough that two copies drifted once."""
    return f"(?s:.*)(?:{rx})(?s:.*)"


def regex_label_matcher(key: str, rx: str, negate: bool = False) -> str:
    """Stream-selector term for a SPARK-RLIKE-semantics label regex:
    Loki label matchers are fully anchored (fullmatch) while Spark's
    RLIKE is a substring search, so the pattern is wrapped as
    ``(?s:.*)(?:rx)(?s:.*)`` — identical to the loki_sql bridge's
    rewrite (sqlbridge.extract_pushdown). The DOTALL flag is SCOPED to
    the padding dots: they must cross newlines in label values (a
    global prefix ``(?s)`` would leak into rx and make ITS dots cross
    newlines too — matching values Spark's RLIKE rejects, which for a
    negated matcher means silently dropping streams Spark would keep).
    Raises on patterns whose Java-regex meaning RE2 cannot reproduce
    (this is an explicit API — fail loudly rather than push a selector
    the store rejects or misreads). Callers who want verbatim Loki
    fullmatch semantics pass a raw selector body string instead."""
    if not re2_unsupported(rx):
        return label_matcher(key, "!~" if negate else "=~", wrap_rlike(rx))
    raise ValueError(
        f"label regex {rx!r} uses constructs whose Spark-RLIKE meaning "
        "Loki's RE2 cannot reproduce (backreferences, lookaround, "
        "atomic/possessive groups, '&&' intersection, \\Q \\G \\Z, "
        "a trailing-newline-sensitive '$', or Java-only \\p{...} "
        "names); filter it Spark-side or pass a raw Loki selector "
        "string instead"
    )


def line_contains(text: str | None, negate: bool = False) -> str | None:
    """LIKE '%x%' → ``|= `x``` ; NOT LIKE → ``!= `x``` (expr.rs:83-103).
    Returns None (untranslatable) if the text contains a backtick — LogQL
    raw strings cannot escape one."""
    text = text if text is not None else ""
    if "`" in text:
        return None
    return ("!= " if negate else "|= ") + f"`{text}`"


def line_anchor(
    text: str | None, end: bool = False, negate: bool = False
) -> str | None:
    """StringStartsWith → ``|~ `^<quoted>``` ; StringEndsWith →
    ``|~ `<quoted>$``` (negated → ``!~``). Spark rewrites ``LIKE 'abc%'`` /
    ``LIKE '%abc'`` into these filter classes, so anchored-regex
    translation extends automatic line pushdown beyond contains — the
    regex-literal quoting makes it Exact (RE2 ``^``/``$`` anchor at text
    boundaries; Loki lines are newline-free). Returns None if the text
    contains a backtick (LogQL raw strings cannot escape one)."""
    import re as _re

    text = text if text is not None else ""
    if "`" in text:
        return None
    quoted = _re.escape(text)
    rx = f"{quoted}$" if end else f"^{quoted}"
    return ("!~ " if negate else "|~ ") + f"`{rx}`"


def line_regex(rx: str | None, negate: bool = False, case_insensitive: bool = False) -> str | None:
    """~ 'rx' → ``|~ `rx``` ; !~ → ``!~ `rx``` ; ILIKE adds ``(?i)``
    (expr.rs:63-80,104-108)."""
    rx = rx if rx is not None else ""
    if "`" in rx:
        return None
    prefix = "(?i)" if case_insensitive else ""
    return ("!~ " if negate else "|~ ") + f"`{prefix}{rx}`"


def like_pattern_to_contains(pattern: str) -> str | None:
    """The reference's LIKE gate (expr.rs:83-98): only ``%x%`` with no
    inner ``%``/``_`` translates; everything else is unsupported."""
    if (
        len(pattern) >= 2
        and pattern.startswith("%")
        and pattern.endswith("%")
    ):
        inner = pattern[1:-1]
        if "%" not in inner and "_" not in inner:
            return inner
    return None


def build_logql(
    label_matchers: list[str],
    line_filters: list[str],
    default_label: str | None = None,
) -> str:
    """Assemble ``{m1, m2} f1 f2`` (≙ table.rs:116-128). With no label
    matcher, falls back to ``{default_label=~".+"}`` or raises — the same
    error the reference produces (table.rs:118-121)."""
    matchers = list(label_matchers)
    if not matchers:
        if default_label is None:
            raise ValueError(
                "no label filter pushed down and no default label configured"
            )
        matchers = [f'{default_label}=~".+"']
    query = "{" + ", ".join(matchers) + "}"
    if line_filters:
        query += " " + " ".join(line_filters)
    return query


@dataclass
class TranslationResult:
    """Outcome of pushdown negotiation (≙ supports_filters_pushdown +
    scan() partitioning of filters, table.rs:90-156)."""

    label_matchers: list[str] = field(default_factory=list)
    line_filters: list[str] = field(default_factory=list)
    start_ns: int | None = None
    end_ns: int | None = None
    supported: list = field(default_factory=list)
    unsupported: list = field(default_factory=list)

    def query_params(self, default_label: str | None = None) -> dict:
        """HTTP params with the reference's 30-day default window
        (scan.rs:104-115)."""
        start = self.start_ns if self.start_ns is not None else thirty_days_before_now_ns()
        end = self.end_ns if self.end_ns is not None else current_timestamp_ns()
        return {
            "query": build_logql(self.label_matchers, self.line_filters, default_label),
            "start": start,
            "end": end,
        }


def _attr_name(attribute) -> str | None:
    """Filter.attribute is a ColumnPath tuple; a top-level column is a
    1-tuple. Nested (len>1) paths can't target our fixed schema's scalar
    columns, so they're unsupported."""
    if isinstance(attribute, str):
        return attribute
    if isinstance(attribute, (tuple, list)) and len(attribute) == 1:
        return attribute[0]
    return None


def translate_filters(
    filters,
    ts_col: str = "timestamp",
    line_col: str = "line",
) -> TranslationResult:
    """Translate Spark DS V2 filters into LogQL parts.

    Handles the filter shapes Spark can deliver for the log schema:
    - StringContains(line, x)        → ``|= `x```     (≙ LIKE '%x%' gate)
    - Not(StringContains(line, x))   → ``!= `x```
    - StringStartsWith(line, x)      → ``|~ `^x```    (≙ LIKE 'x%')
    - StringEndsWith(line, x)        → ``|~ `x$```    (≙ LIKE '%x')
    - GreaterThan[OrEqual](ts, t)    → start bound    (≙ expr.rs:122-136)
    - LessThan[OrEqual](ts, t)       → end bound      (≙ expr.rs:122-136)
    Everything else is yielded back as unsupported, exactly like the
    Unsupported arm of table.rs:150-154. Map-subscript label predicates
    never reach pushFilters (Spark's filter language can't express them —
    SURVEY.md §7.4.2); label selectors arrive via reader options instead.

    Time bounds DIVERGE from the reference deliberately: the reference
    marks them Exact (table.rs:150) although it maps ``>`` and ``>=`` to
    the same inclusive start and ignores whether the store's end bound is
    inclusive — boundary rows can be wrongly kept or lost. Here the bounds
    only SHRINK the HTTP window to a superset of the predicate (``<=`` end
    widened by 1 µs for ns-precision stores) and the filters are returned
    as unsupported so Spark re-evaluates them post-scan. Pushdown stays a
    pure optimization; it can never change results.
    """
    from pyspark.sql.datasource import (
        GreaterThan,
        GreaterThanOrEqual,
        LessThan,
        LessThanOrEqual,
        Not,
        StringContains,
        StringEndsWith,
        StringStartsWith,
    )

    result = TranslationResult()
    for f in filters:
        translated = False
        target = f.child if isinstance(f, Not) else f
        negate = isinstance(f, Not)
        attr = _attr_name(getattr(target, "attribute", None))

        if isinstance(target, StringContains) and attr == line_col:
            lf = line_contains(target.value, negate=negate)
            if lf is not None:
                result.line_filters.append(lf)
                translated = True
        elif isinstance(target, (StringStartsWith, StringEndsWith)) and attr == line_col:
            lf = line_anchor(
                target.value,
                end=isinstance(target, StringEndsWith),
                negate=negate,
            )
            if lf is not None:
                result.line_filters.append(lf)
                translated = True
        elif (
            not negate
            and isinstance(target, (GreaterThan, GreaterThanOrEqual))
            and attr == ts_col
            and isinstance(target.value, datetime)
        ):
            # window start: inclusive T covers both > T and >= T
            ns = datetime_to_ns(target.value)
            result.start_ns = ns if result.start_ns is None else max(result.start_ns, ns)
        elif (
            not negate
            and isinstance(target, (LessThan, LessThanOrEqual))
            and attr == ts_col
            and isinstance(target.value, datetime)
        ):
            # window end: <= T must still see rows at exactly T even when
            # the store's end bound is exclusive → widen by 1 µs of ns
            ns = datetime_to_ns(target.value)
            if isinstance(target, LessThanOrEqual):
                ns += 1_000
            result.end_ns = ns if result.end_ns is None else min(result.end_ns, ns)

        # time filters land here with translated=False on purpose: they
        # shrank the fetch window but are still re-evaluated by Spark
        (result.supported if translated else result.unsupported).append(f)
    return result


_LINE_FILTER_OPS = ("|=", "!=", "|~", "!~")


def parse_line_filter_options(option: str | None) -> list[str]:
    """Reader option ``line_filters`` → LogQL pipeline segments.

    Accepts ``;``-separated segments, each ``<op> <text>`` with op in
    {|=, !=, |~, !~} (text taken verbatim, backticks added if missing) —
    the explicit route for regex/ILIKE line pruning that Spark's filter
    language cannot deliver to pushFilters (≙ expr.rs:63-80,104-108)."""
    if not option:
        return []
    # split on ';' but not inside a backtick-quoted text
    segments: list[str] = []
    buf: list[str] = []
    in_ticks = False
    for ch in option:
        if ch == "`":
            in_ticks = not in_ticks
        if ch == ";" and not in_ticks:
            segments.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    segments.append("".join(buf))
    out = []
    for seg in segments:
        seg = seg.strip()
        if not seg:
            continue
        op = next((o for o in _LINE_FILTER_OPS if seg.startswith(o)), None)
        if op is None:
            raise ValueError(
                f"line filter segment must start with one of {_LINE_FILTER_OPS}: {seg!r}"
            )
        text = seg[len(op):].strip()
        if not (text.startswith("`") and text.endswith("`") and len(text) >= 2):
            if "`" in text:
                raise ValueError(f"line filter text cannot contain a backtick: {text!r}")
            text = f"`{text}`"
        out.append(f"{op} {text}")
    return out


def parse_label_options(labels_option: str | None) -> list[str]:
    """Reader option ``labels`` → stream-selector terms. Accepts either a
    raw selector body (``app="x", env!="prod"``) or a JSON object of
    key→value equality matchers. This is the §7.4.2(b) rewrite layer that
    substitutes for map-subscript pushdown.

    Term splitting is QUOTE-AWARE: a comma inside a double-quoted value
    (an equality value ``a,b``, a regex quantifier ``x{2,3}``) is part
    of the term, not a separator — a naive split would silently mangle
    the selector into store-rejected or wrong-stream terms."""
    if not labels_option:
        return []
    text = labels_option.strip()
    if text.startswith("{"):
        import json

        obj = json.loads(text)
        return [label_matcher(k, "=", v) for k, v in obj.items()]
    terms: list[str] = []
    buf: list[str] = []
    in_quotes = False
    escaped = False
    for ch in text:
        if escaped:
            buf.append(ch)
            escaped = False
            continue
        if ch == "\\" and in_quotes:
            buf.append(ch)
            escaped = True
            continue
        if ch == '"':
            in_quotes = not in_quotes
            buf.append(ch)
            continue
        if ch == "," and not in_quotes:
            terms.append("".join(buf).strip())
            buf = []
            continue
        buf.append(ch)
    terms.append("".join(buf).strip())
    return [t for t in terms if t]
