"""Property-based fuzz of the SQL-text pushdown bridge (round-7 verdict
Next #8): every push-nothing gate in sqlbridge.py was added after a
hand-found counterexample (multi-FROM, second SELECT, TABLE branches,
comment masking, escape handling, LIMIT blockers) — this inverts the
method. A hypothesis grammar generates random statements over a known
AST, and for each one the extracted PushdownSpec is checked against
ground truth the generator itself carries:

- RETENTION: simulate the store (matcher/line-stage/window semantics
  mirrored from tests/emulator.py, whose fidelity the e2e grids pin)
  and require every corpus row satisfying the statement's own WHERE to
  survive the pruning — the "pushdown never changes results" contract.
  Both the simulation and the WHERE oracle run on Python's re engine,
  so the check isolates EXTRACTOR LOGIC from the Java-vs-RE2 dialect
  questions the dedicated unit tests own.
- LIMIT GATE: a pushed LIMIT (spec.limit set with exact_only) is legal
  only when the generated statement is a plain single-table SELECT and
  every WHERE atom is of a store-exact pushed class.
- PUSH-NOTHING: any statement with >1 SELECT or >1 depth-0 FROM (set
  ops, subqueries, TABLE branches incl. backticked) must push nothing
  at all — matchers, line stages, window, columns, limit.
- PROJECTION: a narrowed column set must cover every referenced column.
- TOTALITY: extract_pushdown never raises.

WHERE evaluation is Kleene three-valued (NULL-correct for absent
labels), matching Spark's filter semantics at the top level.
"""

from __future__ import annotations

import re

import pytest
from hypothesis import given, settings, strategies as st

from datafusion_loki_spark.sources.sqlbridge import extract_pushdown

# --- corpus -------------------------------------------------------------

BASE_NS = 1_577_836_800_000_000_000  # 2020-01-01T00:00:00+00:00
NS = 1_000_000_000

CORPUS = [
    # (row_id, ns, labels, line)
    (0, BASE_NS + 0 * NS, {"app": "web"}, "error in handler"),
    (1, BASE_NS + 1 * NS, {"app": "web", "env": "prod"}, "ERROR 500"),
    (2, BASE_NS + 2 * NS, {"app": "api"}, "ok"),
    (3, BASE_NS + 3 * NS, {"app": "api", "env": "dev"}, "first\nerror second"),
    (4, BASE_NS + 4 * NS, {"app": "db"}, "a_b literal underscore"),
    (5, BASE_NS + 5 * NS, {"env": "prod"}, "no app label here"),
    (6, BASE_NS + 6 * NS, {"app": "webby"}, "partial app match"),
    (7, BASE_NS + 7 * NS, {"app": "a or b"}, "select from union keywords"),
    (8, BASE_NS + 8 * NS, {"app": "O'Brien"}, "quoted ' value"),
    (9, BASE_NS + 9 * NS, {"app": "web"}, ""),
    (10, BASE_NS + 10 * NS, {"app": "api"}, "errxr near match 500"),
    (11, BASE_NS + 11 * NS, {}, "labelless row"),
]


# --- three-valued logic --------------------------------------------------


def k_not(v):
    return None if v is None else (not v)


def k_and(a, b):
    if a is False or b is False:
        return False
    if a is None or b is None:
        return None
    return True


def k_or(a, b):
    if a is True or b is True:
        return True
    if a is None or b is None:
        return None
    return True if (a or b) else False


def like_eval(pattern: str, line: str, ci: bool = False) -> bool:
    rx = "".join(
        ".*" if ch == "%" else "." if ch == "_" else re.escape(ch)
        for ch in pattern
    )
    flags = re.DOTALL | (re.IGNORECASE if ci else 0)
    return re.fullmatch(rx, line, flags) is not None


# --- atom grammar ---------------------------------------------------------
# each atom = (sql, eval(ns, labels, line) -> True/False/None,
#              referenced_columns, kind)

LABEL_KEYS = ["app", "env", "zzz"]
LABEL_VALUES = ["web", "api", "missing", "a or b", "O'Brien", "from x",
                "select", "-- nope", "prod"]
# NOTE: the case-insensitive entry uses the SCOPED form (?i:...) — the
# global inline form (?i)WEB is legal for Java/RE2 even after the
# extractor's (?s:.*)(?:rx)(?s:.*) wrap (both scope the flag to the
# enclosing group, so the push is semantics-preserving), but Python
# 3.11's re, which this harness simulates the store with, rejects
# mid-pattern global flags outright (found by the fuzzer; the wrapped
# push itself is correct, the simulation engine just can't express it).
LABEL_RX = ["we", "^web$", "w.b", "a|b", "e.*r", "x{2,3}", "(?i:WEB)"]
LINE_LIKE_PATS = ["%error%", "%err%or%", "error%", "%500", "%a_b%",
                  "%ERROR%", "%union%", "%handler%", "%ok%"]
LINE_RX = ["err.r", "e.*r", "^first", "500$", "(?i)error", "a|b",
           "err\\d*", "handler`tick"]


def sql_str(v: str) -> str:
    return "'" + v.replace("'", "''") + "'"


@st.composite
def label_atom(draw):
    k = draw(st.sampled_from(LABEL_KEYS))
    form = draw(st.sampled_from(["=", "!=", "<>", "rlike", "not_rlike"]))
    if form in ("=", "!=", "<>"):
        v = draw(st.sampled_from(LABEL_VALUES))
        sql = f"labels[{sql_str(k)}] {form} {sql_str(v)}"

        def ev(ns, labels, line, k=k, v=v, eq=(form == "=")):
            if k not in labels:
                return None
            return (labels[k] == v) if eq else (labels[k] != v)

        return sql, ev, {"labels"}, "label_eq" if form == "=" else "label_ne"
    rx = draw(st.sampled_from(LABEL_RX))
    op = draw(st.sampled_from(["RLIKE", "REGEXP"]))
    neg = form == "not_rlike"
    sql = f"labels[{sql_str(k)}] {'NOT ' if neg else ''}{op} {sql_str(rx)}"

    def ev(ns, labels, line, k=k, rx=rx, neg=neg):
        if k not in labels:
            return None
        hit = re.search(rx, labels[k]) is not None
        return (not hit) if neg else hit

    return sql, ev, {"labels"}, "label_rlike"


@st.composite
def line_atom(draw):
    form = draw(st.sampled_from(
        ["like", "not_like", "ilike", "rlike", "not_rlike", "length"]
    ))
    if form == "length":
        n = draw(st.integers(min_value=0, max_value=20))
        sql = f"length(line) > {n}"
        return (
            sql,
            lambda ns, labels, line, n=n: len(line) > n,
            {"line"},
            "residual",
        )
    if form in ("like", "not_like", "ilike"):
        pat = draw(st.sampled_from(LINE_LIKE_PATS))
        kw = {"like": "LIKE", "not_like": "NOT LIKE", "ilike": "ILIKE"}[form]
        sql = f"line {kw} {sql_str(pat)}"
        ci = form == "ilike"
        neg = form == "not_like"

        def ev(ns, labels, line, pat=pat, ci=ci, neg=neg):
            hit = like_eval(pat, line, ci)
            return (not hit) if neg else hit

        kind = {"like": "line_like", "not_like": "line_not_like",
                "ilike": "residual"}[form]
        return sql, ev, {"line"}, kind
    rx = draw(st.sampled_from(LINE_RX))
    op = draw(st.sampled_from(["RLIKE", "REGEXP"]))
    neg = form == "not_rlike"
    sql = f"line {'NOT ' if neg else ''}{op} {sql_str(rx)}"

    def ev(ns, labels, line, rx=rx, neg=neg):
        hit = re.search(rx, line) is not None
        return (not hit) if neg else hit

    return sql, ev, {"line"}, "line_rlike"


@st.composite
def ts_atom(draw):
    off = draw(st.integers(min_value=-2, max_value=13))
    op = draw(st.sampled_from([">=", ">", "<=", "<"]))
    aware = draw(st.booleans())
    bound_ns = BASE_NS + off * NS
    lit = f"2020-01-01 00:00:{off:02d}" if off >= 0 else "2019-12-31 23:59:59"
    if off < 0:
        bound_ns = BASE_NS - NS
    sql = f"timestamp {op} TIMESTAMP '{lit}{'+00:00' if aware else ''}'"

    def ev(ns, labels, line, op=op, b=bound_ns):
        return {
            ">=": ns >= b, ">": ns > b, "<=": ns <= b, "<": ns < b,
        }[op]

    # zoneless literals are evaluated as UTC here, matching the UTC
    # session the suite runs with; the extractor must NOT emit a window
    # for them either way (it cannot see the session tz)
    return sql, ev, {"timestamp"}, "time"


ATOM = st.one_of(label_atom(), line_atom(), ts_atom())


def _wrap_not(child):
    sql, ev, cols, _ = child
    return (
        f"NOT ({sql})",
        lambda ns, labels, line, ev=ev: k_not(ev(ns, labels, line)),
        cols,
        "compound",
    )


def _combine(op, a, b):
    fn = k_and if op == "AND" else k_or
    return (
        f"({a[0]}) {op} ({b[0]})",
        lambda ns, labels, line, fa=a[1], fb=b[1], fn=fn: fn(
            fa(ns, labels, line), fb(ns, labels, line)
        ),
        a[2] | b[2],
        "compound" if op == "OR" else ("compound" if a[3] == "compound" or b[3] == "compound" else "and"),
    )


@st.composite
def where_tree(draw, max_atoms=4):
    n = draw(st.integers(min_value=1, max_value=max_atoms))
    nodes = [draw(ATOM) for _ in range(n)]
    # the extractor's contract is FLAT AND-conjunctions, so those must
    # dominate the sample (a parenthesized/OR/NOT tree exercises only
    # the push-nothing direction)
    if draw(st.integers(min_value=0, max_value=9)) < 7:
        sql = " AND ".join(a[0] for a in nodes)

        def ev(ns, labels, line, atoms=nodes):
            acc = True
            for a in atoms:
                acc = k_and(acc, a[1](ns, labels, line))
            return acc

        cols = set().union(*(a[2] for a in nodes))
        return (sql, ev, cols, "and"), [a[3] for a in nodes]
    tree = nodes[0]
    kinds = [nodes[0][3]]
    for node in nodes[1:]:
        op = draw(st.sampled_from(["AND", "AND", "AND", "OR"]))
        tree = _combine(op, tree, node)
        kinds.append(node[3])
        if op == "OR":
            kinds.append("compound")
    if draw(st.booleans()) and draw(st.booleans()):
        tree = _wrap_not(tree)
        kinds.append("compound")
    return tree, kinds


COMMENTS = ["", " ", "\n", "\t", " -- select from union or\n",
            " /* or not from */ "]


@st.composite
def spacing(draw):
    return draw(st.sampled_from(COMMENTS)) or " "


@st.composite
def statement(draw):
    """Returns (sql, meta) where meta carries the generator's ground
    truth: kind ('plain'|'blocker'|'multi'), the where oracle, the atom
    kinds, referenced columns, and the literal LIMIT."""
    sp = lambda: draw(spacing())  # noqa: E731
    shape = draw(st.sampled_from(
        ["plain", "plain", "plain", "blocker", "setop", "subquery", "in_sub"]
    ))
    wt = draw(st.none() | where_tree())
    where_sql = f"{sp()}WHERE{sp()}{wt[0][0]}" if wt else ""
    limit = draw(st.none() | st.integers(min_value=1, max_value=20))
    limit_sql = f"{sp()}LIMIT {limit}" if limit is not None else ""
    referenced = set(wt[0][2]) if wt else set()

    if shape == "plain":
        select = draw(st.sampled_from(
            ["*", "line", "line, labels", "timestamp, line", "line AS l"]
        ))
        if select == "*":
            referenced = {"timestamp", "labels", "line"}
        else:
            referenced |= {"line"} | (
                {"labels"} if "labels" in select else set()
            ) | ({"timestamp"} if "timestamp" in select else set())
        sql = f"SELECT{sp()}{select}{sp()}FROM{sp()}logs{where_sql}{limit_sql}"
        return sql, {
            "kind": "plain", "where": wt, "limit": limit,
            "referenced": referenced,
        }
    if shape == "blocker":
        variant = draw(st.sampled_from([
            "SELECT count(*) AS n FROM logs{w}",
            "SELECT DISTINCT line FROM logs{w}",
            "SELECT line, count(*) AS n FROM logs{w} GROUP BY line",
            "SELECT line FROM logs{w} ORDER BY timestamp",
            "SELECT upper(line) AS u FROM logs{w}",
        ]))
        sql = variant.format(w=where_sql) + limit_sql
        return sql, {
            "kind": "blocker", "where": wt, "limit": limit,
            "referenced": referenced
            | ({"line"} if "line" in variant else set())
            | ({"timestamp"} if "timestamp" in variant else set()),
        }
    # multi-SELECT / multi-FROM shapes: must push NOTHING (except the
    # text-global projection, which is branch-safe by construction —
    # checked via the referenced-superset rule)
    wt2 = draw(st.none() | where_tree())
    where2 = f" WHERE {wt2[0][0]}" if wt2 else ""
    referenced |= (set(wt2[0][2]) if wt2 else set()) | {"line"}
    if shape == "setop":
        second = draw(st.sampled_from([
            f"SELECT line FROM logs{where2}",
            "TABLE logs",
            "TABLE `logs`",
            "TABLE  logs",
        ]))
        setop = draw(st.sampled_from(["UNION ALL", "UNION", "INTERSECT"]))
        first = draw(st.sampled_from([
            f"SELECT line FROM logs{where_sql}",
            "TABLE logs",
            "TABLE `logs`",
        ]))
        sql = f"{first}{sp()}{setop}{sp()}{second}{limit_sql}"
        if "TABLE" in first or "TABLE" in second:
            referenced = {"timestamp", "labels", "line"}
    elif shape == "subquery":
        sql = (
            f"SELECT line FROM (SELECT * FROM logs{where2}) t"
            f"{where_sql}{limit_sql}"
        )
        referenced = {"timestamp", "labels", "line"}  # the inner `*`
    else:  # in_sub
        sql = (
            f"SELECT line FROM logs{where_sql}"
            f"{' AND ' if wt else ' WHERE '}"
            f"line IN (SELECT line FROM logs{where2}){limit_sql}"
        )
    return sql, {"kind": "multi", "where": None, "limit": limit,
                 "referenced": referenced}


# --- store simulation (tests/emulator.py semantics) -----------------------


def _matcher_ok(labels, k, op, v):
    actual = labels.get(k)
    if op == "=":
        return actual == v
    if op == "!=":
        return actual != v
    if op == "=~":
        return actual is not None and re.fullmatch(v, actual) is not None
    if op == "!~":
        return actual is None or re.fullmatch(v, actual) is None
    raise AssertionError(f"unknown matcher op {op!r}")


def _stage_ok(line, stage):
    m = re.fullmatch(r"(\|~|!~|\|=|!=) `(.*)`", stage, re.S)
    assert m, f"unparseable rendered stage: {stage!r}"
    op, arg = m.group(1), m.group(2)
    if op == "|=":
        return arg in line
    if op == "!=":
        return arg not in line
    hit = re.search(arg, line) is not None
    return hit if op == "|~" else not hit


def simulate_store(spec):
    """Rows the pruned scan would return, pre-LIMIT, emulator semantics."""
    out = []
    for rid, ns, labels, line in CORPUS:
        if spec.start_ns is not None and ns < spec.start_ns:
            continue
        if spec.end_ns is not None and ns >= spec.end_ns:
            continue
        if not all(_matcher_ok(labels, k, op, v) for k, op, v in spec.matchers):
            continue
        if not all(sub in line for sub in spec.line_contains):
            continue
        if not all(_stage_ok(line, s) for s in spec.line_regexes):
            continue
        out.append(rid)
    return set(out)


EXACT_PUSH_KINDS = {"label_eq", "line_like", "line_not_like", "line_rlike"}


@settings(max_examples=1200, deadline=None)
@given(statement())
def test_extracted_pushdown_never_changes_results(stmt):
    sql, meta = stmt
    spec = extract_pushdown(sql)  # totality: must not raise

    if meta["kind"] == "multi":
        # the shared pruned scan binds EVERY branch/subquery: anything
        # pushed from one would silently filter the others. The ONE
        # exception is the projection, which is computed text-globally
        # over every branch (superset rule below) and so stays safe.
        assert spec.matchers == [], sql
        assert spec.line_contains == [], sql
        assert spec.line_regexes == [], sql
        assert spec.start_ns is None and spec.end_ns is None, sql
        assert spec.limit is None, sql
        if spec.columns is not None:
            assert meta["referenced"] <= set(spec.columns), sql
        return

    pruned = simulate_store(spec)
    wt = meta["where"]
    if wt is None:
        full = {rid for rid, *_ in CORPUS}
    else:
        ev = wt[0][1]
        full = {
            rid
            for rid, ns, labels, line in CORPUS
            if ev(ns, labels, line) is True
        }
    # RETENTION: pruning may only ever drop rows the WHERE drops too
    assert full <= pruned, (
        f"pruning dropped matching rows {sorted(full - pruned)}\n"
        f"sql: {sql}\nspec: {spec}"
    )

    if spec.columns is not None:
        assert meta["referenced"] <= set(spec.columns), sql

    if spec.limit is not None and spec.exact_only:
        # the store's first-n equals the query's first-n only when the
        # statement shape is a plain scan AND every conjunct is pushed
        # with store-exact semantics by some route
        assert meta["kind"] == "plain", sql
        assert spec.limit == meta["limit"], sql
        if wt is not None:
            atom_kinds = [k for k in wt[1]]
            assert all(k in EXACT_PUSH_KINDS for k in atom_kinds), (
                f"LIMIT pushed over non-exact conjunct kinds "
                f"{atom_kinds}\nsql: {sql}"
            )


def test_property_grammar_smoke():
    # the strategies themselves must produce runnable inputs (guards the
    # test against silently degenerating if a pool entry goes stale)
    example = statement().example  # noqa: B018 - existence check only
    assert callable(example)
    spec = extract_pushdown(
        "SELECT line FROM logs WHERE labels['app'] = 'web' LIMIT 3"
    )
    assert spec.limit == 3 and spec.matchers == [("app", "=", "web")]


# --- e2e sample: the simulation validated against the REAL pipeline -------
#
# The retention property above checks the extractor against a Python
# store simulation; this closes the simulation-vs-reality gap by running
# a sample of generated PLAIN statements through loki_sql (pushed) and a
# plain registered loki_table scan (unpushed) against the live emulator,
# asserting row-set equality end to end. Timestamp atoms are excluded
# (the grammar's 2020 literals sit outside the scan's default now-30d
# window on both paths — vacuously equal) and LIMIT is excluded (an
# unpushed Spark LIMIT legitimately picks an arbitrary n-subset, so
# set-equality is not the contract there; the dedicated LIMIT grid in
# test_sqlbridge.py covers those shapes deterministically).


def test_generated_plain_statements_pushed_equals_unpushed_e2e(spark):
    import time as _time

    from hypothesis import HealthCheck, given, settings

    from datafusion_loki_spark import loki_sql, loki_table, register_loki
    from tests.emulator import LokiEmulator

    register_loki(spark)
    em = LokiEmulator().start()
    try:
        now = _time.time_ns()
        NS = 1_000_000_000
        em.seed(
            [
                (now - (60 - i) * 60 * NS, labels, line)
                for i, (_rid, _ns, labels, line) in enumerate(CORPUS)
            ]
        )

        @settings(
            max_examples=25,
            deadline=None,
            suppress_health_check=list(HealthCheck),
        )
        @given(statement())
        def run(stmt):
            sql, meta = stmt
            if meta["kind"] != "plain" or meta["limit"] is not None:
                return
            if "timestamp" in sql.lower():
                return
            pushed = sorted(
                map(str, loki_sql(spark, sql, em.endpoint,
                                  default_label="app").collect())
            )
            loki_table(
                spark, em.endpoint, default_label="app"
            ).createOrReplaceTempView("logs")
            try:
                unpushed = sorted(map(str, spark.sql(sql).collect()))
            finally:
                spark.catalog.dropTempView("logs")
            assert pushed == unpushed, sql

        run()
    finally:
        em.stop()


# --- write-path fuzz (round-9 VERDICT #7) ---------------------------------
#
# The SELECT grammar above covers the read pushdown; these arms cover the
# two write-adjacent surfaces that were example-tested only: the INSERT
# routing in sqlbridge.parse_insert (extracted from loki_sql so the
# fuzzer can reach it without a SparkSession) and the matcher-tuple
# route of loki_table (label_matcher/regex_label_matcher construction ->
# quote-aware parse_label_options splitting -> the emulator's
# selector-parse + Go-unquote).

INSERT_TABLES = ["logs", "t", "my_table", "db.logs", "a.b.c", "_x1"]
INSERT_LINES = [
    "plain line",
    "it's quoted",
    "VALUES",                      # keyword inside a literal
    "insert into t values (1)",    # whole statement inside a literal
    "select * from x union all",
    "-- not a comment here",
    "/* not a block */",
    "semi;colon",
    "",
]
INSERT_TRAILERS = ["", ";", " ;", ";\n", "  \n", "; -- done"]


def _kw(draw, word: str) -> str:
    return draw(st.sampled_from([word.lower(), word.upper(),
                                 word.capitalize()]))


@st.composite
def insert_statement(draw):
    """(sql, expected_kind, body_start_index) — the generator knows
    exactly where the VALUES/SELECT keyword begins."""
    sp = lambda: draw(spacing())  # noqa: E731
    lead = draw(st.sampled_from(
        ["", " ", "\n", " /* lead */ ", "-- lead comment\n"]
    ))
    tbl = draw(st.sampled_from(INSERT_TABLES))
    kind = draw(st.sampled_from(["values", "select"]))
    head = f"{lead}{_kw(draw, 'INSERT')}{sp()}{_kw(draw, 'INTO')}{sp()}{tbl}{sp()}"
    if kind == "values":
        rows = []
        for _ in range(draw(st.integers(min_value=1, max_value=3))):
            line = sql_str(draw(st.sampled_from(INSERT_LINES)))
            rows.append(
                f"(current_timestamp(), map('app', 'web'), {line})"
            )
        body = f"{_kw(draw, 'VALUES')} " + ", ".join(rows)
    else:
        body = (
            f"{_kw(draw, 'SELECT')} current_timestamp() AS ts,"
            f" map('a', 'b') AS m, {sql_str(draw(st.sampled_from(INSERT_LINES)))} AS l"
        )
    trailer = draw(st.sampled_from(INSERT_TRAILERS))
    return head + body + trailer, kind, body


@settings(max_examples=600, deadline=None)
@given(insert_statement())
def test_insert_routing_slices_at_the_keyword(stmt):
    from datafusion_loki_spark.sources.sqlbridge import parse_insert

    sql, kind, body = stmt
    # the generator knows the exact body: everything the routing hands
    # to spark.sql must be the constructed VALUES/SELECT text verbatim —
    # no leaked trailer semicolon or trailing comment (the '; -- done'
    # trailer broke the pre-round-9 rstrip-based slice)
    assert parse_insert(sql) == (kind, body), sql


@st.composite
def bad_insert(draw):
    tbl = draw(st.sampled_from(INSERT_TABLES))
    return draw(st.sampled_from([
        f"INSERT INTO {tbl} (a, b, c) VALUES (1, 2, 3)",   # column list
        f"INSERT OVERWRITE {tbl} VALUES (1)",
        f"INSERT INTO {tbl}",                               # no body
        "INSERT",
        f"insert\tinto {tbl} values2 (1)",                  # \b guard
        f"INSERT INTO 9bad VALUES (1)",                     # bad table head
    ]))


@settings(max_examples=200, deadline=None)
@given(bad_insert())
def test_unsupported_insert_forms_raise(sql):
    from datafusion_loki_spark.sources.sqlbridge import parse_insert

    with pytest.raises(ValueError, match="loki_sql INSERT supports"):
        parse_insert(sql)


@settings(max_examples=300, deadline=None)
@given(statement())
def test_select_statements_never_route_as_insert(stmt):
    from datafusion_loki_spark.sources.sqlbridge import parse_insert

    sql, _meta = stmt
    assert parse_insert(sql) is None, sql
    # ...even with a leading comment CONTAINING an insert statement
    assert parse_insert(f"-- insert into t values (1)\n{sql}") is None, sql


# --- matcher-tuple roundtrip fuzz ------------------------------------------

MATCHER_KEYS = ["app", "env", "a_1", "x9"]
MATCHER_VALUES = [
    "web", "", "a,b", 'with "quote"', "back\\slash", "brace{2,3}",
    "new\nline", "two  spaces", "=", "a=b, c=d", "O'Brien", "ünicode",
    '\\"mixed\\', "trailing\\", ",", '"',
]
# NOTE: no bare '$' here — regex_label_matcher fail-louds on it (the
# Java-vs-RE2 trailing-newline divergence), covered by the
# re2_incompatible arm below
MATCHER_RX = ["we.*", "^a|b", "x{2,3}", "err\\d+", "(?i:WEB)", "a,b",
              "[a-z]+\\.[0-9]{2}"]


@st.composite
def matcher_list(draw):
    out = []
    for _ in range(draw(st.integers(min_value=1, max_value=4))):
        k = draw(st.sampled_from(MATCHER_KEYS))
        op = draw(st.sampled_from(["=", "!=", "=~", "!~"]))
        pool = MATCHER_RX if op in ("=~", "!~") else MATCHER_VALUES
        out.append((k, op, draw(st.sampled_from(pool))))
    return out


@settings(max_examples=600, deadline=None)
@given(matcher_list())
def test_matcher_tuples_roundtrip_through_selector_text(ms):
    """The loki_table(labels=[(k,op,v),...]) route serializes tuples
    through label_matcher/regex_label_matcher, the reader re-parses the
    option with the quote-aware parse_label_options, and the store
    parses the final selector with Go-unquote semantics (tests/
    emulator.py mirrors real Loki). Every value — commas, quotes,
    backslashes, braces, newlines — must survive all three hops."""
    from datafusion_loki_spark.sources.logql import (
        label_matcher,
        parse_label_options,
        regex_label_matcher,
        wrap_rlike,
    )
    from tests.emulator import _MATCHER_RE

    terms = [
        regex_label_matcher(k, v, negate=(op == "!~"))
        if op in ("=~", "!~")
        else label_matcher(k, op, v)
        for k, op, v in ms
    ]
    joined = ", ".join(terms)
    # hop 1: the reader option splits back into exactly these terms
    assert parse_label_options(joined) == terms, joined
    # hops 2+3: the store's selector parse + unquote recovers every
    # matcher — equality values verbatim, regexes as the documented
    # fullmatch wrap of the original pattern
    got = [
        (k, op, re.sub(r"\\(.)", r"\1", v))
        for k, op, v in _MATCHER_RE.findall("{" + joined + "}")
    ]
    want = [
        (k, op, v if op in ("=", "!=") else wrap_rlike(v))
        for k, op, v in ms
    ]
    assert got == want, joined


@settings(max_examples=100, deadline=None)
@given(st.sampled_from([
    "a(?=b)", "x\\1", "a$", "(?<name>x)y", "a*+", "\\Qlit\\E", "[a&&b]",
]))
def test_re2_incompatible_label_regexes_fail_loudly(rx):
    from datafusion_loki_spark.sources.logql import regex_label_matcher

    with pytest.raises(ValueError, match="RE2 cannot reproduce"):
        regex_label_matcher("app", rx)


def test_generated_inserts_roundtrip_e2e(spark):
    """Write-path simulation-vs-reality closure: a sample of generated
    INSERT VALUES statements runs through loki_sql against the live
    emulator; the returned count row and the read-back line set must
    match the generator's ground truth (incl. lines that LOOK like SQL
    keywords/comments — they are literals and must survive verbatim)."""
    from hypothesis import HealthCheck, given, settings

    from datafusion_loki_spark import loki_sql, loki_table, register_loki
    from tests.emulator import LokiEmulator

    register_loki(spark)

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=list(HealthCheck),
    )
    @given(insert_statement())
    def run(stmt):
        sql, kind, _body = stmt
        if kind != "values":
            return
        em = LokiEmulator().start()
        try:
            out = loki_sql(spark, sql, em.endpoint)
            n_expected = sql.count("current_timestamp()")
            assert [r["count"] for r in out.collect()] == [n_expected], sql
            back = loki_table(spark, em.endpoint, default_label="app")
            got = sorted(r.line for r in back.collect())
            want = sorted(
                v.replace("''", "'")
                for v in re.findall(
                    r"map\('app', 'web'\), '((?:[^']|'')*)'\)", sql
                )
            )
            assert got == want, sql
        finally:
            em.stop()

    run()


# --- generative matcher grammar (round-10: VERDICT #7) ----------------------
#
# The pool-based roundtrip above samples hand-picked hazards; this arm
# GENERATES (key, op, value) from grammars — arbitrary unicode equality
# values, a recursive regex grammar for the =~/!~ ops (optionally spiked
# with an RE2-unsupported construct) — and asserts the full contract:
# gate-rejected regexes fail loudly at construction, everything else
# survives the three hops (serialize -> quote-aware option re-parse ->
# store selector parse) byte-exactly.

_GEN_KEY = st.from_regex(r"[a-zA-Z_][a-zA-Z0-9_]{0,7}", fullmatch=True)
_GEN_VAL = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=12
)
_RX_ATOM = st.sampled_from(
    ["a", "bc", "\\d", "\\w", ".", "[a-z]", "[^0-9]", "x{2,3}",
     "q+", "r*", "s?", "ü"]
)
_GEN_RX = st.recursive(
    _RX_ATOM,
    lambda inner: st.one_of(
        st.tuples(inner, inner).map(lambda t: t[0] + t[1]),
        st.tuples(inner, inner).map(lambda t: f"(?:{t[0]}|{t[1]})"),
        inner.map(lambda r: f"({r})"),
        inner.map(lambda r: f"(?i:{r})"),
        inner.map(lambda r: f"(?:{r})+"),
    ),
    max_leaves=6,
)
_RX_BAD = st.sampled_from(
    ["(?=b)", "(?<n>x)", "\\1", "$", "a*+", "\\Qx\\E", "[a&&b]"]
)
_GEN_RX_ANY = st.one_of(
    _GEN_RX, st.tuples(_GEN_RX, _RX_BAD).map(lambda t: t[0] + t[1])
)


@st.composite
def _gen_matcher(draw):
    op = draw(st.sampled_from(["=", "!=", "=~", "!~"]))
    k = draw(_GEN_KEY)
    v = draw(_GEN_VAL if op in ("=", "!=") else _GEN_RX_ANY)
    return (k, op, v)


@settings(max_examples=1200, deadline=None)
@given(st.lists(_gen_matcher(), min_size=1, max_size=4))
def test_generative_matcher_grammar_roundtrips_or_fail_louds(ms):
    from datafusion_loki_spark.sources.logql import (
        label_matcher,
        parse_label_options,
        re2_unsupported,
        regex_label_matcher,
        wrap_rlike,
    )
    from tests.emulator import _MATCHER_RE

    terms, want = [], []
    for k, op, v in ms:
        if op in ("=~", "!~"):
            if re2_unsupported(v):
                # the gate and the constructor must agree exactly:
                # every gate-flagged pattern fail-louds, none is
                # silently serialized into a selector RE2 would reject
                # (or worse, reinterpret)
                with pytest.raises(ValueError, match="RE2 cannot"):
                    regex_label_matcher(k, v, negate=(op == "!~"))
                continue
            terms.append(regex_label_matcher(k, v, negate=(op == "!~")))
            want.append((k, op, wrap_rlike(v)))
        else:
            terms.append(label_matcher(k, op, v))
            want.append((k, op, v))
    if not terms:
        return
    joined = ", ".join(terms)
    assert parse_label_options(joined) == terms, joined
    got = [
        (k, op, re.sub(r"\\(.)", r"\1", v))
        for k, op, v in _MATCHER_RE.findall("{" + joined + "}")
    ]
    assert got == want, joined


def test_pushed_negative_matcher_keeps_table_universe(spark):
    """Round-13 falsifier, pinned: a bare negative label predicate
    (labels['env'] != 'web') used to push {env!="web"} WITHOUT the
    default-label fallback — and Loki's != matches ABSENT labels, so
    the bridge fetched streams the table (default_label='app') never
    contains, returning an extra app-less row the unpushed route
    excludes. Pushdown must optimize the scan, not re-define the
    table: loki_sql now keeps the fallback term ANDed into extracted
    matcher sets (and still drops it when a pushed positive equality
    on the default label guarantees presence)."""
    import time as _time

    from datafusion_loki_spark import loki_sql, loki_table, register_loki
    from tests.emulator import LokiEmulator

    register_loki(spark)
    em = LokiEmulator().start()
    try:
        now = _time.time_ns()
        NS = 1_000_000_000
        em.seed(
            [
                (now - 60 * NS, {"app": "web", "env": "prod"}, "a"),
                (now - 50 * NS, {"app": "api", "env": "web"}, "b"),
                (now - 40 * NS, {"env": "prod"}, "no app label here"),
                (now - 30 * NS, {"app": "web"}, "no env label"),
            ]
        )
        for sql in (
            "SELECT * FROM logs WHERE labels['env'] != 'web'",
            "SELECT * FROM logs WHERE labels['env'] = 'prod'",
            "SELECT * FROM logs WHERE labels['app'] = 'web'",
        ):
            pushed = sorted(
                map(str, loki_sql(spark, sql, em.endpoint,
                                  default_label="app").collect())
            )
            loki_table(
                spark, em.endpoint, default_label="app"
            ).createOrReplaceTempView("logs")
            try:
                unpushed = sorted(map(str, spark.sql(sql).collect()))
            finally:
                spark.catalog.dropTempView("logs")
            assert pushed == unpushed, sql
            assert len(pushed) > 0, sql  # the predicate matches rows
        # the app-less row is reachable when the default label is the
        # queried one with positive equality... it is NOT: the table's
        # universe simply never contains app-less streams
        df = loki_sql(
            spark,
            "SELECT * FROM logs WHERE labels['env'] != 'web'",
            em.endpoint,
            default_label="app",
        )
        assert all("no app label" not in r.line for r in df.collect())
    finally:
        em.stop()
