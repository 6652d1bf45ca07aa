"""SQL-text pushdown bridge — restores the reference's AUTOMATIC pushdown
at the SQL layer.

The pinned pyspark's Python Data Source API cannot carry map-subscript
filters, LIMIT, or projection through its hooks (SURVEY §7.4.3), so a bare
``spark.sql("... WHERE labels['app']='x' LIMIT 10")`` over a registered
loki table scans the whole default-label stream. The reference performs
this pushdown inside the provider (datafusion-loki/src/expr.rs:11-47,
src/table.rs:140-156, src/scan.rs:131-146); this module recovers it by
inspecting the SQL TEXT under the same conjuncts-only contract DataFusion
gives the reference (``supports_filters_pushdown`` receives a list of
AND-ed conjuncts — OR/NOT trees never reach expr.rs either):

- a statement with MORE THAN ONE depth-0 FROM (set operations, even over
  the same table name) or MORE THAN ONE SELECT keyword (any subquery)
  pushes NOTHING: a registered loki table binds one shared pruned scan,
  so pruning extracted from one branch/the outer query would silently
  filter the other branch/the subquery too — wrong results, not just
  lost pruning;
- extraction runs ONLY when the WHERE clause is one flat AND-conjunction
  (no OR / NOT outside string literals — parenthesized sub-trees are safe
  because any OR/NOT inside them trips the same gate, and a BETWEEN's
  inner AND merely splits into two residual fragments); anything else
  pushes nothing and the query still runs correctly, just unpruned;
- every extracted predicate REMAINS in the SQL, so Spark re-checks it
  row-by-row — a partial extraction can only lose pruning, never change
  results. Label matchers narrow which STREAMS are queried; that is their
  meaning, identical to the reference's Exact label pushdown, and the
  matcher conditions are still re-verified against the returned labels
  column;
- time bounds and line-contains conjuncts are NOT re-pushed here — the
  scan's own pushFilters hook already carries them (O4/O5) and an option
  would duplicate the LogQL pipeline stage; the extractor still parses
  them (with logql's ``<=`` end-widening) because their store-exactness
  class decides whether LIMIT may push;
- LIMIT forwards as the HTTP limit only when EVERY conjunct pushed
  store-exact (labels =/!=, line contains): with an inexact (superset)
  time window the store's first-n would differ from the query's first-n
  (the O5/O8 exact-vs-inexact split);
- LIMIT additionally requires the STATEMENT SHAPE to be a plain
  single-table SELECT: any GROUP BY / ORDER BY / HAVING / DISTINCT /
  set operation / JOIN / window / subquery / function call in the select
  list means the SQL LIMIT bounds the OUTPUT of a reordering or
  multiplicity-changing operator, not the scan, so truncating the scan
  input would change results (wrong counts, missing distinct values,
  wrong top-n). DataFusion gives the reference this guard for free — the
  optimizer passes ``fetch`` to ``TableProvider::scan`` only when nothing
  reorders above the scan (scan.rs:131-146); the SQL-text bridge must
  recreate it explicitly. The gate is a conservative whitelist: a scalar
  function in the select list also blocks the push (correct either way —
  an unpushed LIMIT only costs pruning, never results).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from datetime import datetime

_STR_LIT = re.compile(r"'(?:[^']|'')*'")

_LABEL = re.compile(
    r"^\s*labels\s*\[\s*'([^']*)'\s*\]\s*(!=|<>|=)\s*('(?:[^']|'')*')\s*$",
    re.I,
)
_LABEL_RLIKE = re.compile(
    r"^\s*labels\s*\[\s*'([^']*)'\s*\]\s+(not\s+)?(?:rlike|regexp)\s+"
    r"('(?:[^']|'')*')\s*$",
    re.I,
)
_LINE_LIKE = re.compile(r"^\s*line\s+like\s+('(?:[^']|'')*')\s*$", re.I)
_LINE_NOT_LIKE = re.compile(
    r"^\s*line\s+not\s+like\s+('(?:[^']|'')*')\s*$", re.I
)
_LINE_ILIKE = re.compile(r"^\s*line\s+ilike\s+('(?:[^']|'')*')\s*$", re.I)
_LINE_RLIKE = re.compile(
    r"^\s*line\s+(not\s+)?(?:rlike|regexp)\s+('(?:[^']|'')*')\s*$", re.I
)
_TS = re.compile(
    r"^\s*timestamp\s*(>=|>|<=|<)\s*timestamp\s*('(?:[^']|'')*')\s*$", re.I
)

# regex constructs RE2 (Loki's dialect) cannot parse — a pushed pattern
# containing one would turn a working Spark query into a store error, so
# such regexes stay Spark-side (the ref pushes unconditionally, expr.rs:63,
# and would hit the same store error; we choose the quieter degradation).
# The gate itself is shared with the loki_table tuple-matcher route.
from datafusion_loki_spark.sources.logql import re2_unsupported as _re2_unsupported

# statement shapes under which SQL LIMIT bounds a reordering / row-
# multiplicity-changing operator's OUTPUT, so the scan INPUT must not be
# truncated (see the module docstring's LIMIT safety argument)
_LIMIT_BLOCKERS = re.compile(
    r"\bgroup\s+by\b|\border\s+by\b|\bhaving\b|\bdistinct\b|\bunion\b"
    r"|\bintersect\b|\bexcept\b|\bjoin\b|\bover\b"
    # FROM-side multiplicity/ordering changers the select-list paren
    # check never sees: TABLESAMPLE halves a truncated scan instead of
    # truncating a sampled scan; LATERAL VIEW multiplies or drops rows;
    # PIVOT/UNPIVOT reshape; SORT BY (and its CLUSTER/DISTRIBUTE kin)
    # is a partition-local ORDER BY — under the pushed-limit
    # single-partition scan it becomes a full sort whose top-n the
    # store's first-n-by-time would falsify
    r"|\btablesample\b|\blateral\b|\bpivot\b|\bunpivot\b"
    r"|\bsort\s+by\b|\bcluster\s+by\b|\bdistribute\s+by\b",
    re.I,
)


def _from_candidates(masked: str) -> list[tuple[str, int, int]]:
    """All ``FROM <ident>`` occurrences at parenthesis depth 0, skipping
    SQL-standard non-table FROMs: ``EXTRACT(x FROM y)`` / ``SUBSTRING(x
    FROM i)`` / ``TRIM(x FROM y)`` sit inside their call parens (depth
    ≥ 1), and ``IS [NOT] DISTINCT FROM`` is excluded by its preceding
    keyword. Returns (name, start, end) spans into the masked text."""
    out: list[tuple[str, int, int]] = []
    depth = 0
    for m in re.finditer(
        r"[()]|\bfrom\s+(`[^`]+`|[A-Za-z_][\w.]*)", masked, re.I
    ):
        tok = m.group(0)
        if tok == "(":
            depth += 1
            continue
        if tok == ")":
            depth = max(0, depth - 1)
            continue
        if depth == 0:
            if re.search(r"\bdistinct\s*$", masked[: m.start()], re.I):
                continue  # IS [NOT] DISTINCT FROM — a predicate, not a table
            # backtick quoting is mandatory for reserved-word table
            # names (FROM `table`); strip the ticks so loki_sql can bind
            # the view instead of rejecting valid SQL
            out.append((m.group(1).strip("`"), m.start(), m.end()))
    return out


def _mask_scan(sql: str) -> tuple[str, bool]:
    """One stateful pass over the statement: blank string-literal
    contents AND comment bodies (length-preserving) so structural scans
    can't be fooled by quoted or commented-out text, and report whether
    any literal contains a backslash.

    Comments must be masked, not just literals: a commented-out WHERE
    (``-- WHERE labels['app']='x'``) is dead text to Spark but looked
    live to a literal-only masker — the extracted matcher then pruned a
    query that has no WHERE (wrong results). A quote inside a comment
    (``-- don't``) likewise desynced regex-based quote pairing for the
    rest of the statement; the scanner resolves both by construction.

    The backslash flag: with Spark's default parser
    (escapedStringLiterals=false) ``'a\\\\b'`` evaluates to ``a\\b``
    while this extractor reads literals verbatim — every extracted
    VALUE (matcher, pattern, timestamp) would differ from the value
    Spark compares, turning pruning into data loss. Rather than
    re-implement Spark's escape rules (which flip with a session
    config the pure extractor cannot see), any backslash inside any
    literal makes the whole statement push NOTHING."""
    out = list(sql)
    bs_in_literal = False
    i, n = 0, len(sql)
    while i < n:
        c = sql[i]
        if c == "'":
            i += 1
            while i < n:
                if sql[i] == "'":
                    if i + 1 < n and sql[i + 1] == "'":  # '' doubling
                        out[i] = out[i + 1] = "\x00"
                        i += 2
                        continue
                    break
                if sql[i] == "\\":
                    bs_in_literal = True
                out[i] = "\x00"
                i += 1
            i += 1  # closing quote (or EOS on an unterminated literal)
        elif c == "-" and sql.startswith("--", i):
            while i < n and sql[i] != "\n":
                out[i] = " "
                i += 1
        elif c == "/" and sql.startswith("/*", i):
            end = sql.find("*/", i + 2)
            end = n if end == -1 else end + 2
            for j in range(i, end):
                if sql[j] != "\n":
                    out[j] = " "
            i = end
        else:
            i += 1
    return "".join(out), bs_in_literal


def _mask(sql: str) -> str:
    """Blank out string-literal and comment contents (length-preserving)
    so structural scans can't be fooled by quoted or dead text."""
    return _mask_scan(sql)[0]


def _unquote(lit: str) -> str:
    """SQL string literal (with quotes) → value ('' doubling unescaped)."""
    return lit[1:-1].replace("''", "'")


@dataclass
class PushdownSpec:
    """What the SQL text allows the scan to push store-side."""

    table: str | None = None
    matchers: list[tuple[str, str, str]] = field(default_factory=list)  # (k, op, v)
    line_contains: list[str] = field(default_factory=list)
    line_regexes: list[str] = field(default_factory=list)  # rendered |~ stages
    start_ns: int | None = None
    end_ns: int | None = None
    limit: int | None = None
    exact_only: bool = True  # every conjunct pushed with store-exact semantics
    columns: tuple[str, ...] | None = None  # None = full schema


def _iso_ns(lit: str) -> int | None:
    from datafusion_loki_spark.sources.logql import aware_datetime_to_ns

    try:
        dt = datetime.fromisoformat(lit)
    except ValueError:
        return None
    if dt.tzinfo is None:
        # Spark interprets a zoneless timestamp literal in
        # spark.sql.session.timeZone, which this pure extractor cannot
        # see — an assumed-UTC bound would be shifted by the session
        # offset, and a consumer of start_ns/end_ns would then fetch a
        # window that EXCLUDES matching rows. Emit no bound (the
        # conjunct still clears exact_only via the _TS branch, which is
        # the only thing loki_sql consumes today).
        return None
    # exact integer conversion: the float .timestamp() path truncated
    # 1 µs on ~1% of values, exactly cancelling the <= end-widening
    return aware_datetime_to_ns(dt)


def extract_pushdown(sql: str) -> PushdownSpec:
    """Scan one SELECT statement for store-pushable predicates.

    Never raises on unrecognized SQL — the worst case is an empty spec
    (no pruning). See the module docstring for the safety argument."""
    spec = PushdownSpec()
    masked, bs_in_literal = _mask_scan(sql)
    if bs_in_literal:
        # a backslash inside any literal: the value Spark evaluates
        # depends on spark.sql.parser.escapedStringLiterals, which this
        # pure extractor cannot see — extracted values could diverge
        # from Spark's and turn pruning into data loss. Bind the table
        # (first depth-0 FROM) for view setup and push nothing.
        cands = _from_candidates(masked)
        if cands:
            spec.table = cands[0][0]
        spec.exact_only = False
        return spec

    # projection first: the scan only needs the schema columns the
    # statement REFERENCES anywhere (select list, WHERE, GROUP BY,
    # subqueries, every set-op branch ...) — a superset of what any one
    # branch projects, which is exactly what makes the narrowing
    # always-safe, including under the push-nothing gates below —
    # PROVIDED every used column is textually NAMED. `*` (outside
    # literals), a `TABLE ident` branch, and NATURAL joins reference
    # columns implicitly, so they force the full schema; a statement
    # referencing no log column (SELECT COUNT(1)) still needs one
    # column to scan → cheapest (timestamp).
    # ≙ O6 / ProjectionMask::roots (src/scan.rs:203-206), automated.
    if "*" not in masked and not re.search(
        r"\btable\s+(?:`|[A-Za-z_])|\bnatural\b", masked, re.I
    ):
        referenced = tuple(
            c
            for c in ("timestamp", "labels", "line")
            if re.search(rf"\b{c}\b", masked, re.I)
        )
        spec.columns = referenced or ("timestamp",)

    cands = _from_candidates(masked)
    if cands:
        spec.table = cands[0][0]
        if len(cands) > 1:
            # two depth-0 FROMs — a set operation. Even over the SAME
            # table name the branches are distinct scans with distinct
            # predicates, but a registered loki table binds ONE pruned
            # scan shared by every branch, so pushing any branch's
            # matcher would silently filter the other branches too
            # (wrong results, not just lost pruning). Bind the first
            # name for view setup and push nothing.
            spec.exact_only = False
            return spec

    if len(re.findall(r"\bselect\b", masked, re.I)) != 1 or re.search(
        r"\btable\s+(?:`|[A-Za-z_])", masked, re.I
    ):
        # a subquery (scalar, IN, EXISTS, derived table) may read the
        # SAME registered loki table; like the set-op case above, the
        # single shared scan must then stay unpruned — matchers/time/
        # line extracted from the outer WHERE would narrow the inner
        # query's input and change results. Mirrors the LIMIT shape
        # gate, now applied to EVERY push class. Spark's `TABLE ident`
        # queryPrimary is a set-op branch with NO second SELECT keyword
        # and NO second FROM (``... UNION ALL TABLE logs``), so the
        # TABLE keyword is gated explicitly too.
        spec.exact_only = False
        return spec

    m = re.search(r"\blimit\s+(\d+)\s*;?\s*$", masked, re.I)
    if m:
        # statement-shape gate (module docstring): LIMIT reaches the store
        # only for a plain single-table SELECT with a call-free select
        # list — anything that reorders rows or changes multiplicity
        # between scan and LIMIT makes input-truncation wrong
        limit_safe = _LIMIT_BLOCKERS.search(masked) is None
        if limit_safe and cands:
            sel = re.search(r"\bselect\b", masked, re.I)
            select_list = masked[sel.end() : cands[0][1]]
            from_tail = re.split(
                r"\bwhere\b|\blimit\b|;", masked[cands[0][2] :],
                maxsplit=1, flags=re.I,
            )[0]
            # a call in the select list (aggregate or scalar alike —
            # conservative) or a comma after the table (implicit join)
            limit_safe = "(" not in select_list and "," not in from_tail
        if limit_safe:
            spec.limit = int(m.group(1))

    wm = re.search(
        r"\bwhere\b(.*?)(?=\bgroup\s+by\b|\border\s+by\b|\blimit\b|;|$)",
        masked,
        re.I | re.S,
    )
    if wm is None:
        return spec  # no WHERE: exact_only stays True (plain LIMIT pushes)

    lo, hi = wm.span(1)
    where_masked = masked[lo:hi]
    # `NOT LIKE` / `NOT RLIKE` are conjunct classes of their own (ref
    # expr.rs:99-103, 40-41) — exempt them from the NOT-tree gate
    if re.search(
        r"\bor\b|\bnot\b(?!\s+(?:like|rlike|regexp)\b)", where_masked, re.I
    ):
        spec.exact_only = False
        return spec

    # split on AND at positions found in the masked text, slice the raw SQL
    bounds = [lo]
    for am in re.finditer(r"\band\b", where_masked, re.I):
        bounds.append(lo + am.start())
        bounds.append(lo + am.end())
    bounds.append(hi)
    conjuncts = [sql[bounds[i] : bounds[i + 1]] for i in range(0, len(bounds), 2)]

    for conj in conjuncts:
        cm = _LABEL.match(conj)
        if cm:
            op = "!=" if cm.group(2) in ("!=", "<>") else "="
            val = _unquote(cm.group(3))
            spec.matchers.append((cm.group(1), op, val))
            if op == "=" and val == "":
                # {k=""} ALSO matches absent-label streams (Loki treats
                # missing as "") — a strict superset of Spark's
                # NULL-dropping equality, same LIMIT hazard as != below;
                # the matcher itself stays safe (Spark re-checks)
                spec.exact_only = False
            if op == "!=":
                # the store's != keeps ABSENT-label rows (Loki treats a
                # missing label as ""), Spark's NULL-semantics re-check
                # drops them — a strict superset, so the store's first-n
                # under LIMIT could re-check down to fewer than n rows
                # while matches exist beyond the bound. The ref marks !=
                # Exact and skips the re-check (expr.rs), silently keeping
                # Loki's absent-matches; we keep Spark/SQL semantics and
                # block the LIMIT push instead.
                spec.exact_only = False
            continue
        cm = _LABEL_RLIKE.match(conj)
        if cm:
            rx = _unquote(cm.group(3))
            negated = cm.group(2) is not None
            # an inline (?i) folds ASCII-only under Java but Unicode
            # simple-fold under RE2 — the store matches a SUPERSET. Safe
            # for the positive direction (Spark re-checks); for the
            # NEGATED matcher the superset is excluded stream-side, so
            # rows Spark would keep never arrive — data loss. Keep the
            # pattern Spark-side.
            if not _re2_unsupported(rx) and not (negated and "(?i" in rx):
                op = "!~" if negated else "=~"
                # ≙ expr.rs:40-41 (=~ / !~ selector terms), with one
                # deliberate delta: Loki label-regex matchers are FULLY
                # ANCHORED (fullmatch) while Spark's RLIKE is a substring
                # search, so the raw pattern the ref pushes would DROP
                # partial-match streams. Wrapping as (?s:.*)(?:rx)(?s:.*)
                # makes the selector exactly Spark's semantics on present
                # labels (top-level ^ inside rx still anchors correctly:
                # the wrapping .* then matches empty). The DOTALL flag is
                # SCOPED to the padding dots — they must cross NEWLINES
                # in label values (else the store-side fullmatch fails
                # where Spark's substring RLIKE matches after a newline,
                # a data-losing push), but a global (?s) prefix would
                # leak into rx and make ITS dots cross newlines too,
                # matching values Spark rejects — superset-wrong for =~
                # (caught by the Spark re-check) and data-LOSING for !~
                # (excluded streams never reach the re-check).
                from datafusion_loki_spark.sources.logql import wrap_rlike

                spec.matchers.append((cm.group(1), op, wrap_rlike(rx)))
                # BOTH directions clear exact_only: !~ has the != class
                # absent-label superset, and an =~ whose rx can match
                # the empty string ({k=~".*"}-style) matches absent-
                # label streams too — rather than probe rx-matches-empty
                # (another Java-vs-RE2 judgment call), the regex matcher
                # conservatively never co-pushes a LIMIT. The matcher
                # itself stays safe either way (Spark re-checks).
                spec.exact_only = False
            else:
                spec.exact_only = False
            continue
        cm = _LINE_NOT_LIKE.match(conj) or _LINE_LIKE.match(conj)
        if cm:
            from datafusion_loki_spark.sources.logql import (
                like_pattern_to_contains,
            )

            inner = like_pattern_to_contains(_unquote(cm.group(1)))
            if inner is not None and "`" not in inner:
                # NOT LIKE rides pushFilters (Not(StringContains) → !=),
                # so only the positive form lands in line_contains; both
                # are store-EXACT classes (expr.rs:83-103)
                if _LINE_NOT_LIKE.match(conj) is None:
                    spec.line_contains.append(inner)
                continue
            spec.exact_only = False
            continue
        cm = _LINE_RLIKE.match(conj)
        if cm:
            from datafusion_loki_spark.sources.logql import line_regex

            rx = _unquote(cm.group(2))
            negated_line = cm.group(1) is not None
            # same negated-(?i) hazard as the label-RLIKE branch: RE2's
            # Unicode fold matches a superset of Java's ASCII fold, and
            # a negated store-side stage over-drops — Spark-side only
            stage = (
                line_regex(rx, negate=negated_line)
                if not _re2_unsupported(rx)
                and not (negated_line and "(?i" in rx)
                else None
            )
            if stage is not None:
                # exact classes (expr.rs:63-80; line filters are substring
                # searches on both sides, and `line` is never NULL)
                spec.line_regexes.append(stage)
            else:
                spec.exact_only = False
            continue
        cm = _LINE_ILIKE.match(conj)
        if cm:
            # NOT pushed (round-7 review): Spark's ILIKE lowercases with
            # full Unicode (Turkish İ → i̇, contains ASCII i) while a
            # pushed RE2 (?i) stage does simple case folding that does
            # NOT fold such pairs — the store-side stage would drop rows
            # Spark keeps (line filters never reach the re-check). A
            # data-losing push for non-ASCII data, which the text can't
            # rule out, so ILIKE always stays Spark-side.
            spec.exact_only = False
            continue
        cm = _TS.match(conj)
        if cm:
            op, ns = cm.group(1), _iso_ns(_unquote(cm.group(2)))
            spec.exact_only = False  # time windows are superset hints
            if ns is None:
                continue
            if op in (">=", ">"):
                spec.start_ns = (
                    ns if spec.start_ns is None else max(spec.start_ns, ns)
                )
            else:
                # `<= T` must survive an exclusive store end at exactly T
                # (same 1 µs-of-ns widening as logql.translate_filters)
                end = ns + 1_000 if op == "<=" else ns
                spec.end_ns = end if spec.end_ns is None else min(spec.end_ns, end)
            continue
        spec.exact_only = False  # residual conjunct: Spark-only

    return spec


# --- INSERT routing -------------------------------------------------------

_INSERT_HEAD = re.compile(
    r"\s*insert\s+into\s+[A-Za-z_][\w.]*\s+(values\b|select\b)", re.I
)
_INSERT_ANY = re.compile(r"\s*insert\b", re.I)


def parse_insert(sql: str) -> "tuple[str, str] | None":
    """Route an ``INSERT INTO <t> VALUES ...`` / ``INSERT INTO <t>
    SELECT ...`` statement: returns (kind, body) with kind in
    {'values', 'select'} and body the statement text from that keyword
    on (trailing whitespace/';' stripped); returns None for non-INSERT
    statements; raises ValueError for any other INSERT form (column
    lists, OVERWRITE, multi-table) — the loki schema is fixed, so those
    are caller bugs that deserve a loud, specific error instead of the
    SELECT path's confusing "requires a FROM clause".

    The head is matched against the MASKED statement (comments blanked,
    literal contents zeroed — both length-preserving), so a leading
    ``/* comment */`` cannot hide the INSERT and a literal containing
    the word VALUES cannot confuse the routing; the body is sliced from
    the ORIGINAL text at the masked match's offset."""
    masked = _mask(sql)
    m = _INSERT_HEAD.match(masked)
    if m:
        # trim trailing ';'/whitespace/comments on the MASKED text
        # (comments are spaces there), so ``... ; -- done`` cannot leak
        # a semicolon or dead text into the body Spark re-parses
        start, end = m.start(1), len(masked)
        while True:
            while end > start and masked[end - 1].isspace():
                end -= 1
            if end > start and masked[end - 1] == ";":
                end -= 1
                continue
            break
        return m.group(1).lower(), sql[start:end]
    if _INSERT_ANY.match(masked):
        raise ValueError(
            "loki_sql INSERT supports 'INSERT INTO <t> VALUES ...' and "
            "'INSERT INTO <t> SELECT ...' only (the loki schema is fixed "
            "— omit the column list)"
        )
    return None
