"""SQL-fragment string utilities.

The reference delegates fragment parsing to sqlglot
(``sql/fragment.py:1-16``); sqlglot is not available here, so we
implement the small surface the compiler needs: find/replace
``model.field[__grain]`` references outside string literals, and split
top-level AND conjuncts (reference
``sql/generator.py:1640-1750`` filter classification needs both).
"""

from __future__ import annotations

import re
from collections.abc import Callable

_GRAINS = "second|minute|hour|day|week|month|quarter|year"
# the one canonical grain-word set — security scans and REF_RE both
# derive from it so a new grain cannot desynchronize them
GRAIN_WORDS = frozenset(_GRAINS.split("|"))
REF_RE = re.compile(
    rf"\b([A-Za-z_][A-Za-z0-9_]*)\.([A-Za-z_][A-Za-z0-9_]*?)(?:__({_GRAINS}))?\b"
)


def _split_quoted(sql: str) -> list[tuple[str, bool]]:
    """Split into (segment, is_opaque) parts. Opaque = text a
    classifier/rewriter must never read refs from: single-quoted string
    literals (with '' escapes), double-quoted and backtick-quoted
    identifiers (a quoted identifier literally named "model.metric" is
    a COLUMN, not a metric reference), ``--`` line comments, and
    ``/* */`` block comments (reference filter classification via
    sqlglot never sees those tokens either —
    tests/metrics/test_filters.py:359-410)."""
    parts: list[tuple[str, bool]] = []
    buf: list[str] = []
    i, n = 0, len(sql)

    def flush() -> None:
        if buf:
            parts.append(("".join(buf), False))
            buf.clear()

    while i < n:
        ch = sql[i]
        if ch == "'":
            flush()
            j = i + 1
            while j < n:
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            parts.append((sql[i:min(j + 1, n)], True))
            i = j + 1
            continue
        if ch in ('"', "`"):
            flush()
            j = sql.find(ch, i + 1)
            j = n - 1 if j == -1 else j
            parts.append((sql[i:j + 1], True))
            i = j + 1
            continue
        if ch == "-" and i + 1 < n and sql[i + 1] == "-":
            flush()
            j = sql.find("\n", i)
            j = n if j == -1 else j
            parts.append((sql[i:j], True))
            i = j
            continue
        if ch == "/" and i + 1 < n and sql[i + 1] == "*":
            flush()
            j = sql.find("*/", i + 2)
            j = n if j == -1 else j + 2
            parts.append((sql[i:j], True))
            i = j
            continue
        buf.append(ch)
        i += 1
    flush()
    return parts


_ALIAS_RE = re.compile(r"\bAS\s+[\"`]?([A-Za-z_][A-Za-z0-9_]*)[\"`]?", re.I)


def _scan_text(sql: str) -> str:
    """Same-length copy with literals/comments blanked and quote chars
    of quoted identifiers spaced (``AS "ORDERS"`` scans as an alias)."""
    scan: list[str] = []
    for seg, opaque in _split_quoted(sql):
        if not opaque or seg[:1] in ('"', "`"):
            scan.append(seg.replace('"', " ").replace("`", " "))
        else:
            scan.append(" " * len(seg))
    return "".join(scan)


def _shadow_spans(
    sql: str, known_models: set[str]
) -> list[tuple[int, int, set[str]]]:
    """(start, end, models) for each ``( SELECT ... )`` subquery that
    re-binds a known model name via an explicit ``AS alias``
    (``EXISTS (SELECT 1 FROM audit AS orders WHERE orders.revenue ...)``)
    — refs to the shadowed name INSIDE that span are subquery-scope
    columns, not semantic references (reference alias-scope
    classification, tests/metrics/test_filters.py:411-438). Shadowing is
    scoped to the span: the same fragment's refs OUTSIDE the subquery
    still classify/rewrite normally, so an embedded alias can never
    blind the whole predicate (fail-open hazard for visibility
    enforcement; round-10 review finding)."""
    scan = _scan_text(sql)
    known_lower = {m.lower(): m for m in known_models}
    bounds: list[tuple[int, int]] = []
    for m in re.finditer(r"\(\s*SELECT\b", scan, re.I):
        start = m.start()
        depth = 0
        end = None
        for j in range(start, len(scan)):
            if scan[j] == "(":
                depth += 1
            elif scan[j] == ")":
                depth -= 1
                if depth == 0:
                    end = j + 1
                    break
        bounds.append((start, end if end is not None else len(scan)))
    # attribute each alias to the INNERMOST span containing it: an alias
    # declared in a nested subquery must not shadow the enclosing
    # subquery's correlated refs (round-10 review #2). An alias OUTSIDE
    # every span is a top-level derived-table alias
    # (``(SELECT ...) AS orders``) whose scope is the whole fragment.
    shadow: dict[tuple[int, int], set[str]] = {}
    span_ends = {e for _s, e in bounds}
    for a in _ALIAS_RE.finditer(scan):
        hit = known_lower.get(a.group(1).lower())
        if hit is None:
            continue
        owner = None
        for s, e in bounds:
            if s <= a.start() < e and (
                owner is None or s > owner[0]  # innermost = latest start
            ):
                owner = (s, e)
        if owner is None:
            # whole-fragment shadowing applies ONLY to a derived-table
            # alias — `(SELECT ...) AS name` with the `AS` after a
            # span's closing paren (extra wrapping parens are peeled:
            # `((SELECT ...)) AS name` still shadows — review finding).
            # Any other bare `AS name` (a select-list or CAST-adjacent
            # alias that happens to equal a model name) names an output
            # column, which must not suppress classification of genuine
            # model refs in the fragment.
            prev = scan[:a.start()].rstrip()
            derived = False
            while prev.endswith(")"):
                if len(prev) in span_ends:
                    derived = True
                    break
                prev = prev[:-1].rstrip()
            if not derived:
                continue
            owner = (0, len(scan))
        shadow.setdefault(owner, set()).add(hit)
    return [(s, e, models) for (s, e), models in shadow.items()]


def _is_shadowed(
    spans: list[tuple[int, int, set[str]]], pos: int, model: str
) -> bool:
    return any(s <= pos < e and model in sh for s, e, sh in spans)


def find_refs(
    sql: str, known_models: set[str], shadowing: bool = True
) -> list[tuple[str, str, str | None]]:
    """All ``model.field[__grain]`` references outside string literals /
    quoted identifiers / comments, restricted to known model names.
    ``shadowing=True`` skips refs inside subquery spans that re-bind the
    model name as an alias (classification semantics); pass False for
    fail-closed scans (security) that must see every spelling."""
    spans = _shadow_spans(sql, known_models) if shadowing else []
    out: list[tuple[str, str, str | None]] = []
    offset = 0
    for seg, quoted in _split_quoted(sql):
        if quoted:
            offset += len(seg)
            continue
        for m in REF_RE.finditer(seg):
            if m.group(1) in known_models and not _is_shadowed(
                spans, offset + m.start(), m.group(1)
            ):
                out.append((m.group(1), m.group(2), m.group(3)))
        offset += len(seg)
    return out


def replace_refs(
    sql: str,
    known_models: set[str],
    fn: Callable[[str, str, str | None], str],
) -> str:
    """Rewrite every model.field[__grain] reference outside string
    literals / quoted identifiers / comments via
    ``fn(model, field, grain) -> replacement sql``; refs inside
    alias-shadowing subquery spans are left verbatim (see
    ``_shadow_spans``) while refs outside those spans still rewrite."""
    spans = _shadow_spans(sql, known_models)
    parts = []
    offset = 0
    for seg, quoted in _split_quoted(sql):
        if quoted:
            parts.append(seg)
            offset += len(seg)
            continue
        seg_off = offset

        def _sub(m: re.Match) -> str:
            if m.group(1) not in known_models or _is_shadowed(
                spans, seg_off + m.start(), m.group(1)
            ):
                return m.group(0)
            return fn(m.group(1), m.group(2), m.group(3))

        parts.append(REF_RE.sub(_sub, seg))
        offset += len(seg)
    return "".join(parts)


def split_conjuncts(sql: str) -> list[str]:
    """Split on top-level AND (outside parens and string literals),
    preserving OR groupings (reference AND-flattening with OR-paren
    preservation, ``sql/generator.py:1640-1750``).

    An UNPARENTHESIZED top-level OR makes the whole expression one
    unit: "a OR b AND c" means a OR (b AND c) in SQL, and splitting on
    the AND would re-associate it as (a OR b) AND c."""
    if _toplevel_or(sql):
        stripped = sql.strip()
        return [stripped] if stripped else []
    parts: list[str] = []
    depth = 0
    in_quote = False
    token = []
    i = 0
    upper = sql.upper()
    # a top-level BETWEEN's connector AND is part of the predicate, not
    # a conjunction boundary ("x BETWEEN a AND b AND y = 1" splits only
    # at the SECOND AND) — r11 planner-parity port exposed the naive
    # split emitting "(x BETWEEN a)" into a CTE WHERE
    between_pending = 0
    while i < len(sql):
        ch = sql[i]
        if ch == "'":
            if in_quote and i + 1 < len(sql) and sql[i + 1] == "'":
                # SQL '' escape: consume both so state stays in-quote
                token.append("''")
                i += 2
                continue
            in_quote = not in_quote
        if not in_quote:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif (
                depth == 0
                and upper.startswith("BETWEEN", i)
                and (i == 0 or not sql[i - 1].isalnum() and sql[i - 1] != "_")
                and (
                    i + 7 >= len(sql)
                    or not sql[i + 7].isalnum() and sql[i + 7] != "_"
                )
            ):
                between_pending += 1
            elif (
                depth == 0
                and upper.startswith("AND", i)
                and (i == 0 or not sql[i - 1].isalnum() and sql[i - 1] != "_")
                and (i + 3 >= len(sql) or not sql[i + 3].isalnum() and sql[i + 3] != "_")
            ):
                if between_pending:
                    between_pending -= 1
                else:
                    parts.append("".join(token).strip())
                    token = []
                    i += 3
                    continue
        token.append(ch)
        i += 1
    last = "".join(token).strip()
    if last:
        parts.append(last)
    return [p for p in parts if p]


def _toplevel_or(sql: str) -> bool:
    """True when an OR exists at paren/quote depth 0."""
    depth = 0
    in_quote = False
    upper = sql.upper()
    for i, ch in enumerate(sql):
        if ch == "'":
            # toggling on EVERY quote keeps state exact across the SQL
            # '' escape (close+reopen with nothing between)
            in_quote = not in_quote
        if in_quote:
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif (
            depth == 0
            and upper.startswith("OR", i)
            and (i == 0 or not (sql[i - 1].isalnum() or sql[i - 1] == "_"))
            and (
                i + 2 >= len(sql)
                or not (sql[i + 2].isalnum() or sql[i + 2] == "_")
            )
        ):
            return True
    return False


_INTERVAL_RE = re.compile(r"^\s*(\d+)\s+(second|minute|hour|day|week|month|quarter|year)s?\s*$", re.I)


def parse_interval(text: str) -> tuple[int, str]:
    """Parse '7 days' -> (7, 'day')."""
    m = _INTERVAL_RE.match(text)
    if not m:
        raise ValueError(f"cannot parse interval {text!r}")
    return int(m.group(1)), m.group(2).lower()


def interval_sql(text: str) -> str:
    """'7 days' -> Spark ``INTERVAL '7' DAY``.

    Spark has no QUARTER interval qualifier (INVALID_TYPED_LITERAL) —
    quarters emit as 3n MONTH."""
    n, unit = parse_interval(text)
    if unit == "quarter":
        return f"INTERVAL '{3 * n}' MONTH"
    return f"INTERVAL '{n}' {unit.upper()}"
