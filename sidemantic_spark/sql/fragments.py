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


def _shadowed_models(sql: str, known_models: set[str]) -> set[str]:
    """Model names re-bound as table aliases INSIDE the fragment
    (``EXISTS (SELECT 1 FROM audit AS orders WHERE orders.revenue ...)``)
    — refs to a shadowed name are subquery-scope columns, not semantic
    references (reference alias-scope classification,
    tests/metrics/test_filters.py:411-438). Only explicit ``AS alias``
    forms shadow; the heuristic is conservative by construction."""
    known_lower = {m.lower(): m for m in known_models}
    # blank literals/comments but keep quoted-identifier TEXT visible
    # (AS "ORDERS" must still shadow) — quote chars become spaces so
    # the alias regex sees `AS  ORDERS `
    scan: list[str] = []
    for seg, opaque in _split_quoted(sql):
        if not opaque or seg[:1] in ('"', "`"):
            scan.append(seg.replace('"', " ").replace("`", " "))
        else:
            scan.append(" " * len(seg))
    out: set[str] = set()
    for m in _ALIAS_RE.finditer("".join(scan)):
        hit = known_lower.get(m.group(1).lower())
        if hit:
            out.add(hit)
    return out


def find_refs(sql: str, known_models: set[str]) -> list[tuple[str, str, str | None]]:
    """All ``model.field[__grain]`` references outside string literals /
    quoted identifiers / comments, restricted to known model names that
    the fragment does not re-bind as a table alias."""
    effective = known_models - _shadowed_models(sql, known_models)
    out: list[tuple[str, str, str | None]] = []
    for seg, quoted in _split_quoted(sql):
        if quoted:
            continue
        for m in REF_RE.finditer(seg):
            if m.group(1) in effective:
                out.append((m.group(1), m.group(2), m.group(3)))
    return out


def replace_refs(
    sql: str,
    known_models: set[str],
    fn: Callable[[str, str, str | None], str],
) -> str:
    """Rewrite every model.field[__grain] reference outside string
    literals / quoted identifiers / comments via
    ``fn(model, field, grain) -> replacement sql``; alias-shadowed
    model names are left verbatim (see ``_shadowed_models``)."""
    effective = known_models - _shadowed_models(sql, known_models)

    def _sub(m: re.Match) -> str:
        if m.group(1) not in effective:
            return m.group(0)
        return fn(m.group(1), m.group(2), m.group(3))

    parts = []
    for seg, quoted in _split_quoted(sql):
        parts.append(seg if quoted else REF_RE.sub(_sub, seg))
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
                and upper.startswith("AND", i)
                and (i == 0 or not sql[i - 1].isalnum() and sql[i - 1] != "_")
                and (i + 3 >= len(sql) or not sql[i + 3].isalnum() and sql[i + 3] != "_")
            ):
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
