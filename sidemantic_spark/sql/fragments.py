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
    """Split into (segment, is_quoted) parts; quoted = single-quoted
    SQL string literals (with '' escapes)."""
    parts: list[tuple[str, bool]] = []
    buf = []
    in_quote = False
    i = 0
    while i < len(sql):
        ch = sql[i]
        if ch == "'":
            if in_quote and i + 1 < len(sql) and sql[i + 1] == "'":
                buf.append("''")
                i += 2
                continue
            buf.append(ch)
            parts.append(("".join(buf), in_quote))
            buf = []
            in_quote = not in_quote
            i += 1
            continue
        buf.append(ch)
        i += 1
    if buf:
        parts.append(("".join(buf), in_quote))
    # merge the quote chars into quoted segments for faithful rejoin
    return parts


def find_refs(sql: str, known_models: set[str]) -> list[tuple[str, str, str | None]]:
    """All ``model.field[__grain]`` references outside string literals,
    restricted to known model names."""
    out: list[tuple[str, str, str | None]] = []
    for seg, quoted in _split_quoted(sql):
        if quoted:
            continue
        for m in REF_RE.finditer(seg):
            if m.group(1) in known_models:
                out.append((m.group(1), m.group(2), m.group(3)))
    return out


def replace_refs(
    sql: str,
    known_models: set[str],
    fn: Callable[[str, str, str | None], str],
) -> str:
    """Rewrite every model.field[__grain] reference outside string
    literals via ``fn(model, field, grain) -> replacement sql``."""

    def _sub(m: re.Match) -> str:
        if m.group(1) not in known_models:
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
