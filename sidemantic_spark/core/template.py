"""Jinja templating for SQL fields.

Mirrors the reference's ``core/template.py`` (SQLTemplateRenderer):
``{{ var }}`` substitution plus full Jinja blocks (``{% if %}`` /
``{% for %}``) rendered over the query's parameter context before
compilation. Falls back to a minimal ``{{ var }}``-only substituter when
jinja2 is unavailable.
"""

from __future__ import annotations

import re

try:  # jinja2 ships with many Python distributions but is not required
    from jinja2 import Environment, StrictUndefined, TemplateSyntaxError

    _ENV = Environment(autoescape=False)
    _STRICT_ENV = Environment(autoescape=False, undefined=StrictUndefined)
except Exception:  # pragma: no cover - exercised only without jinja2
    _ENV = None
    _STRICT_ENV = None
    TemplateSyntaxError = None  # type: ignore[assignment]

_MARKERS = ("{{", "{%", "{#")
_VAR_RE = re.compile(r"\{\{\s*(\w+)\s*\}\}")


def is_sql_template(sql: str) -> bool:
    """True when the string contains Jinja syntax."""
    return any(m in sql for m in _MARKERS)


def render_sql_template(sql: str, context: dict, strict: bool = False) -> str:
    """Render ``sql`` as a Jinja template if it contains template syntax.

    ``strict=True`` raises on undefined variables (used for security row
    filters, reference ``core/security.py:1-38`` which renders with
    StrictUndefined).
    """
    if not is_sql_template(sql):
        return sql
    if _ENV is not None:
        env = _STRICT_ENV if strict else _ENV
        try:
            return env.from_string(sql).render(**context)
        except TemplateSyntaxError as e:  # type: ignore[misc]
            raise ValueError(f"Template syntax error: {e}") from e
    # fallback: plain {{ var }} substitution only
    def repl(m: re.Match) -> str:
        name = m.group(1)
        if name in context:
            return str(context[name])
        if strict:
            raise ValueError(f"undefined template variable {name!r}")
        return m.group(0)

    return _VAR_RE.sub(repl, sql)
