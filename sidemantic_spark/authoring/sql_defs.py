"""Semantic-SQL DDL authoring: ``MODEL (...)``, ``DIMENSION (...)``,
``METRIC (...)``, ``SEGMENT (...)``, ``RELATIONSHIP (...)`` statements,
YAML frontmatter + statement files, and the compact
``model X from tbl ( ... )`` form.

Reference: custom sqlglot dialect ``core/dialect.py:59-67,1115`` and
assembly in ``core/sql_definitions.py:1``; fixtures
``native_sql_definitions``, ``sql_frontmatter_definitions``,
``compact_sql_model``, ``embedded_sql_blocks``.
"""

from __future__ import annotations

import re

from sidemantic_spark.core.model import Dimension, Metric, Model, Relationship, Segment

_STMT_RE = re.compile(
    r"(MODEL|DIMENSION|METRIC|SEGMENT|RELATIONSHIP)\s*\(", re.IGNORECASE
)
_COMPACT_RE = re.compile(
    r"^\s*model\s+(\w+)\s+from\s+(\S+)\s*\(", re.IGNORECASE | re.MULTILINE
)
_AGG_CALL_RE = re.compile(
    r"^(sum|count|count_distinct|approx_count_distinct|avg|min|max|median|"
    r"stddev|stddev_pop|variance|variance_pop)\s*\((.*)\)$",
    re.IGNORECASE | re.DOTALL,
)


def load_sql_definitions(layer, text: str, *, source: str = "<sql>") -> None:
    """Parse a semantic-SQL definition file and register its models."""
    from sidemantic_spark.authoring.yaml_io import AuthoringError, load_yaml

    # split frontmatter before comment-stripping: the `---` fences would
    # otherwise be eaten as `--` line comments
    front, rest = _split_frontmatter(text)
    text = _strip_comments(text if front is None else rest)
    model: Model | None = None
    if front is not None:
        before = set(layer.graph.models)
        load_yaml(layer, front, source=source)
        new = [n for n in layer.graph.models if n not in before]
        if len(new) == 1:
            model = layer.graph.models[new[0]]

    if _COMPACT_RE.search(text):
        for m in _parse_compact(text):
            layer.graph.add_model(m)
        return

    parse_statements(text, into_model=model, layer=layer)


def parse_statements(text: str, into_model: Model | None = None, layer=None) -> None:
    """Parse ``KEYWORD ( k v, ... );`` statements. ``MODEL`` opens a new
    model; field statements attach to the open model (or
    ``into_model`` for embedded blocks)."""
    from sidemantic_spark.authoring.yaml_io import AuthoringError

    current = into_model
    pos = 0
    while True:
        m = _STMT_RE.search(text, pos)
        if not m:
            break
        kind = m.group(1).upper()
        body, pos = _read_balanced(text, m.end() - 1)
        fields = _parse_fields(body)
        if kind == "MODEL":
            current = Model(
                name=fields.get("name", ""),
                table=fields.get("table"),
                sql=fields.get("sql"),
                source_uri=fields.get("source_uri"),
                primary_key=fields.get("primary_key", "id"),
                default_time_dimension=fields.get("default_time_dimension"),
                default_grain=fields.get("default_grain"),
                description=fields.get("description"),
            )
            if not current.name:
                raise AuthoringError("MODEL statement missing name")
            if layer is not None:
                layer.graph.add_model(current)
        elif current is None:
            raise AuthoringError(f"{kind} statement before any MODEL")
        elif kind == "DIMENSION":
            current.add_dimension(Dimension(
                name=fields.get("name", ""),
                type=fields.get("type", "categorical"),
                sql=fields.get("sql"),
                granularity=fields.get("granularity"),
                description=fields.get("description"),
            ))
        elif kind == "METRIC":
            current.add_metric(Metric(
                name=fields.get("name", ""),
                agg=fields.get("agg"),
                sql=fields.get("sql"),
                type=fields.get("type"),
                numerator=fields.get("numerator"),
                denominator=fields.get("denominator"),
                expr=fields.get("expr"),
                description=fields.get("description"),
                filters=[fields["filters"]] if "filters" in fields else [],
            ))
        elif kind == "SEGMENT":
            seg = Segment(
                name=fields.get("name", ""),
                sql=fields.get("sql", ""),
                description=fields.get("description"),
            )
            current.segments.append(seg)
            current._segments[seg.name] = seg
        elif kind == "RELATIONSHIP":
            current.relationships.append(Relationship(
                name=fields.get("name", ""),
                type=fields.get("type", "many_to_one"),
                foreign_key=fields.get("foreign_key"),
                primary_key=fields.get("primary_key"),
                sql=fields.get("sql"),
                through=fields.get("through"),
            ))


# ---------------------------------------------------------------------
# low-level parsing
# ---------------------------------------------------------------------

def _strip_comments(text: str) -> str:
    # quote-aware: a '--' inside a string literal is data, not a comment
    out = []
    i, n = 0, len(text)
    in_quote = False
    while i < n:
        ch = text[i]
        if ch == "'":
            in_quote = not in_quote
            out.append(ch)
            i += 1
        elif not in_quote and ch == "-" and text[i:i + 2] == "--":
            while i < n and text[i] != "\n":
                i += 1
        else:
            out.append(ch)
            i += 1
    return "".join(out)


def _split_frontmatter(text: str) -> tuple[str | None, str]:
    m = re.match(r"\s*---\s*\n(.*?)\n---\s*\n?(.*)$", text, re.DOTALL)
    if m:
        return m.group(1), m.group(2)
    return None, text


def _read_balanced(text: str, open_paren: int) -> tuple[str, int]:
    """Return the contents of the paren group opening at
    ``text[open_paren]`` and the index just past its close."""
    depth = 0
    in_quote = False
    for i in range(open_paren, len(text)):
        ch = text[i]
        if ch == "'":
            in_quote = not in_quote
        elif not in_quote:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    return text[open_paren + 1:i], i + 1
    raise ValueError("unbalanced parens in semantic-SQL definition")


def _parse_fields(body: str) -> dict[str, str]:
    """``name total_revenue, agg sum, sql amount`` -> dict. Values run to
    the next top-level comma and may contain quotes/parens/placeholders."""
    fields: dict[str, str] = {}
    for item in _split_top_commas(body):
        item = item.strip()
        if not item:
            continue
        m = re.match(r"^([A-Za-z_][A-Za-z0-9_]*)\s+(.+)$", item, re.DOTALL)
        if not m:
            fields[item] = "true"
            continue
        key, val = m.group(1).lower(), m.group(2).strip()
        if (val.startswith("'") and val.endswith("'")) or (
            val.startswith('"') and val.endswith('"')
        ):
            inner = val[1:-1]
            # quoted identifiers/values keep inner quotes for SQL text
            if key in ("name", "table", "agg", "type", "granularity"):
                val = inner
        fields[key] = val
    return fields


def _split_top_commas(text: str) -> list[str]:
    parts, depth, in_quote, buf = [], 0, False, []
    for ch in text:
        if ch == "'":
            in_quote = not in_quote
        elif not in_quote:
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                parts.append("".join(buf))
                buf = []
                continue
        buf.append(ch)
    parts.append("".join(buf))
    return parts


# ---------------------------------------------------------------------
# compact form (ref compact_sql_model fixture)
# ---------------------------------------------------------------------

def _parse_compact(text: str) -> list[Model]:
    models: list[Model] = []
    pos = 0
    while True:
        m = _COMPACT_RE.search(text, pos)
        if not m:
            break
        name, table = m.group(1), m.group(2)
        body, pos = _read_balanced(text, m.end() - 1)
        model = Model(name=name, table=table)
        for line in _split_compact_items(body):
            line = line.strip()
            if not line:
                continue
            pk = re.match(r"^primary\s+key\s*\(([^)]*)\)$", line, re.IGNORECASE)
            if pk:
                cols = [c.strip() for c in pk.group(1).split(",") if c.strip()]
                model.primary_key = cols[0] if len(cols) == 1 else cols
                continue
            # "expr as name : type grain g" | "agg(expr) as name" | bare name
            ann = None
            if ":" in line:
                line, ann = line.rsplit(":", 1)
                line, ann = line.strip(), ann.strip()
            asm = re.match(r"^(.*?)\s+as\s+(\w+)$", line, re.IGNORECASE | re.DOTALL)
            expr, out = (asm.group(1).strip(), asm.group(2)) if asm else (line, line)
            agg_call = _AGG_CALL_RE.match(expr)
            if agg_call:
                inner = agg_call.group(2).strip()
                model.add_metric(Metric(
                    name=out,
                    agg=agg_call.group(1).lower(),
                    sql=None if inner in ("", "*") else inner,
                ))
                continue
            dtype, gran = "categorical", None
            if ann:
                toks = ann.split()
                if toks:
                    dtype = toks[0]
                if "grain" in toks:
                    gran = toks[toks.index("grain") + 1]
            model.add_dimension(Dimension(
                name=out,
                type=dtype,
                sql=None if expr == out else expr,
                granularity=gran,
            ))
        models.append(model)
    return models


def _split_compact_items(body: str) -> list[str]:
    """Compact bodies separate items by newline; parens keep lines
    together (an agg call may span lines)."""
    items, depth, buf = [], 0, []
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "\n" and depth == 0:
            items.append("".join(buf))
            buf = []
            continue
        buf.append(ch)
    items.append("".join(buf))
    return items
